"""Object-store IO wrapper (utils/bucket.py) over local paths — gfile
handles local filesystems with the same API as gs://."""

import os

from dist_tpu.utils import bucket


def test_read_put_download_roundtrip(tmp_path):
    src = tmp_path / "src.bin"
    src.write_bytes(b"hello-bucket")

    buf = bucket.read_from_bucket(str(src))
    assert buf.read() == b"hello-bucket"

    dst = tmp_path / "remote" / "dst.bin"
    os.makedirs(dst.parent, exist_ok=True)
    bucket.put_to_bucket(str(src), str(dst))
    assert dst.read_bytes() == b"hello-bucket"

    local = bucket.download_model(str(dst), local_dir=str(tmp_path / "cache"))
    assert open(local, "rb").read() == b"hello-bucket"
    # second call reuses the cached copy
    assert bucket.download_model(str(dst),
                                 local_dir=str(tmp_path / "cache")) == local


def test_read_retries_then_raises(tmp_path, monkeypatch):
    calls = {"n": 0}

    class _FailingGFile:
        def GFile(self, path, mode):
            calls["n"] += 1
            raise IOError("transient")

    monkeypatch.setattr(bucket, "_gfile", lambda: _FailingGFile())
    monkeypatch.setattr(bucket.time, "sleep", lambda s: None)
    try:
        bucket.read_from_bucket("/nope", retries=3)
        assert False, "expected IOError"
    except IOError:
        pass
    assert calls["n"] == 3
