"""Native C++ decoder parity vs OpenCV (skipped when the toolchain can't
build the library)."""

import os

import numpy as np
import pytest

from dist_tpu.data import native_decoder as nd
from dist_tpu.data.base_dataset import read_video_cv2


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    import cv2
    path = str(tmp_path_factory.mktemp("nv") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (48, 64, 3), np.uint8)
    for i in range(60):
        w.write(np.roll(base, i, axis=1))
    w.release()
    return path


needs_native = pytest.mark.skipif(not nd.ensure_built(),
                                  reason="native toolchain unavailable")


@needs_native
def test_probe(video_file):
    n, fps, w, h = nd.probe(video_file)
    assert n == 60 and abs(fps - 30.0) < 1e-3 and (w, h) == (64, 48)


@needs_native
def test_decode_matches_opencv(video_file):
    idx = [0, 7, 31, 59]
    native = nd.decode(video_file, idx)
    ref = read_video_cv2(video_file, idx)
    np.testing.assert_array_equal(native, ref)


@needs_native
def test_decode_with_seek(video_file):
    """Indices far into the stream exercise the seek path."""
    native = nd.decode(video_file, [10, 58, 59])
    ref = read_video_cv2(video_file, [10, 58, 59])
    np.testing.assert_array_equal(native, ref)


@needs_native
def test_decode_out_of_range_index_pads_with_last_frame(video_file):
    """An index past EOF is padded with the last decoded frame (decord
    semantics the sampler relies on for ragged tail clips)."""
    native = nd.decode(video_file, [58, 70])
    ref = read_video_cv2(video_file, [58, 59])
    np.testing.assert_array_equal(native[0], ref[0])
    np.testing.assert_array_equal(native[1], ref[1])


@needs_native
def test_batch_decode(video_file):
    outs = nd.decode_batch([video_file, video_file],
                           [np.array([0, 1]), np.array([30, 59])], 48, 64,
                           num_threads=2)
    ref0 = read_video_cv2(video_file, [0, 1])
    ref1 = read_video_cv2(video_file, [30, 59])
    np.testing.assert_array_equal(outs[0], ref0)
    np.testing.assert_array_equal(outs[1], ref1)


@needs_native
def test_fused_resize(video_file):
    out = nd.decode(video_file, [0, 30], out_h=24, out_w=32)
    assert out.shape == (2, 24, 32, 3)


@needs_native
def test_decode_empty_indices(video_file):
    out = nd.decode(video_file, [])
    assert out.shape[0] == 0


@needs_native
def test_decode_only_final_frames(video_file):
    """Trailing wanted indices need the codec drain (EOF flush): without
    avcodec_send_packet(NULL) the frames buffered by the codec delay are
    lost and these slots get padded with stale frames."""
    native = nd.decode(video_file, [58, 59])
    ref = read_video_cv2(video_file, [58, 59])
    np.testing.assert_array_equal(native, ref)
    assert not np.array_equal(native[0], native[1])
