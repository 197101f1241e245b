"""Serving subsystem: micro-batcher semantics (fast) + engine/HTTP e2e
(slow — compiles the tiny model)."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest


# ------------------------------------------------------------ batcher ----

def test_batcher_batches_and_routes_results():
    from dist_tpu.serving.batcher import MicroBatcher

    seen_batches = []

    def predict(clips):
        seen_batches.append(clips.shape[0])
        # score row i encodes the clip's own content so routing is provable
        return clips.reshape(clips.shape[0], -1)[:, :4].astype(np.float32)

    b = MicroBatcher(predict, max_batch=4, max_delay_ms=50.0)
    try:
        clips = [np.full((2, 2), i, np.uint8) for i in range(8)]
        futs = [b.submit(c) for c in clips]
        results = [f.result(timeout=10.0) for f in futs]
        for i, r in enumerate(results):
            assert (r == i).all(), (i, r)
        stats = b.snapshot()
        assert stats["requests"] == 8
        # 8 near-simultaneous submits through a 4-batch: at most 8 device
        # calls, and at least one multi-clip batch proves coalescing
        assert stats["batches"] <= 8
        assert max(seen_batches) > 1
        assert stats["mean_batch"] == pytest.approx(
            8 / stats["batches"])
    finally:
        b.close()


def test_batcher_propagates_errors_and_recovers():
    from dist_tpu.serving.batcher import MicroBatcher

    def predict(clips):
        if (clips == 13).any():
            raise ValueError("unlucky clip")
        return np.zeros((clips.shape[0], 2), np.float32)

    b = MicroBatcher(predict, max_batch=1, max_delay_ms=1.0)
    try:
        bad = b.submit(np.full((2,), 13, np.uint8))
        with pytest.raises(ValueError, match="unlucky"):
            bad.result(timeout=10.0)
        good = b.submit(np.zeros((2,), np.uint8))
        assert good.result(timeout=10.0).shape == (2,)
        assert b.snapshot()["errors"] == 1
    finally:
        b.close()


def test_batcher_backpressure_and_close_semantics():
    """Bounded queue: overload raises queue.Full (server maps to 503);
    close() fails queued futures fast and rejects later submits; a
    caller-side cancel racing set_result never kills the dispatch thread."""
    import queue as queue_mod

    from dist_tpu.serving.batcher import MicroBatcher

    release = threading.Event()

    def slow_predict(clips):
        release.wait(timeout=10.0)
        return np.zeros((clips.shape[0], 2), np.float32)

    b = MicroBatcher(slow_predict, max_batch=1, max_delay_ms=1.0,
                     max_queue=2)
    try:
        first = b.submit(np.zeros((2,), np.uint8))  # occupies the device
        time.sleep(0.1)  # let the dispatch thread take it
        queued = [b.submit(np.zeros((2,), np.uint8)) for _ in range(2)]
        with pytest.raises(queue_mod.Full):
            for _ in range(8):  # the bound must bite within max_queue
                b.submit(np.zeros((2,), np.uint8))
        assert b.snapshot()["rejected"] >= 1
        # cancel racing the in-flight resolution must not kill the thread
        queued[0].cancel()
    finally:
        release.set()
        first.result(timeout=10.0)
        b.close()
    for f in queued:
        if f.cancelled():
            continue
        try:
            # either completed before close() or failed fast by its drain —
            # the guarantee under test is NO HANG (the 1 s timeout)
            f.result(timeout=1.0)
        except Exception:
            pass
    with pytest.raises(RuntimeError):
        b.submit(np.zeros((2,), np.uint8))


def test_batcher_survives_mismatched_clip_shapes():
    """np.stack of a mixed-shape batch fails OUTSIDE predict_fn; that must
    fail those futures, not kill the dispatch thread (a dead thread would
    hang every later submit)."""
    from dist_tpu.serving.batcher import MicroBatcher

    def predict(clips):
        return np.zeros((clips.shape[0], 2), np.float32)

    b = MicroBatcher(predict, max_batch=2, max_delay_ms=200.0)
    try:
        f1 = b.submit(np.zeros((2, 2), np.uint8))
        f2 = b.submit(np.zeros((3, 3), np.uint8))  # same gather window
        errs = 0
        for f in (f1, f2):
            try:
                f.result(timeout=10.0)
            except ValueError:
                errs += 1
        assert errs == 2
        # the thread survived: a well-shaped request still completes
        ok = b.submit(np.zeros((2, 2), np.uint8))
        assert ok.result(timeout=10.0).shape == (2,)
    finally:
        b.close()


def test_batcher_respects_max_batch():
    from dist_tpu.serving.batcher import MicroBatcher

    sizes = []

    def predict(clips):
        sizes.append(clips.shape[0])
        time.sleep(0.02)  # let the queue back up
        return np.zeros((clips.shape[0], 1), np.float32)

    b = MicroBatcher(predict, max_batch=3, max_delay_ms=100.0)
    try:
        futs = [b.submit(np.zeros((1,), np.uint8)) for _ in range(9)]
        for f in futs:
            f.result(timeout=10.0)
        assert max(sizes) <= 3
    finally:
        b.close()


# ------------------------------------------------------- engine + http ----

@pytest.fixture(scope="module")
def tiny_server(repo_root):
    import os

    from dist_tpu.config import load_config
    from dist_tpu.serving.server import VideoClassifierServer

    cfg = load_config(
        os.path.join(repo_root, "configs/projects/dist/test/tiny_synth.yaml"),
        make_output_dir=False)
    server = VideoClassifierServer(cfg, host="127.0.0.1", port=0,
                                   batch_size=8, max_delay_ms=20.0)
    with server:
        yield server


def _post_clip(port, clip, topk=3):
    buf = io.BytesIO()
    np.save(buf, clip)
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/predict?topk={topk}",
        data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read().decode())


@pytest.mark.slow
def test_server_predicts_and_batches(tiny_server):
    port = tiny_server.port
    # health after warmup
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/health", timeout=30) as r:
        health = json.loads(r.read().decode())
    assert health["status"] == "ok" and health["classes"] == 12

    clip_shape = (tiny_server.engine.num_frames, tiny_server.engine.crop,
                  tiny_server.engine.crop, 3)
    rng = np.random.default_rng(0)

    # concurrent requests coalesce into device batches
    results = [None] * 6

    def worker(i):
        clip = rng.integers(0, 255, clip_shape, dtype=np.uint8)
        results[i] = _post_clip(port, clip)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for status, payload in results:
        assert status == 200
        assert len(payload["topk"]) == 3
        scores = [row["score"] for row in payload["topk"]]
        assert scores == sorted(scores, reverse=True)
        assert all(0 <= row["class"] < 12 for row in payload["topk"])

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/stats", timeout=30) as r:
        stats = json.loads(r.read().decode())
    # warmup's batch isn't counted (it bypasses the batcher)
    assert stats["requests"] == 6
    assert stats["batches"] < 6, stats  # at least some coalescing happened


@pytest.mark.slow
def test_server_rejects_bad_payloads(tiny_server):
    port = tiny_server.port
    # wrong shape
    status, payload = None, None
    try:
        _post_clip(port, np.zeros((2, 2), np.uint8))
    except urllib.error.HTTPError as e:
        status, payload = e.code, json.loads(e.read().decode())
    assert status == 400 and "clip must be" in payload["error"]
    # garbage bytes
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/predict", data=b"not-npy",
        method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        status = 200
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


@pytest.mark.slow
def test_engine_buckets_agree(tiny_server):
    """A batch-1 request runs at the 1-bucket (not padded to max batch);
    its scores must match the same clip inside a full batch."""
    engine = tiny_server.engine
    assert engine._buckets() == [1, 2, 4, 8]
    rng = np.random.default_rng(7)
    clips = rng.integers(0, 255, (8, engine.num_frames, engine.crop,
                                  engine.crop, 3), dtype=np.uint8)
    full = engine.predict(clips)
    one = engine.predict(clips[:1])
    np.testing.assert_allclose(one[0], full[0], rtol=0, atol=5e-3)
    assert np.argmax(one[0]) == np.argmax(full[0])


@pytest.mark.slow
def test_engine_pad_and_results_match_direct_apply(tiny_server):
    """A 3-clip predict (padded to batch 8) equals applying the model
    directly — padding must not leak into real rows."""
    import jax

    engine = tiny_server.engine
    rng = np.random.default_rng(1)
    clips = rng.integers(0, 255, (3, engine.num_frames, engine.crop,
                                  engine.crop, 3), dtype=np.uint8)
    got = engine.predict(clips)
    assert got.shape == (3, engine.num_classes)

    from dist_tpu.tasks.state import make_eval_step
    step = jax.jit(make_eval_step(engine.model, engine.cfg))
    full = np.concatenate(
        [clips, np.zeros((5,) + clips.shape[1:], np.uint8)])
    batch = {"video": full, "labels": np.zeros((8,), np.int64)}
    if engine.text_features is not None:
        batch["text_features"] = engine.text_features
    want = np.asarray(step(engine.state, batch)["preds"])[:3]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
