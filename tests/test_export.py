"""StableHLO model export (dist_tpu/serving/export.py).

The exported artifact must be self-contained: deserializing the bytes and
calling them (no model code, config, or checkpoint) must reproduce the
in-process serving engine's scores exactly.
"""

import os

import numpy as np
import pytest

from dist_tpu.config import load_config

# several full engine builds + export lowering: keep out of the fast lane
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml")


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    out = tmp_path_factory.mktemp("export")
    return load_config(CFG, opts=["OUTPUT_DIR", str(out)])


def test_export_roundtrip_matches_engine(cfg, tmp_path):
    from dist_tpu.serving.engine import InferenceEngine
    from dist_tpu.serving.export import (
        export_predictor,
        load_predictor,
        save_exported,
    )

    blob, meta = export_predictor(cfg, batch_size=2, platforms=("cpu",))
    assert meta["num_classes"] == int(cfg.VIDEO.HEAD.NUM_CLASSES)
    path = str(tmp_path / "model.jaxexp")
    save_exported(path, blob, meta)
    assert os.path.exists(path) and os.path.exists(path + ".json")

    predict, meta2 = load_predictor(path)
    assert meta2["batch_size"] == 2
    rng = np.random.default_rng(0)
    clip = rng.integers(0, 255, (1, meta["num_frames"], meta["crop"],
                                 meta["crop"], 3), dtype=np.uint8)
    got = predict(clip)  # n=1 < B=2: loader pads, slices back
    assert got.shape == (1, meta["num_classes"])

    engine = InferenceEngine(cfg, batch_size=2)
    want = engine.predict(clip)
    # the config runs bf16 (TRAIN.MIXED_PRECISION); the exported module is
    # lowered for a single device while the engine runs the 8-device test
    # mesh, so reduction/fusion order differs — bf16-level agreement is
    # the contract (exact on matched platform+sharding)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)
    assert np.array_equal(np.argsort(got[0])[::-1][:3],
                          np.argsort(want[0])[::-1][:3])


def test_exported_bytes_run_without_framework(cfg, tmp_path):
    """Simulate the deployment side: only jax + the file."""
    import jax

    from dist_tpu.serving.export import export_predictor

    blob, meta = export_predictor(cfg, batch_size=2, platforms=("cpu",))
    exported = jax.export.deserialize(bytearray(bytes(blob)))
    assert [str(a.dtype) for a in exported.in_avals] == ["uint8"]
    clips = np.zeros(exported.in_avals[0].shape, np.uint8)
    scores = np.asarray(jax.jit(exported.call)(clips))
    assert scores.shape == (2, meta["num_classes"])
    assert np.all(np.isfinite(scores))
    # head eval activation (softmax) baked in, like the test task
    np.testing.assert_allclose(scores.sum(axis=-1), 1.0, rtol=1e-4)
