"""Checkpoint provenance sidecar + weight averaging tool."""

import os
import subprocess
import sys

import numpy as np

from dist_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml")


def _state(step, w):
    import jax.numpy as jnp

    from dist_tpu.tasks.state import TrainState
    return TrainState(step=jnp.asarray(step, jnp.int32),
                      variables={"params": {"w": jnp.asarray(w, jnp.float32),
                                            "n": jnp.asarray(3, jnp.int32)}},
                      opt_state={"m": jnp.zeros(2)}, ema_variables=None)


def test_config_sidecar_written_with_save(tmp_path):
    """Every save records the resolved config next to the checkpoint
    (reference stores cfg inside the .pyth payload, checkpoint.py:102)."""
    from dist_tpu.utils import checkpoint as cu

    cfg = load_config(CFG, opts=["OUTPUT_DIR", str(tmp_path)])
    path = cu.save_checkpoint(cfg, _state(1, [1.0, 2.0]), cur_epoch=0)
    sidecar = path + ".config.yaml"
    assert os.path.exists(sidecar)
    text = open(sidecar).read()
    assert "OUTPUT_DIR" in text and str(tmp_path) in text


def test_average_checkpoints_tool(tmp_path):
    from dist_tpu.utils import checkpoint as cu

    cfg = load_config(CFG, opts=["OUTPUT_DIR", str(tmp_path)])
    p1 = cu.save_checkpoint(cfg, _state(1, [1.0, 3.0]), cur_epoch=0)
    p2 = cu.save_checkpoint(cfg, _state(2, [3.0, 5.0]), cur_epoch=1)
    out = str(tmp_path / "avg")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/average_checkpoints.py"),
         "--ckpts", p1, p2, "--out", out],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO), cwd=REPO)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    restored = cu.load_checkpoint(out)
    np.testing.assert_allclose(
        np.asarray(restored["variables"]["params"]["w"]), [2.0, 4.0])
    # integer leaves (BN counters) take the first checkpoint's value
    assert int(restored["variables"]["params"]["n"]) == 3
    # the output loads through the test-checkpoint path
    cfg2 = load_config(CFG, opts=["OUTPUT_DIR", str(tmp_path / "fresh"),
                                  "TEST.CHECKPOINT_FILE_PATH", out])
    loaded = cu.load_test_checkpoint(cfg2, _state(0, [0.0, 0.0]))
    np.testing.assert_allclose(
        np.asarray(loaded.variables["params"]["w"]), [2.0, 4.0])
