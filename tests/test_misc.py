"""utils/misc: NaN-loss abort, eval cadence, FLOP counting."""

import numpy as np
import pytest

import jax.numpy as jnp

from dist_tpu.config import load_config
from dist_tpu.utils import misc

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml")


def test_nan_loss_aborts():
    """Reference utils/misc.py:25-32: a NaN loss is a hard RuntimeError
    (silent NaN runs burn accelerator time)."""
    misc.check_nan_losses(0.5)  # fine
    with pytest.raises(RuntimeError):
        misc.check_nan_losses(float("nan"))


def test_is_eval_epoch_cadence():
    """EVAL_PERIOD + NUM_FOLDS cadence incl. the final epoch
    (reference utils/misc.py:168-180)."""
    cfg = load_config(CFG, make_output_dir=False,
                      opts=["TRAIN.EVAL_PERIOD", "4", "TRAIN.NUM_FOLDS", "2",
                            "OPTIMIZER.MAX_EPOCH", "10"])
    evals = [e for e in range(0, 10, 2) if misc.is_eval_epoch(cfg, e)]
    # the LAST fold-epoch always evaluates
    assert 8 in evals
    # cadence hits roughly every EVAL_PERIOD epochs
    assert len(evals) >= 2


def test_flops_count_matches_matmul():
    """cost_analysis FLOPs for a known matmul (the fvcore replacement,
    reference utils/misc.py:103-165)."""
    def f(a, b):
        return a @ b

    a = jnp.zeros((64, 128), jnp.float32)
    b = jnp.zeros((128, 32), jnp.float32)
    flops = misc.flops_count(f, a, b)
    if flops is None or np.isnan(flops):
        pytest.skip("cost analysis unavailable on this backend")
    expect = 2 * 64 * 128 * 32
    assert abs(flops - expect) / expect < 0.5, (flops, expect)
