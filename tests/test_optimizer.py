"""Optimizer param-group semantics + LR policy math vs hand-computed
values (reference models/utils/optimizer.py + lr_policy.py)."""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dist_tpu.config import load_config
from dist_tpu.optim.lr_policy import get_lr_at_epoch, lr_schedule_by_step
from dist_tpu.optim.optimizer import (
    FROZEN,
    NO_WD,
    TRAINABLE,
    construct_optimizer,
    param_labels,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIST_CFG = os.path.join(REPO, "configs/projects/dist/ssv2/vit-b16-8+16f.yaml")


def test_cosine_lr_with_warmup():
    cfg = load_config(DIST_CFG, make_output_dir=False)
    base = cfg.OPTIMIZER.BASE_LR  # 3.2e-5, warmup 6, max 36
    # during warmup: linear from WARMUP_START_LR to cosine(6)
    lr_end = base * (math.cos(math.pi * 6 / 36) + 1) / 2
    lr_start = cfg.OPTIMIZER.WARMUP_START_LR
    lr3 = float(get_lr_at_epoch(cfg, 3.0))
    assert lr3 == pytest.approx(lr_start + (lr_end - lr_start) / 6 * 3, rel=1e-5)
    # after warmup: pure cosine
    lr20 = float(get_lr_at_epoch(cfg, 20.0))
    assert lr20 == pytest.approx(base * (math.cos(math.pi * 20 / 36) + 1) / 2,
                                 rel=1e-5)
    # fractional-epoch schedule-by-step (runs/train.py:97-98)
    sched = lr_schedule_by_step(cfg, steps_per_epoch=10, start_epoch=0)
    # NUM_FOLDS=4: step 5 -> epoch 4*5/10 = 2.0
    assert float(sched(5)) == pytest.approx(float(get_lr_at_epoch(cfg, 2.0)),
                                            rel=1e-6)


def test_dist_param_groups():
    """Only dist_net (+head) trains; cls tokens / pos embeds / biases get
    no weight decay (the fixed construct_DiST_optimizer semantics,
    optimizer.py:138-186)."""
    cfg = load_config(DIST_CFG, make_output_dir=False)
    params = {
        "visual": {"conv1": {"kernel": jnp.ones((3, 3, 3, 8))}},
        "text": {"token_embedding": jnp.ones((10, 8))},
        "logit_scale": jnp.ones(()),
        "dist_net": {
            "temporal_stem": {"kernel": jnp.ones((5, 4, 4, 3, 8)),
                              "bias": jnp.ones((8,))},
            "ladder": {"temporal2integration": {"cls_token": jnp.ones((12, 1, 8, 64))}},
            "adapooling_0": {"positional_embedding": jnp.ones((1, 8, 64))},
        },
    }
    labels = param_labels(cfg, params)
    assert labels["visual"]["conv1"]["kernel"] == FROZEN
    assert labels["text"]["token_embedding"] == FROZEN
    assert labels["logit_scale"] == FROZEN
    assert labels["dist_net"]["temporal_stem"]["kernel"] == TRAINABLE
    assert labels["dist_net"]["temporal_stem"]["bias"] == NO_WD
    assert labels["dist_net"]["ladder"]["temporal2integration"]["cls_token"] == NO_WD
    assert labels["dist_net"]["adapooling_0"]["positional_embedding"] == NO_WD


def test_frozen_params_never_move_and_lrmult_applies():
    cfg = load_config(DIST_CFG, make_output_dir=False)
    params = {
        "visual": {"w": jnp.ones((4, 4))},
        "dist_net": {"w": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
    }
    tx, lr_fn = construct_optimizer(cfg, params, steps_per_epoch=10)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["visual"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["dist_net"]["w"]).max()) > 0.0
    # NEW_NET_LRMULT=10: first adam step magnitude = lr * mult (unit grad)
    lr0 = float(lr_fn(0))
    expect = lr0 * cfg.OPTIMIZER.NEW_NET_LRMULT
    got = float(jnp.abs(updates["dist_net"]["bias"]).max())
    assert got == pytest.approx(expect, rel=0.05)
