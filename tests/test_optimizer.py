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


HICO_FT_CFG = os.path.join(REPO, "configs/projects/hico/ft_s3dg_ucf.yaml")


def _standard_params():
    return {
        "backbone": {
            "conv_a": {"kernel": jnp.ones((1, 3, 3, 4, 4)),
                       "bias": jnp.ones((4,))},
            "bn": {"scale": jnp.ones((4,)), "bias": jnp.ones((4,))},
            "pos_embd": jnp.ones((1, 8, 4)),
        },
        "head": {"linear": {"kernel": jnp.ones((4, 12)),
                            "bias": jnp.ones((12,))}},
    }


def test_standard_param_groups_lr_reduce_and_bn():
    """construct_standard_optimizer semantics (optimizer.py:95-135):
    embd/cls_token -> no WD; bn/norm -> BN group; head keeps full LR;
    body reduced 10x under TRAIN.LR_REDUCE + FINE_TUNE (set_lr,
    optimizer.py:200-214)."""
    from dist_tpu.optim.optimizer import BN, BODY

    cfg = load_config(HICO_FT_CFG, make_output_dir=False,
                      opts=["TRAIN.LR_REDUCE", "true",
                            "TRAIN.FINE_TUNE", "true"])
    params = _standard_params()
    labels = param_labels(cfg, params)
    assert labels["backbone"]["pos_embd"] == NO_WD
    assert labels["backbone"]["bn"]["scale"] == BN
    assert labels["backbone"]["conv_a"]["kernel"] == BODY
    assert labels["backbone"]["conv_a"]["bias"] == BODY  # full WD in ref
    assert labels["head"]["linear"]["kernel"] == TRAINABLE

    # body update magnitude = head/10 under SGD with unit gradients
    cfg2 = load_config(HICO_FT_CFG, make_output_dir=False,
                       opts=["TRAIN.LR_REDUCE", "true",
                             "TRAIN.FINE_TUNE", "true",
                             "OPTIMIZER.OPTIM_METHOD", "sgd",
                             "OPTIMIZER.MOMENTUM", "0.",
                             "OPTIMIZER.WEIGHT_DECAY", "0.",
                             "OPTIMIZER.WARMUP_EPOCHS", "0"])
    tx, lr_fn = construct_optimizer(cfg2, params, steps_per_epoch=10)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    head_u = float(jnp.abs(updates["head"]["linear"]["kernel"]).max())
    body_u = float(jnp.abs(updates["backbone"]["conv_a"]["kernel"]).max())
    bn_u = float(jnp.abs(updates["backbone"]["bn"]["scale"]).max())
    assert body_u == pytest.approx(head_u / 10, rel=1e-5)
    assert bn_u == pytest.approx(head_u / 10, rel=1e-5)


def test_fixed_weights_frozen():
    """TRAIN.FIXED_WEIGHTS name segments are skipped from the optimizer
    (reference optimizer.py:102-108)."""
    cfg = load_config(HICO_FT_CFG, make_output_dir=False)
    cfg.TRAIN.FIXED_WEIGHTS = ["conv_a"]
    labels = param_labels(cfg, _standard_params())
    assert labels["backbone"]["conv_a"]["kernel"] == FROZEN
    assert labels["backbone"]["bn"]["scale"] != FROZEN


def test_sgd_dampening_matches_torch():
    """OPTIMIZER.DAMPENING: buf = momentum*buf + (1-dampening)*grad
    (torch.optim.SGD)."""
    import torch

    cfg = load_config(HICO_FT_CFG, make_output_dir=False,
                      opts=["OPTIMIZER.OPTIM_METHOD", "sgd",
                            "OPTIMIZER.MOMENTUM", "0.9",
                            "OPTIMIZER.DAMPENING", "0.3",
                            "OPTIMIZER.NESTEROV", "false",
                            "OPTIMIZER.WEIGHT_DECAY", "0.",
                            "OPTIMIZER.WARMUP_EPOCHS", "0",
                            "OPTIMIZER.LR_POLICY", "cosine"])
    params = {"head": {"w": jnp.ones((3,))}}
    tx, lr_fn = construct_optimizer(cfg, params, steps_per_epoch=1000)
    state = tx.init(params)

    tw = torch.ones(3, requires_grad=True)
    # constant-ish lr over a few early steps of a long schedule
    opt = torch.optim.SGD([tw], lr=1.0, momentum=0.9, dampening=0.3)

    p = params
    for step in range(3):
        g = jnp.full((3,), 0.5)
        updates, state = tx.update({"head": {"w": g}}, state, p)
        lr = float(lr_fn(step))
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)

        tw.grad = torch.full((3,), 0.5)
        for group in opt.param_groups:
            group["lr"] = lr
        opt.step()
        np.testing.assert_allclose(np.asarray(p["head"]["w"]),
                                   tw.detach().numpy(), rtol=1e-5)


def test_lars_bn_exclude_runs():
    """OPTIMIZER.BN_LARS_EXCLUDE: the bn group updates with plain SGD
    momentum instead of the LARS trust ratio (reference lars_exclude)."""
    cfg = load_config(HICO_FT_CFG, make_output_dir=False,
                      opts=["OPTIMIZER.OPTIM_METHOD", "lars",
                            "OPTIMIZER.WARMUP_EPOCHS", "0"])
    # not in the base schema; project YAMLs introduce it via merge, like
    # the reference's hico configs (hasattr check at optimizer.py:124)
    cfg.OPTIMIZER.BN_LARS_EXCLUDE = True
    params = _standard_params()
    tx, _ = construct_optimizer(cfg, params, steps_per_epoch=10)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["bn"]["scale"]).max()) > 0.0
    assert float(jnp.abs(updates["head"]["linear"]["kernel"]).max()) > 0.0


def test_freeze_flags_respect_collection_prefix():
    """param_labels runs over the FULL variables dict ({"params": ...}), so
    FREEZE_VISUAL/FREEZE_TEXT/logit_scale checks must see the module path
    AFTER the collection segment — otherwise 'frozen' towers keep weight-
    decaying every step (gradients are zero but add_decayed_weights isn't)."""
    cfg = load_config(HICO_FT_CFG, make_output_dir=False)
    cfg.VIDEO.BACKBONE.FREEZE_TEXT = True
    cfg.VIDEO.BACKBONE.FREEZE_VISUAL = True
    variables = {"params": {
        "visual": {"conv1": {"kernel": jnp.ones((3, 3, 3, 8))}},
        "text": {"token_embedding": jnp.ones((10, 8))},
        "logit_scale": jnp.ones(()),
        "head": {"linear": {"kernel": jnp.ones((8, 4))}},
    }}
    labels = param_labels(cfg, variables)
    assert labels["params"]["visual"]["conv1"]["kernel"] == FROZEN
    assert labels["params"]["text"]["token_embedding"] == FROZEN
    assert labels["params"]["logit_scale"] == FROZEN
    assert labels["params"]["head"]["linear"]["kernel"] != FROZEN


def test_steps_lr_policy_matches_reference_indexing():
    """STEPS lists lead with 0 in the reference convention; the stage index
    is the count of crossed bounds MINUS that leading zero
    (reference lr_policy.py:44-60)."""
    from dist_tpu.optim.lr_policy import lr_func_steps_with_relative_lrs

    cfg = load_config(HICO_FT_CFG, make_output_dir=False,
                      opts=["OPTIMIZER.BASE_LR", "1.0",
                            "OPTIMIZER.MAX_EPOCH", "200"])
    cfg.OPTIMIZER.STEPS = [0, 94, 154, 196]
    cfg.OPTIMIZER.LRS = [1.0, 0.1, 0.01, 0.001]
    for epoch, expect in ((0.0, 1.0), (50.0, 1.0), (94.0, 0.1),
                          (100.0, 0.1), (154.0, 0.01), (196.5, 0.001)):
        got = float(lr_func_steps_with_relative_lrs(cfg, epoch))
        assert got == pytest.approx(expect), (epoch, got)


def test_adjust_lr_scales_by_data_axis():
    """SimCLR ADJUST_LR multiplies by the GLOBAL batch: per-shard batch x
    the mesh data-axis size (the reference's NUM_GPUS*NUM_SHARDS factor)."""
    import jax
    from dist_tpu.optim.optimizer import base_lr

    cfg = load_config(HICO_FT_CFG, make_output_dir=False,
                      opts=["OPTIMIZER.BASE_LR", "0.3",
                            "TRAIN.BATCH_SIZE", "4"])
    cfg.OPTIMIZER.ADJUST_LR = True
    cfg.PRETRAIN.ENABLE = False
    expect = 0.3 * jax.device_count() * 4 / 256.0
    assert base_lr(cfg) == pytest.approx(expect)
