"""Conv backbone family: shapes, BN state threading, and a train step."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_tpu.config import load_config
from dist_tpu.models.base.models import build_model

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _conv_cfg(backbone_yaml, depth=None, extra=()):
    cfg = load_config(os.path.join(REPO, "configs/pool/backbone", backbone_yaml),
                      opts=["VIDEO.HEAD.NUM_CLASSES", "7",
                            "DATA.NUM_INPUT_FRAMES", "4",
                            "DATA.TRAIN_CROP_SIZE", "32",
                            *extra],
                      make_output_dir=False)
    if depth:
        cfg.VIDEO.BACKBONE.DEPTH = depth
    return cfg


@pytest.mark.parametrize("yaml_name,depth", [
    ("r2p1d.yaml", 10),
    ("tada2d.yaml", 50),
])
def test_backbone_forward_shapes(yaml_name, depth):
    cfg = _conv_cfg(yaml_name, depth)
    model = build_model(cfg)
    video = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    assert "batch_stats" in variables
    preds, logits = model.apply(variables, {"video": video}, train=False)
    assert preds.shape == (2, 7)
    # eval softmax sums to 1
    np.testing.assert_allclose(np.asarray(preds.sum(-1)), 1.0, rtol=1e-4)


def test_bn_stats_update_in_train_step():
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.tasks.state import create_train_state, make_train_step

    cfg = _conv_cfg("r2p1d.yaml", 10)
    cfg.TRAIN.LOSS_FUNC = "cross_entropy"
    model = build_model(cfg)
    video = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch=10)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, cfg, tx, lr_fn))
    batch = {"video": video, "labels": jnp.zeros((4,), jnp.int32)}
    before = jax.tree_util.tree_leaves(state.variables["batch_stats"])[0]
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    after = jax.tree_util.tree_leaves(new_state.variables["batch_stats"])[0]
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_tada_calibration_identity():
    """TAdaConv2d: conv(x * alpha, W) must equal the reference formulation
    conv(x, W scaled per input channel) — checked against torch.conv2d with
    explicitly calibrated weights (tada_branch.py:253-262)."""
    import torch
    import torch.nn.functional as F
    from dist_tpu.models.branches.tada import TAdaConv2d

    rng = np.random.default_rng(0)
    b, t, h, w, c, co = 2, 3, 8, 8, 6, 5
    x = rng.standard_normal((b, t, h, w, c)).astype(np.float32)
    alpha = (1 + 0.1 * rng.standard_normal((b, t, 1, 1, c))).astype(np.float32)

    mod = TAdaConv2d(features=co, kernel=(3, 3))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(alpha))
    out = mod.apply(variables, jnp.asarray(x), jnp.asarray(alpha))

    # torch reference: per-(b,t) weight = W * alpha over input channels
    kern = np.asarray(variables["params"]["conv"]["kernel"])  # (1,3,3,C,Co)
    wt = np.transpose(kern[0], (3, 2, 0, 1))  # (Co, C, 3, 3)
    ref = np.zeros((b, t, h, w, co), np.float32)
    for bi in range(b):
        for ti in range(t):
            w_bt = wt * alpha[bi, ti, 0, 0][None, :, None, None]
            xi = torch.from_numpy(x[bi, ti]).permute(2, 0, 1)[None]
            o = F.conv2d(xi, torch.from_numpy(w_bt), padding=1)
            ref[bi, ti] = o[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
