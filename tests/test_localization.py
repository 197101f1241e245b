"""TAL path end-to-end: SimpleLocalizationConv + BMNHead + BMN losses."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_tpu.config import load_config
from dist_tpu.config.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _loc_cfg():
    cfg = load_config(os.path.join(REPO, "configs/pool/base.yaml"),
                      make_output_dir=False)
    cfg.LOCALIZATION = Config({
        "ENABLE": True,
        "LOSS": "Tem+PemReg+PemCls",
        "LOSS_WEIGHTS": [1.0, 10.0, 1.0],
        "POS_REG_THRES": 0.7,
        "NEG_REG_THRES": 0.3,
        "POS_CLS_THRES": 0.9,
        "DSCALE": 8,
    })
    cfg.VIDEO.DIM1D = 16
    cfg.VIDEO.BACKBONE_LAYER = 2
    cfg.VIDEO.BACKBONE_GROUPS_NUM = 1
    cfg.VIDEO.BACKBONE.META_ARCH = "SimpleLocalizationConv"
    cfg.VIDEO.HEAD.NAME = "BMNHead"
    cfg.DATA.NUM_INPUT_CHANNELS = 12
    return cfg


def test_window_means():
    from dist_tpu.models.heads.bmn import proposal_window_means

    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 6, 1)
    m = proposal_window_means(x, 3)
    # d=0: identity
    np.testing.assert_allclose(np.asarray(m[0, 0, :, 0]), np.arange(6), atol=1e-6)
    # d=1: mean of pairs; last slot invalid -> 0
    np.testing.assert_allclose(np.asarray(m[0, 1, :, 0]),
                               [0.5, 1.5, 2.5, 3.5, 4.5, 0.0], atol=1e-6)
    # d=2: triples
    np.testing.assert_allclose(np.asarray(m[0, 2, :4, 0]), [1, 2, 3, 4], atol=1e-6)


@pytest.mark.slow  # heavy compile (fast-lane budget, README: Tests)
def test_bmn_head_and_losses():
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.losses import calculate_loss

    cfg = _loc_cfg()
    model = build_model(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12))
    variables = model.init(jax.random.PRNGKey(1), {"video": feats})
    preds, logits = model.apply(variables, {"video": feats}, train=True)
    assert preds["start"].shape == (2, 16)
    assert preds["confidence_map"].shape == (2, 2, 8, 16)

    rng = np.random.default_rng(0)
    labels = {"supervised": {
        "start_map": rng.uniform(size=(2, 16)).astype(np.float32),
        "end_map": rng.uniform(size=(2, 16)).astype(np.float32),
        "iou_map": rng.uniform(size=(2, 8, 16)).astype(np.float32),
        "mask": np.ones((2, 8, 16), np.float32),
    }}
    loss, parts = calculate_loss(cfg, preds, logits, labels)
    assert np.isfinite(float(loss))
    assert set(parts) == {"tem", "pem_reg", "pem_cls"}


@pytest.mark.slow  # heavy compile (fast-lane budget, README: Tests)
def test_bmn_losses_differentiable():
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.losses import calculate_loss

    cfg = _loc_cfg()
    model = build_model(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 12))
    variables = model.init(jax.random.PRNGKey(1), {"video": feats})
    rng = np.random.default_rng(0)
    labels = {"supervised": {
        "start_map": (rng.uniform(size=(1, 16)) > 0.5).astype(np.float32),
        "end_map": (rng.uniform(size=(1, 16)) > 0.5).astype(np.float32),
        "iou_map": rng.uniform(size=(1, 8, 16)).astype(np.float32),
        "mask": np.ones((1, 8, 16), np.float32),
    }}

    def loss_fn(v):
        preds, logits = model.apply(v, {"video": feats}, train=True)
        loss, _ = calculate_loss(cfg, preds, logits, labels)
        return loss

    g = jax.grad(loss_fn)(variables)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
