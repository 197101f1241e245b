"""SlowFast / S3DG / VideoMAE backbone shape + behavior tests."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import os

import numpy as np
import jax
import jax.numpy as jnp

from dist_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = os.path.join(REPO, "configs/pool/base.yaml")


def _cfg(opts):
    return load_config(BASE, opts=opts, make_output_dir=False)


def test_slowfast_forward():
    from dist_tpu.models.base.models import build_model

    cfg = _cfg(["VIDEO.HEAD.NUM_CLASSES", "5",
                "DATA.NUM_INPUT_FRAMES", "8",
                "DATA.TRAIN_CROP_SIZE", "32",
                "VIDEO.BACKBONE.META_ARCH", "Slowfast",
                "VIDEO.BACKBONE.DEPTH", "10",
                "VIDEO.HEAD.NAME", "SlowFastHead"])
    bb = cfg.VIDEO.BACKBONE
    bb.NUM_FILTERS = [32, 32, 64, 128, 256]
    bb.NUM_OUT_FEATURES = 256
    bb.KERNEL_SIZE = [
        [[1, 7, 7], [1, 3, 3], [1, 3, 3], [1, 3, 3], [1, 3, 3]],
        [[5, 7, 7], [3, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]],
    ]
    bb.DOWNSAMPLING = [True, False, True, True, True]
    bb.DOWNSAMPLING_TEMPORAL = [False, False, False, False, False]
    bb.TEMPORAL_CONV_BOTTLENECK = [
        [False, False, False, True, True],
        [False, True, True, True, True],
    ]
    bb.EXPANSION_RATIO = 4
    bb.DEPTH = 50
    bb.cfg_dict["SLOWFAST"] = {
        "MODE": "slowfast", "ALPHA": 4, "BETA": 8, "CONV_CHANNEL_RATIO": 2,
        "KERNEL_SIZE": 5, "FUSION_CONV_BIAS": False, "FUSION_BN": True,
        "FUSION_RELU": True}
    from dist_tpu.config.config import Config
    bb.SLOWFAST = Config(bb.cfg_dict["SLOWFAST"])

    model = build_model(cfg)
    video = jnp.zeros((2, 8, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    preds, _ = model.apply(variables, {"video": video}, train=False)
    assert preds.shape == (2, 5)


def _tiny_slowfast_cfg(head_name, num_classes):
    cfg = _cfg(["DATA.NUM_INPUT_FRAMES", "8",
                "DATA.TRAIN_CROP_SIZE", "32",
                "VIDEO.BACKBONE.META_ARCH", "Slowfast",
                "VIDEO.HEAD.NAME", head_name])
    cfg.VIDEO.HEAD.NUM_CLASSES = num_classes
    bb = cfg.VIDEO.BACKBONE
    bb.NUM_FILTERS = [32, 32, 64, 128, 256]
    bb.NUM_OUT_FEATURES = 256
    bb.KERNEL_SIZE = [
        [[1, 7, 7], [1, 3, 3], [1, 3, 3], [1, 3, 3], [1, 3, 3]],
        [[5, 7, 7], [3, 3, 3], [3, 3, 3], [3, 3, 3], [3, 3, 3]],
    ]
    bb.DOWNSAMPLING = [True, False, True, True, True]
    bb.DOWNSAMPLING_TEMPORAL = [False] * 5
    bb.TEMPORAL_CONV_BOTTLENECK = [
        [False, False, False, True, True],
        [False, True, True, True, True],
    ]
    bb.EXPANSION_RATIO = 4
    bb.DEPTH = 50
    from dist_tpu.config.config import Config
    bb.cfg_dict["SLOWFAST"] = {
        "MODE": "slowfast", "ALPHA": 4, "BETA": 8, "CONV_CHANNEL_RATIO": 2,
        "KERNEL_SIZE": 5, "FUSION_CONV_BIAS": False, "FUSION_BN": True,
        "FUSION_RELU": True}
    bb.SLOWFAST = Config(bb.cfg_dict["SLOWFAST"])
    return cfg


def test_slowfast_headx2_forward_and_grad():
    """SlowFastHeadx2 (reference heads/slowfast_head.py:106-201): dict
    verb/noun predictions off the shared pooled feature; eval softmax rows
    sum to 1; gradients flow to both linears."""
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.losses import calculate_loss

    cfg = _tiny_slowfast_cfg("SlowFastHeadx2", [7, 11])
    model = build_model(cfg)
    video = jnp.asarray(
        np.random.RandomState(0).rand(2, 8, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    preds, feat = model.apply(variables, {"video": video}, train=False)
    assert set(preds) == {"verb_class", "noun_class"}
    assert preds["verb_class"].shape == (2, 7)
    assert preds["noun_class"].shape == (2, 11)
    np.testing.assert_allclose(
        np.asarray(preds["verb_class"]).sum(-1), 1.0, rtol=1e-5)

    labels = {"supervised": {
        "verb_class": jnp.asarray([1, 2]), "noun_class": jnp.asarray([3, 4])}}

    def loss_fn(v):
        p, _, stats = model.apply(
            v, {"video": video}, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)}, return_new_state=True)
        loss, _ = calculate_loss(cfg, p, None, labels, cur_epoch=0)
        return loss

    grads = jax.grad(loss_fn)(variables)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    for head_key in ("out1", "out2"):
        g = [np.abs(np.asarray(leaf)).sum() for path, leaf in flat
             if any(getattr(p, "key", None) == head_key for p in path)]
        assert g and sum(g) > 0, f"no gradient reached {head_key}"


def test_tada_convnext_original_variant():
    """TAdaConvNeXtBlockAvgPoolGELUOriginal (tada_convnext.py:84-160): same
    param tree as the AvgPoolGELU variant, but the pooled-branch LayerNorm
    starts at scale=1 so the block output differs from the zero-init one."""
    from dist_tpu.models.branches.tada_convnext import (
        TAdaConvNeXtBlockAvgPoolGELU, TAdaConvNeXtBlockAvgPoolGELUOriginal)

    cfg = _cfg(["DATA.NUM_INPUT_FRAMES", "4", "DATA.TRAIN_CROP_SIZE", "16"])
    bb = cfg.VIDEO.BACKBONE
    bb.BRANCH.ROUTE_FUNC_K = [3, 3]
    bb.BRANCH.ROUTE_FUNC_R = 4
    bb.BRANCH.ROUTE_FUNC_TYPE = "normal"

    x = jnp.asarray(np.random.RandomState(0).rand(1, 4, 8, 8, 16), jnp.float32)
    blk = TAdaConvNeXtBlockAvgPoolGELU(dim=16, cfg=cfg)
    blk_o = TAdaConvNeXtBlockAvgPoolGELUOriginal(dim=16, cfg=cfg)
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    v_o = blk_o.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_o))
    ln = v_o["params"]["avgpool_norm"]
    np.testing.assert_array_equal(np.asarray(ln["scale"]), 1.0)
    y = blk.apply(v, x, train=False)
    y_o = blk_o.apply(v_o, x, train=False)
    assert y.shape == y_o.shape == x.shape
    assert np.abs(np.asarray(y - y_o)).max() > 1e-6


def test_s3dg_forward():
    from dist_tpu.models.base.models import build_model

    cfg = _cfg(["VIDEO.HEAD.NUM_CLASSES", "5",
                "DATA.NUM_INPUT_FRAMES", "8",
                "DATA.TRAIN_CROP_SIZE", "64",
                "VIDEO.BACKBONE.META_ARCH", "Inception3D",
                "VIDEO.BACKBONE.BRANCH.NAME", "STConv3d",
                "VIDEO.HEAD.NAME", "BaseHead"])
    cfg.VIDEO.BACKBONE.BRANCH.GATING = True
    model = build_model(cfg)
    video = jnp.zeros((1, 8, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    preds, _ = model.apply(variables, {"video": video}, train=False)
    assert preds.shape == (1, 5)


def test_videomae_encode_decode():
    from dist_tpu.models.backbones.vit_video import (
        VitVideoMAEDecoder, VitVideoMAEEncoder)

    cfg = _cfg(["DATA.NUM_INPUT_FRAMES", "4",
                "DATA.TRAIN_CROP_SIZE", "32"])
    bb = cfg.VIDEO.BACKBONE
    bb.NUM_FEATURES = 64
    bb.NUM_HEADS = 2
    bb.DEPTH = 2
    bb.PATCH_SIZE = 16
    bb.TUBELET_SIZE = 2
    bb.MASK_RATIO = 0.5
    bb.DECODER_DIM = 32
    bb.DECODER_DEPTH = 1
    bb.ATTN_DROPOUT = 0.0
    bb.FF_DROPOUT = 0.0
    bb.MLP_MULT = 4

    enc = VitVideoMAEEncoder(cfg)
    video = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    variables = enc.init(rngs, video)
    latent, ids_restore = enc.apply(variables, video,
                                    rngs={"mask": jax.random.PRNGKey(2)})
    n_total = (4 // 2) * (32 // 16) ** 2  # 8 tubelet tokens
    assert latent.shape == (2, 4, 64)     # 50% visible
    assert ids_restore.shape == (2, n_total)

    dec = VitVideoMAEDecoder(cfg)
    dvars = dec.init(jax.random.PRNGKey(3), latent, ids_restore)
    recon = dec.apply(dvars, latent, ids_restore)
    assert recon.shape == (2, n_total, 16 * 16 * 2 * 3)


def test_tada_convnext_forward():
    from dist_tpu.models.base.models import build_model

    cfg = _cfg(["VIDEO.HEAD.NUM_CLASSES", "5",
                "DATA.NUM_INPUT_FRAMES", "4",
                "DATA.TRAIN_CROP_SIZE", "32",
                "VIDEO.BACKBONE.META_ARCH", "ConvNeXt",
                "VIDEO.HEAD.NAME", "BaseHead"])
    bb = cfg.VIDEO.BACKBONE
    bb.DEPTH = [1, 1, 1, 1]
    bb.NUM_FILTERS = [16, 32, 64, 128]
    bb.NUM_OUT_FEATURES = 128
    bb.DROP_PATH = 0.1
    bb.LARGE_SCALE_INIT_VALUE = 1e-6
    bb.STEM.T_KERNEL_SIZE = 3
    bb.BRANCH.NAME = "TAdaConvNeXtBlockAvgPoolGELU"
    bb.BRANCH.ROUTE_FUNC_K = [3, 3]
    bb.BRANCH.ROUTE_FUNC_R = 4
    bb.BRANCH.ROUTE_FUNC_TYPE = "normal"

    model = build_model(cfg)
    video = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    preds, _ = model.apply(variables, {"video": video}, train=False)
    assert preds.shape == (2, 5)
