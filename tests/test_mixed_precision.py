"""TRAIN.MIXED_PRECISION on the conv / video-transformer backbones:
same param tree as fp32, bf16 activations inside, fp32 BN/LN islands,
outputs within bf16 tolerance of the fp32 model (reference fp16 semantics,
models/base/clip.py:540-561; the CLIP path is covered by
test_clip_parity/test_e2e — this file covers the zoo extension)."""

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


def _fp32_vs_bf16(make_cfg, video_shape, tol=3e-2):
    """Build the same model under fp32 and MIXED_PRECISION; same init
    params; compare eval outputs."""
    from dist_tpu.models.base.models import build_model

    cfg32 = make_cfg()
    cfg16 = make_cfg()
    cfg16.TRAIN.MIXED_PRECISION = True
    m32, m16 = build_model(cfg32), build_model(cfg16)
    video = jnp.asarray(
        np.random.RandomState(0).rand(*video_shape), jnp.float32)
    v32 = m32.init(jax.random.PRNGKey(0), {"video": video})
    v16 = m16.init(jax.random.PRNGKey(0), {"video": video})
    # identical param trees: master params stay fp32 under bf16 compute
    assert (jax.tree_util.tree_structure(v32)
            == jax.tree_util.tree_structure(v16))
    for leaf in jax.tree_util.tree_leaves(v16):
        assert leaf.dtype in (jnp.float32, jnp.int32), leaf.dtype

    p32, _ = m32.apply(v32, {"video": video}, train=False)
    p16, _ = m16.apply(v32, {"video": video}, train=False)

    def flat(p):
        if isinstance(p, dict):
            return jnp.concatenate([jnp.ravel(v) for v in p.values()])
        return jnp.ravel(p)

    a, b = np.asarray(flat(p32), np.float32), np.asarray(flat(p16), np.float32)
    assert np.max(np.abs(a - b)) < tol, float(np.max(np.abs(a - b)))

    # bf16 training still produces finite grads on every param
    def loss(v):
        out, _, stats = m16.apply(
            v, {"video": video}, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)}, return_new_state=True)
        if isinstance(out, dict):
            out = jnp.concatenate([jnp.ravel(o) for o in out.values()])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss)(v16)
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(leaf)).all(), path
        assert leaf.dtype == jnp.float32, (path, leaf.dtype)


def test_tada2d_mixed_precision():
    def make():
        cfg = _cfg(["VIDEO.HEAD.NUM_CLASSES", "5",
                    "DATA.NUM_INPUT_FRAMES", "4",
                    "DATA.TRAIN_CROP_SIZE", "32",
                    "VIDEO.BACKBONE.META_ARCH", "ResNet3D",
                    "VIDEO.BACKBONE.BRANCH.NAME", "TAdaConvBlockAvgPool",
                    "VIDEO.BACKBONE.STEM.NAME", "DownSampleStem",
                    "VIDEO.HEAD.NAME", "BaseHead"])
        cfg.VIDEO.BACKBONE.NUM_FILTERS = [8, 8, 16, 16, 32]
        cfg.VIDEO.BACKBONE.KERNEL_SIZE = [[1, 3, 3]] * 5
        cfg.VIDEO.BACKBONE.DOWNSAMPLING = [True, False, True, True, True]
        cfg.VIDEO.BACKBONE.DOWNSAMPLING_TEMPORAL = [False] * 5
        cfg.VIDEO.BACKBONE.EXPANSION_RATIO = 2
        # one bottleneck block per stage for compile time: a string DEPTH
        # selects the bottleneck transformation (block_shapes) with a
        # custom stage plan under a NEW key (no shared-state mutation)
        from dist_tpu.models.backbones import resnet3d
        resnet3d._N_CONV_RESNET.setdefault("tiny50", (1, 1, 1, 1))
        cfg.VIDEO.BACKBONE.DEPTH = "tiny50"
        return cfg

    _fp32_vs_bf16(make, (2, 4, 32, 32, 3))


def test_transformer_mixed_precision():
    def make():
        cfg = _cfg(["VIDEO.HEAD.NUM_CLASSES", "5",
                    "DATA.NUM_INPUT_FRAMES", "2",
                    "DATA.TRAIN_CROP_SIZE", "32",
                    "VIDEO.BACKBONE.META_ARCH", "Transformer",
                    "VIDEO.BACKBONE.STEM.NAME", "PatchEmbedStem",
                    "VIDEO.BACKBONE.BRANCH.NAME", "BaseTransformerLayer",
                    "VIDEO.HEAD.NAME", "TransformerHead"])
        bb = cfg.VIDEO.BACKBONE
        bb.NUM_FEATURES = 32
        bb.NUM_HEADS = 2
        bb.DEPTH = 2
        bb.PATCH_SIZE = 16
        bb.ATTN_DROPOUT = 0.0
        bb.FF_DROPOUT = 0.0
        bb.MLP_MULT = 2
        return cfg

    _fp32_vs_bf16(make, (2, 2, 32, 32, 3))


def test_s3dg_mixed_precision():
    def make():
        cfg = _cfg(["VIDEO.HEAD.NUM_CLASSES", "5",
                    "DATA.NUM_INPUT_FRAMES", "8",
                    "DATA.TRAIN_CROP_SIZE", "64",
                    "VIDEO.BACKBONE.META_ARCH", "Inception3D",
                    "VIDEO.BACKBONE.BRANCH.NAME", "STConv3d",
                    "VIDEO.HEAD.NAME", "BaseHead"])
        cfg.VIDEO.BACKBONE.BRANCH.GATING = True
        return cfg

    # deeper net -> slightly looser tolerance
    _fp32_vs_bf16(make, (1, 8, 64, 64, 3), tol=6e-2)
