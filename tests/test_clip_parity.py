"""Numerical parity: JAX CLIP(+DiST) vs torch functional golden.

Validates (a) the torch->flax weight converter and (b) the model math,
against torch's own ops (F.multi_head_attention_forward, F.conv2d/3d,
F.layer_norm) — the exact primitives the reference's modules bottom out in.
"""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import tests.torch_golden as G
from tests.synth_ckpt import add_dist_state_dict, make_clip_state_dict
from dist_tpu.models.clip.convert import convert_clip_params
from dist_tpu.models.clip.model import (
    TextTransformer,
    VisionTransformer,
    sniff_architecture,
)
from dist_tpu.models.clip.clip_video import CLIPDiSTModel
from dist_tpu.models.dist.dist_net import DiSTConfig, DiSTNetwork

RNG = np.random.default_rng(0)

ARCH_KW = dict(embed_dim=32, image_resolution=32, vision_layers=2,
               vision_width=64, vision_patch_size=16, context_length=12,
               vocab_size=50, transformer_width=64, transformer_layers=2)

DIST_CFG = DiSTConfig(
    selected_layers=(0, 1),
    temporal_dim=16,
    integration_dim=64,
    s_patch_size=16,
    t_patch_size=5,
    temporal_kernel_size=3,
    temporal_conv_mlp_ratio=1.0,
    integration_mlp_ratio=1.0,
    integration_temporal_mlp_ratio=0.25,
    ada_pooling_layers=2,
    num_frames=4,
    alpha=2,
)


@pytest.fixture(scope="module")
def sd():
    state = make_clip_state_dict(RNG, **ARCH_KW)
    add_dist_state_dict(state, RNG, DIST_CFG, d_model=ARCH_KW["vision_width"])
    return state


@pytest.fixture(scope="module")
def converted(sd):
    return convert_clip_params(sd, with_dist=DIST_CFG)


def test_sniff_architecture(sd):
    arch = sniff_architecture(sd)
    assert arch.vision_width == 64
    assert arch.vision_layers == 2
    assert arch.vision_patch_size == 16
    assert arch.image_resolution == 32
    assert arch.embed_dim == 32
    assert arch.transformer_layers == 2
    assert arch.context_length == 12


def test_visual_tower_parity(sd, converted):
    params, arch = converted
    B, T = 2, 4
    frames = RNG.standard_normal((B, T, 32, 32, 3)).astype(np.float32)

    model = VisionTransformer(arch=arch, num_frames=T, sparse_alpha=2)
    cls_x, x_logits, taps = model.apply(
        {"params": params["visual"]}, jnp.asarray(frames))

    frames_t = torch.from_numpy(frames).reshape(B * T, 32, 32, 3).permute(0, 3, 1, 2)
    g_cls, g_logits, g_taps = G.visual_tower(frames_t, sd, arch, T, alpha=2)

    np.testing.assert_allclose(np.asarray(cls_x), g_cls.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x_logits), g_logits.numpy(), atol=2e-5)
    # golden taps are LND; ours NLD
    for i in range(arch.vision_layers):
        np.testing.assert_allclose(
            np.asarray(taps[i]), g_taps[i].permute(1, 0, 2).numpy(), atol=2e-5)


def test_text_tower_parity(sd, converted):
    params, arch = converted
    tokens = np.zeros((3, arch.context_length), np.int64)
    for row in range(3):
        L = int(RNG.integers(3, arch.context_length))
        tokens[row, :L] = RNG.integers(1, arch.vocab_size - 1, L)
        tokens[row, L - 1] = arch.vocab_size - 1  # eot = highest id

    model = TextTransformer(arch=arch)
    feats, _ = model.apply({"params": params["text"]},
                           jnp.asarray(tokens.astype(np.int32)))
    g = G.text_tower(torch.from_numpy(tokens), sd, arch)
    np.testing.assert_allclose(np.asarray(feats), g.numpy(), atol=2e-5)


def test_dist_network_parity(sd, converted):
    params, arch = converted
    B, T = 2, DIST_CFG.num_frames
    tt = T // DIST_CFG.alpha
    video = RNG.standard_normal((B, T, 32, 32, 3)).astype(np.float32)
    taps = [RNG.standard_normal((B * tt, 5, arch.vision_width)).astype(np.float32)
            for _ in DIST_CFG.selected_layers]

    model = DiSTNetwork(cfg=DIST_CFG, d_model=arch.vision_width,
                        output_dim=arch.embed_dim)
    out = model.apply({"params": params["dist_net"]},
                      jnp.asarray(video), jnp.stack(taps))

    video_t = torch.from_numpy(video).permute(0, 4, 1, 2, 3)  # B,C,T,H,W
    taps_t = [torch.from_numpy(x).permute(1, 0, 2) for x in taps]  # LND
    g = G.dist_network(video_t, taps_t, sd, DIST_CFG, arch.vision_width)
    np.testing.assert_allclose(np.asarray(out), g.numpy(), atol=3e-5)


def test_full_model_logits_parity(sd, converted):
    """End-to-end: video + label-text -> logits_per_image."""
    params, arch = converted
    B, T = 2, DIST_CFG.num_frames
    video = RNG.standard_normal((B, T, 32, 32, 3)).astype(np.float32)
    tokens = np.zeros((5, arch.context_length), np.int64)
    for row in range(5):
        tokens[row, :4] = RNG.integers(1, arch.vocab_size - 1, 4)
        tokens[row, 3] = arch.vocab_size - 1

    model = CLIPDiSTModel(arch=arch, dist=DIST_CFG, num_frames=T,
                          sparse_alpha=DIST_CFG.alpha)
    tf = model.apply({"params": params}, jnp.asarray(tokens.astype(np.int32)),
                     method=CLIPDiSTModel.encode_text)
    out = model.apply({"params": params}, jnp.asarray(video), tf)
    logits = np.asarray(out["logits_per_image"][:, 0, :])

    # torch golden end-to-end (clip.py:482-527)
    frames_t = torch.from_numpy(video).reshape(B * T, 32, 32, 3).permute(0, 3, 1, 2)
    _, _, g_taps = G.visual_tower(frames_t, sd, arch, T, DIST_CFG.alpha)
    video_t = torch.from_numpy(video).permute(0, 4, 1, 2, 3)
    v = G.dist_network(video_t, g_taps, sd, DIST_CFG, arch.vision_width)
    t_feats = G.text_tower(torch.from_numpy(tokens), sd, arch)
    v = v / v.norm(dim=1, keepdim=True)
    t_feats = t_feats / t_feats.norm(dim=1, keepdim=True)
    g_logits = float(np.exp(sd["logit_scale"])) * v @ t_feats.T

    np.testing.assert_allclose(logits, g_logits.numpy(), atol=5e-5)


def test_temporal_patch_stem_equals_conv():
    """TemporalPatchStem (patchify+GEMM) must match the nn.Conv it
    replaces bit-for-bit up to float association (same param tree)."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dist_tpu.models.dist.dist_net import TemporalPatchStem

    tp, p, c = 5, 8, 16
    stem = TemporalPatchStem(channels=c, t_patch=tp, s_patch=p)
    conv = nn.Conv(c, (tp, p, p), strides=(1, p, p),
                   padding=((tp // 2, tp // 2), (0, 0), (0, 0)),
                   param_dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (2, 6, 24, 24, 3), jnp.float32)
    sv = stem.init(rng, video)
    out_stem = stem.apply(sv, video)
    out_conv = conv.apply({"params": {"kernel": sv["params"]["kernel"],
                                      "bias": sv["params"]["bias"]}}, video)
    assert out_stem.shape == out_conv.shape == (2, 6, 3, 3, c)
    np.testing.assert_allclose(np.asarray(out_stem), np.asarray(out_conv),
                               rtol=2e-5, atol=2e-5)


def test_ladder_remat_matches_and_differentiates():
    """TPU.REMAT wraps the DiST ladder scan body: outputs must match the
    non-remat network exactly and gradients must flow."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dist_tpu.models.dist.dist_net import DiSTConfig, DiSTNetwork

    cfg = DiSTConfig(selected_layers=(0, 1), num_frames=4, alpha=2,
                     temporal_dim=16, integration_dim=64, s_patch_size=16,
                     t_patch_size=5)
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (2, 4, 32, 32, 3), jnp.float32)
    taps = jax.random.normal(rng, (2, 4, 5, 24), jnp.float32)
    base = DiSTNetwork(cfg=cfg, d_model=24, output_dim=8)
    rem = DiSTNetwork(cfg=cfg, d_model=24, output_dim=8, remat=True)
    v = base.init(rng, video, taps)
    out_b = base.apply(v, video, taps)
    out_r = rem.apply(v, video, taps)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_r),
                               rtol=1e-5, atol=1e-5)
    g = jax.grad(lambda v: jnp.sum(rem.apply(v, video, taps)))(v)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_ladder_unroll_and_remat_equivalence():
    """TPU.LADDER_UNROLL / TPU.REMAT are pure scheduling knobs: identical
    params, identical outputs and grads vs the rolled ladder scan."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dist_tpu.models.dist.dist_net import DiSTConfig, DiSTNetwork

    cfg = DiSTConfig(selected_layers=tuple(range(4)), num_frames=4, alpha=2)
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (1, 4, 32, 32, 3), jnp.float32)
    taps = jax.random.normal(rng, (4, 2, 5, 64), jnp.float32)

    base = DiSTNetwork(cfg=cfg, d_model=64, output_dim=16)
    variables = base.init(rng, video, taps)
    want = np.asarray(base.apply(variables, video, taps))
    gwant = jax.grad(lambda v: jnp.sum(base.apply(v, video, taps)))(variables)

    for kw in ({"unroll": 4}, {"remat": True},
               {"remat": True, "unroll": 2}):
        net = DiSTNetwork(cfg=cfg, d_model=64, output_dim=16, **kw)
        got = np.asarray(net.apply(variables, video, taps))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
        g = jax.grad(lambda v: jnp.sum(net.apply(v, video, taps)))(variables)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(gwant),
                jax.tree_util.tree_leaves_with_path(g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4, err_msg=str(pa))
