"""Numerical parity at the FLAGSHIP ViT-L/14 geometry: random fp16-quantized
weights at the exact shapes of the reference's headline accuracy rows
(73.1 SSV2 / 88.0-89.6 K400, reference README.md:42,46-47) — 24 layers x
width 1024 x 16 heads, patch 14, 257 tokens, embed 768, text tower 768x12,
and the all-24-layer DiST ladder of
configs/projects/dist/ssv2/vit-l14-32+64f.yaml (integration 384 /
temporal 96 / S_PATCH_SIZE 14 / T_PATCH_SIZE 5 / 2 ada-pooling layers).

The B/16 twin (tests/test_full_geometry_parity.py) pins the production
geometry of the base rows; this file pins everything that CHANGES at L/14
and could silently break a converter or attention layout: layer count,
head count (1024/64=16), token count (224/14 -> 16x16+1 = 257), the
sniffed embed dim 768, the patch-14 temporal-stem grid, and a 24-entry
ladder. Frames are kept few (8 dense / 4 sparse) for CPU runtime — the
axes under test are width/depth/tokens, not time (reference shape
sniffing: models/base/clip.py:564-611).
"""

import pytest

pytestmark = pytest.mark.slow  # heavy: full L/14 geometry on CPU

import numpy as np
import torch

import jax.numpy as jnp

import tests.torch_golden as G
from tests.synth_ckpt import add_dist_state_dict, make_clip_state_dict
from dist_tpu.models.clip.convert import convert_clip_params
from dist_tpu.models.clip.clip_video import CLIPDiSTModel
from dist_tpu.models.dist.dist_net import DiSTConfig

RNG = np.random.default_rng(14)

L14_KW = dict(embed_dim=768, image_resolution=224, vision_layers=24,
              vision_width=1024, vision_patch_size=14, context_length=77,
              vocab_size=49408, transformer_width=768,
              transformer_layers=12)

# configs/projects/dist/ssv2/vit-l14-32+64f.yaml DIST block (S_PATCH_SIZE 14
# is this repo's documented geometric fix: 224/14 = 16 aligns the temporal
# stem with the L/14 token grid; the reference ships 16, which cannot align).
# num_frames=8 instead of the recipe's 64: time is a batch-like axis for
# every geometry-sensitive op under test here.
L14_DIST = DiSTConfig(
    selected_layers=tuple(range(24)),
    temporal_dim=96,
    integration_dim=384,
    s_patch_size=14,
    t_patch_size=5,
    temporal_kernel_size=3,
    temporal_conv_mlp_ratio=1.0,
    integration_mlp_ratio=1.0,
    integration_temporal_mlp_ratio=0.25,
    ada_pooling_layers=2,
    num_frames=8,
    alpha=2,
)

# fp16 islands of the reference's convert_weights (models/base/clip.py:540-561)
_FP16_MARKERS = ("conv1.weight", "in_proj", "out_proj", "c_fc", "c_proj",
                 ".proj", "text_projection", "input_linears", "temporal_stem",
                 "fc", "linear", "qkv")


def _quantize_fp16(sd):
    out = {}
    for k, v in sd.items():
        if any(m in k for m in _FP16_MARKERS) and "ln" not in k:
            out[k] = np.asarray(v).astype(np.float16).astype(np.float32)
        else:
            out[k] = v
    return out


@pytest.fixture(scope="module")
def sd():
    state = make_clip_state_dict(RNG, **L14_KW)
    add_dist_state_dict(state, RNG, L14_DIST, d_model=L14_KW["vision_width"])
    return _quantize_fp16(state)


@pytest.fixture(scope="module")
def converted(sd):
    return convert_clip_params(sd, with_dist=L14_DIST)


def test_l14_arch_sniffing(converted):
    """The converter must recover the full L/14 architecture from key shapes
    alone — exactly what loading a released L/14 checkpoint relies on."""
    _, arch = converted
    assert arch.vision_layers == 24
    assert arch.vision_width == 1024
    assert arch.vision_heads == 16
    assert arch.vision_patch_size == 14
    assert (arch.image_resolution // arch.vision_patch_size) ** 2 + 1 == 257
    assert arch.embed_dim == 768
    assert arch.transformer_width == 768
    assert arch.transformer_layers == 12


def test_l14_geometry_logits_parity(sd, converted):
    """End-to-end at L/14 shapes: video (1, 8, 224, 224, 3) + 8 label texts
    -> logits_per_image, flax vs torch golden."""
    params, arch = converted

    B, T = 1, L14_DIST.num_frames
    video = (RNG.standard_normal((B, T, 224, 224, 3)) * 0.5).astype(np.float32)
    n_texts = 8
    tokens = np.zeros((n_texts, arch.context_length), np.int64)
    for row in range(n_texts):
        L = int(RNG.integers(5, 20))
        tokens[row, :L] = RNG.integers(1, arch.vocab_size - 1, L)
        tokens[row, L - 1] = arch.vocab_size - 1  # eot = highest id

    model = CLIPDiSTModel(arch=arch, dist=L14_DIST, num_frames=T,
                          sparse_alpha=L14_DIST.alpha)
    tf = model.apply({"params": params}, jnp.asarray(tokens.astype(np.int32)),
                     method=CLIPDiSTModel.encode_text)
    out = model.apply({"params": params}, jnp.asarray(video), tf)
    logits = np.asarray(out["logits_per_image"][:, 0, :])

    # torch golden end-to-end (reference clip.py:482-527)
    frames_t = torch.from_numpy(video).reshape(B * T, 224, 224, 3) \
        .permute(0, 3, 1, 2)
    _, _, g_taps = G.visual_tower(frames_t, sd, arch, T, L14_DIST.alpha)
    assert len(g_taps) == 24
    assert g_taps[0].shape == (257, B * T // L14_DIST.alpha, 1024)
    video_t = torch.from_numpy(video).permute(0, 4, 1, 2, 3)
    v = G.dist_network(video_t, g_taps, sd, L14_DIST, arch.vision_width)
    t_feats = G.text_tower(torch.from_numpy(tokens), sd, arch)
    v = v / v.norm(dim=1, keepdim=True)
    t_feats = t_feats / t_feats.norm(dim=1, keepdim=True)
    g_logits = (float(np.exp(sd["logit_scale"])) * v @ t_feats.T).numpy()

    # logits are logit_scale (~100) x cosine similarity: 2e-3 absolute =
    # 2e-5 on the cosine — well inside the 0.3%-accuracy acceptance bar,
    # even with 2x the depth of the B/16 test accumulating error
    np.testing.assert_allclose(logits, g_logits, atol=2e-3)
    np.testing.assert_array_equal(logits.argmax(-1), g_logits.argmax(-1))


def test_l14_geometry_taps_parity(sd, converted):
    """All 24 mid-layer taps at (257, t, 1024) — the DiST ladder's input at
    L/14 — match the torch golden per layer (converter + 16-head attention
    layout at width 1024)."""
    from dist_tpu.models.clip.model import VisionTransformer

    params, arch = converted
    B, T = 1, 4  # sparse frames through the tower
    frames = (RNG.standard_normal((B, T, 224, 224, 3)) * 0.5).astype(np.float32)

    model = VisionTransformer(arch=arch, num_frames=T, sparse_alpha=2)
    cls_x, x_logits, taps = model.apply(
        {"params": params["visual"]}, jnp.asarray(frames))

    frames_t = torch.from_numpy(frames).reshape(B * T, 224, 224, 3) \
        .permute(0, 3, 1, 2)
    g_cls, g_logits, g_taps = G.visual_tower(frames_t, sd, arch, T, alpha=2)

    np.testing.assert_allclose(np.asarray(cls_x), g_cls.numpy(), atol=1e-3)
    np.testing.assert_allclose(np.asarray(x_logits), g_logits.numpy(),
                               atol=1e-3)
    assert len(taps) == 24
    for i in range(arch.vision_layers):
        np.testing.assert_allclose(
            np.asarray(taps[i]), g_taps[i].permute(1, 0, 2).numpy(),
            atol=1e-3,
            err_msg=f"tap layer {i} diverged at L/14 geometry")
