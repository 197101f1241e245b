"""Numerical parity at PRODUCTION geometry: random fp16-quantized weights
at the exact ViT-B/16 + DiST shapes (12 x 768, 224px, 197 tokens, embed
512; DiST 12-layer ladder, integration 384 / temporal 96, 8+16 frames),
torch functional golden vs the converted flax model end-to-end through the
cosine head.

The toy-geometry suite (tests/test_clip_parity.py) validates the math; this
file validates it at real magnitudes — accumulation order and dtype effects
at 12 layers x 768 width with fp16-quantized source weights are exactly
what a converted released checkpoint exercises (reference fp16 islands:
models/base/clip.py:540-561).
"""

import pytest

pytestmark = pytest.mark.slow  # heavy: full B/16 geometry on CPU

import numpy as np
import torch

import jax.numpy as jnp

import tests.torch_golden as G
from tests.synth_ckpt import add_dist_state_dict, make_clip_state_dict
from dist_tpu.models.clip.convert import convert_clip_params
from dist_tpu.models.clip.clip_video import CLIPDiSTModel
from dist_tpu.models.dist.dist_net import DiSTConfig

RNG = np.random.default_rng(16)

B16_KW = dict(embed_dim=512, image_resolution=224, vision_layers=12,
              vision_width=768, vision_patch_size=16, context_length=77,
              vocab_size=49408, transformer_width=512,
              transformer_layers=12)

# reference configs/projects/dist/ssv2/vit_base_16_ssv2.yaml DIST block
B16_DIST = DiSTConfig(
    selected_layers=tuple(range(12)),
    temporal_dim=96,
    integration_dim=384,
    s_patch_size=16,
    t_patch_size=5,
    temporal_kernel_size=3,
    temporal_conv_mlp_ratio=1.0,
    integration_mlp_ratio=1.0,
    integration_temporal_mlp_ratio=0.25,
    ada_pooling_layers=2,
    num_frames=16,
    alpha=2,
)

# the fp16 islands of the reference's convert_weights
# (models/base/clip.py:540-561): conv / linear / attention / projection
# weights go fp16; LayerNorms, embeddings, and logit_scale stay fp32
_FP16_MARKERS = ("conv1.weight", "in_proj", "out_proj", "c_fc", "c_proj",
                 ".proj", "text_projection", "input_linears", "temporal_stem",
                 "fc", "linear", "qkv")


def _quantize_fp16(sd):
    """Round the fp16-island tensors through float16 (keeping fp32 dtype so
    both golden and flax consume identical values and compute in fp32 —
    the released checkpoints' quantization, without fp16 CPU kernels)."""
    out = {}
    for k, v in sd.items():
        if any(m in k for m in _FP16_MARKERS) and "ln" not in k:
            out[k] = np.asarray(v).astype(np.float16).astype(np.float32)
        else:
            out[k] = v
    return out


@pytest.fixture(scope="module")
def sd():
    state = make_clip_state_dict(RNG, **B16_KW)
    add_dist_state_dict(state, RNG, B16_DIST, d_model=B16_KW["vision_width"])
    return _quantize_fp16(state)


@pytest.fixture(scope="module")
def converted(sd):
    return convert_clip_params(sd, with_dist=B16_DIST)


def test_full_geometry_logits_parity(sd, converted):
    """End-to-end at production shapes: video (1, 16, 224, 224, 3) +
    8 label texts -> logits_per_image, flax vs torch golden."""
    params, arch = converted
    assert arch.vision_width == 768 and arch.vision_layers == 12
    assert (arch.image_resolution // arch.vision_patch_size) ** 2 + 1 == 197

    B, T = 1, B16_DIST.num_frames
    video = (RNG.standard_normal((B, T, 224, 224, 3)) * 0.5).astype(np.float32)
    n_texts = 8
    tokens = np.zeros((n_texts, arch.context_length), np.int64)
    for row in range(n_texts):
        L = int(RNG.integers(5, 20))
        tokens[row, :L] = RNG.integers(1, arch.vocab_size - 1, L)
        tokens[row, L - 1] = arch.vocab_size - 1  # eot = highest id

    model = CLIPDiSTModel(arch=arch, dist=B16_DIST, num_frames=T,
                          sparse_alpha=B16_DIST.alpha)
    tf = model.apply({"params": params}, jnp.asarray(tokens.astype(np.int32)),
                     method=CLIPDiSTModel.encode_text)
    out = model.apply({"params": params}, jnp.asarray(video), tf)
    logits = np.asarray(out["logits_per_image"][:, 0, :])

    # torch golden end-to-end (reference clip.py:482-527)
    frames_t = torch.from_numpy(video).reshape(B * T, 224, 224, 3) \
        .permute(0, 3, 1, 2)
    _, _, g_taps = G.visual_tower(frames_t, sd, arch, T, B16_DIST.alpha)
    assert g_taps[0].shape == (197, B * T // B16_DIST.alpha, 768)
    video_t = torch.from_numpy(video).permute(0, 4, 1, 2, 3)
    v = G.dist_network(video_t, g_taps, sd, B16_DIST, arch.vision_width)
    t_feats = G.text_tower(torch.from_numpy(tokens), sd, arch)
    v = v / v.norm(dim=1, keepdim=True)
    t_feats = t_feats / t_feats.norm(dim=1, keepdim=True)
    g_logits = (float(np.exp(sd["logit_scale"])) * v @ t_feats.T).numpy()

    # logits are logit_scale (~100) x cosine similarity: 1e-3 absolute =
    # 1e-5 on the cosine — well inside the 0.3%-accuracy acceptance bar
    np.testing.assert_allclose(logits, g_logits, atol=2e-3)
    # and the decision itself is identical
    np.testing.assert_array_equal(logits.argmax(-1), g_logits.argmax(-1))


def test_full_geometry_taps_parity(sd, converted):
    """The 12 mid-layer taps at (197, 8, 768) — the DiST ladder's input —
    match the torch golden per layer (converter + attention layout at
    production width)."""
    from dist_tpu.models.clip.model import VisionTransformer

    params, arch = converted
    B, T = 1, 4  # sparse frames through the tower: geometry, smaller T
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
    for i in range(arch.vision_layers):
        np.testing.assert_allclose(
            np.asarray(taps[i]), g_taps[i].permute(1, 0, 2).numpy(),
            atol=1e-3,
            err_msg=f"tap layer {i} diverged at production geometry")
