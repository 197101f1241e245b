"""VideoMAE-style tubelet ViT encoder + masked encoder/decoder
(reference models/base/vit_video.py:250-472).

- ``VitVideoEncoder``: tubelet tokens + sin-cos positions -> transformer ->
  mean-pooled feature,
- ``VitVideoMAEEncoder``: MAE random masking with a STATIC visible count
  (ratio fixed at trace time; shuffling via argsort of uniform noise keeps
  shapes static for XLA),
- ``VitVideoMAEDecoder``: lightweight decoder over full token grid with
  mask tokens, reconstructing normalized tubelet pixels.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from dist_tpu.models.base.models import BACKBONE_REGISTRY
from dist_tpu.models.backbones.video_transformer import (
    BaseTransformerLayer,
    TubeletEmbeddingStem,
)
from dist_tpu.models.precision import maybe_bf16_input


def sincos_pos_embed(n, dim):
    """Fixed sin-cos position table (vit_video.py get_sinusoid_encoding)."""
    pos = np.arange(n)[:, None]
    omega = np.power(10000, 2 * (np.arange(dim) // 2) / dim)
    table = pos / omega[None, :]
    table[:, 0::2] = np.sin(table[:, 0::2])
    table[:, 1::2] = np.cos(table[:, 1::2])
    return jnp.asarray(table[None], jnp.float32)


class _Blocks(nn.Module):
    cfg: Any
    depth: int
    prefix: str = "layer"

    @nn.compact
    def __call__(self, x, train=True):
        for i in range(self.depth):
            x = BaseTransformerLayer(self.cfg, name=f"{self.prefix}_{i}")(x, train)
        return x


@BACKBONE_REGISTRY.register()
class VitVideoEncoder(nn.Module):
    """(vit_video.py:250-330)"""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        cfg = self.cfg
        if isinstance(x, dict):
            x = x["video"]
        x = maybe_bf16_input(cfg, x)
        x = TubeletEmbeddingStem(cfg, name="stem")(x, train)
        x = x + sincos_pos_embed(x.shape[1], x.shape[2]).astype(x.dtype)
        x = _Blocks(cfg, cfg.VIDEO.BACKBONE.DEPTH, name="blocks")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x.mean(axis=1)


@BACKBONE_REGISTRY.register()
class VitVideoMAEEncoder(nn.Module):
    """Masked encoder (vit_video.py:332-400): encodes only visible tokens.

    Returns (latent, ids_restore) where latent covers the
    ``(1-mask_ratio)`` visible fraction.
    """

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True, rng=None):
        cfg = self.cfg
        if isinstance(x, dict):
            x = x["video"]
        ratio = float(cfg.VIDEO.BACKBONE.get("MASK_RATIO", 0.9))
        x = maybe_bf16_input(cfg, x)
        x = TubeletEmbeddingStem(cfg, name="stem")(x, train)
        b, n, c = x.shape
        x = x + sincos_pos_embed(n, c).astype(x.dtype)

        n_keep = max(1, int(round(n * (1.0 - ratio))))
        if rng is None:
            rng = self.make_rng("mask")
        noise = jax.random.uniform(rng, (b, n))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        keep = ids_shuffle[:, :n_keep]
        x = jnp.take_along_axis(x, keep[:, :, None], axis=1)

        x = _Blocks(cfg, cfg.VIDEO.BACKBONE.DEPTH, name="blocks")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x, ids_restore


@BACKBONE_REGISTRY.register()
class VitVideoMAEDecoder(nn.Module):
    """4-layer reconstruction decoder (vit_video.py:402-472)."""

    cfg: Any

    @nn.compact
    def __call__(self, latent, ids_restore, train=True):
        cfg = self.cfg
        bb = cfg.VIDEO.BACKBONE
        dec_dim = int(bb.get("DECODER_DIM", 384))
        dec_depth = int(bb.get("DECODER_DEPTH", 4))
        p = bb.PATCH_SIZE
        ts = bb.get("TUBELET_SIZE", 2)
        out_dim = p * p * ts * 3

        b, n_vis, _ = latent.shape
        n = ids_restore.shape[1]
        x = nn.Dense(dec_dim, name="embed")(latent)
        mask_token = self.param("mask_token", nn.initializers.truncated_normal(0.02),
                                (1, 1, dec_dim))
        pad = jnp.broadcast_to(mask_token, (b, n - n_vis, dec_dim))
        x = jnp.concatenate([x, pad], axis=1)
        x = jnp.take_along_axis(x, ids_restore[:, :, None], axis=1)
        x = x + sincos_pos_embed(n, dec_dim)

        dec_cfg = cfg.deep_copy()
        dec_cfg.VIDEO.BACKBONE.NUM_FEATURES = dec_dim
        dec_cfg.VIDEO.BACKBONE.NUM_HEADS = max(dec_dim // 64, 1)
        x = _Blocks(dec_cfg, dec_depth, name="blocks")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return nn.Dense(out_dim, name="pred")(x)
