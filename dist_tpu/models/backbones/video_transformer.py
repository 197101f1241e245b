"""Video transformer backbones: TimeSformer-style ViT + ViViT factorized
encoder (reference models/base/transformer.py:14-397, stems at
models/module_zoo/stems/embedding_stem.py:17-98).

- ``PatchEmbedStem`` / ``TubeletEmbeddingStem``: video -> tokens (one
  MXU-friendly conv patchify in NDHWC),
- ``BaseTransformerLayer``: joint space-time attention,
- ``TimesformerLayer``: divided space-time attention — the cls token
  attends globally while patch tokens attend within their frame (spatial)
  or their tube (temporal), implemented as two batched reshapes, no
  einops-over-heads gymnastics (transformer.py:100-142),
- ``Transformer`` / ``FactorizedTransformer`` meta-archs; the factorized
  encoder runs spatial layers per frame then temporal layers over per-frame
  cls tokens (transformer.py:284-397).

Input contract: (B, T, H, W, 3) channels-last video; output (B, dim) cls
feature for the head.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dist_tpu.models.base.models import (
    BACKBONE_REGISTRY,
    BRANCH_REGISTRY,
    STEM_REGISTRY,
)
from dist_tpu.models.precision import (
    compute_dtype,
    fp32_island,
    maybe_bf16_input,
)


def drop_path(rng, x, rate):
    """Stochastic depth on the batch dim (timm semantics)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask / keep


class DropPath(nn.Module):
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        if self.rate == 0.0 or not train:
            return x
        return drop_path(self.make_rng("dropout"), x, self.rate)


@STEM_REGISTRY.register()
class PatchEmbedStem(nn.Module):
    """(embedding_stem.py:17-57): per-frame patchify -> (B, T*N, C)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        p = self.cfg.VIDEO.BACKBONE.PATCH_SIZE
        dim = self.cfg.VIDEO.BACKBONE.NUM_FEATURES
        x = nn.Conv(dim, (1, p, p), strides=(1, p, p), padding="VALID",
                    dtype=compute_dtype(x), name="conv1")(x)
        b = x.shape[0]
        return x.reshape(b, -1, dim)


@STEM_REGISTRY.register()
class TubeletEmbeddingStem(nn.Module):
    """(embedding_stem.py:59-98): tubelet patchify -> (B, T/ts*N, C)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        p = self.cfg.VIDEO.BACKBONE.PATCH_SIZE
        ts = self.cfg.VIDEO.BACKBONE.get("TUBELET_SIZE", 2)
        dim = self.cfg.VIDEO.BACKBONE.NUM_FEATURES
        x = nn.Conv(dim, (ts, p, p), strides=(ts, p, p), padding="VALID",
                    dtype=compute_dtype(x), name="conv1")(x)
        b = x.shape[0]
        return x.reshape(b, -1, dim)


class _Attention(nn.Module):
    """qkv attention with optional grouped (divided) token axes."""

    dim: int
    num_heads: int
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, groups=None, group_size=None, train=True):
        """x (B, 1+M, C) with cls at 0. groups=None: joint attention.
        groups=g: patch tokens attend within their group of ``group_size``
        (cls attends to everything; group k/v get cls prepended) —
        the divided space-time scheme of transformer.py:100-142."""
        h = self.num_heads
        hd = self.dim // h
        dt = compute_dtype(x)
        init = nn.initializers.truncated_normal(0.02)
        qkv = nn.Dense(self.dim * 3, kernel_init=init, dtype=dt,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, hd)

        q, k, v = heads(q), heads(k), heads(v)
        scale = hd ** -0.5

        if groups is None:
            att = jnp.einsum("bihd,bjhd->bhij", q * scale, k,
                             preferred_element_type=jnp.float32)
            att = jax.nn.softmax(att, axis=-1).astype(v.dtype)
            if self.attn_dropout > 0 and train:
                att = nn.Dropout(self.attn_dropout, deterministic=False)(att)
            out = jnp.einsum("bhij,bjhd->bihd", att, v)
        else:
            b = x.shape[0]
            cls_q, q_ = q[:, :1], q[:, 1:]
            cls_k, k_ = k[:, :1], k[:, 1:]
            cls_v, v_ = v[:, :1], v[:, 1:]
            # cls attends to all tokens
            catt = jnp.einsum("bihd,bjhd->bhij", cls_q * scale, k,
                              preferred_element_type=jnp.float32)
            catt = jax.nn.softmax(catt, axis=-1).astype(v.dtype)
            cls_out = jnp.einsum("bhij,bjhd->bihd", catt, v)
            # patch tokens attend within groups, with cls k/v prepended
            g, n = groups, group_size
            q_ = q_.reshape(b * g, n, h, hd)
            k_ = k_.reshape(b * g, n, h, hd)
            v_ = v_.reshape(b * g, n, h, hd)
            ck = jnp.repeat(cls_k, g, axis=0)
            cv = jnp.repeat(cls_v, g, axis=0)
            k_ = jnp.concatenate([ck, k_], axis=1)
            v_ = jnp.concatenate([cv, v_], axis=1)
            att = jnp.einsum("bihd,bjhd->bhij", q_ * scale, k_,
                             preferred_element_type=jnp.float32)
            att = jax.nn.softmax(att, axis=-1).astype(v_.dtype)
            out_ = jnp.einsum("bhij,bjhd->bihd", att, v_)
            out_ = out_.reshape(b, g * n, h, hd)
            out = jnp.concatenate([cls_out, out_], axis=1)

        out = out.reshape(out.shape[0], out.shape[1], self.dim)
        out = nn.Dense(self.dim, kernel_init=init, dtype=dt, name="proj")(out)
        if self.ff_dropout > 0 and train:
            out = nn.Dropout(self.ff_dropout, deterministic=False)(out)
        return out


class _FeedForward(nn.Module):
    dim: int
    mult: int = 4
    ff_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        dt = compute_dtype(x)
        init = nn.initializers.truncated_normal(0.02)
        x = nn.Dense(self.dim * self.mult, kernel_init=init, dtype=dt,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        if self.ff_dropout > 0 and train:
            x = nn.Dropout(self.ff_dropout, deterministic=False)(x)
        x = nn.Dense(self.dim, kernel_init=init, dtype=dt, name="fc2")(x)
        if self.ff_dropout > 0 and train:
            x = nn.Dropout(self.ff_dropout, deterministic=False)(x)
        return x


@BRANCH_REGISTRY.register()
class BaseTransformerLayer(nn.Module):
    """Joint space-time block (transformer.py:145-175)."""

    cfg: Any
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        bb = self.cfg.VIDEO.BACKBONE
        dim, heads = bb.NUM_FEATURES, bb.NUM_HEADS
        dp = DropPath(self.drop_path_rate)
        # LayerNorms are fp32 islands; the attention/FFN run at the
        # activation dtype (bf16 under TRAIN.MIXED_PRECISION)
        x = x + dp(_Attention(dim, heads, bb.get("ATTN_DROPOUT", 0.0),
                              bb.get("FF_DROPOUT", 0.0), name="attn")(
            fp32_island(nn.LayerNorm(epsilon=1e-6, name="norm"), x),
            train=train), train)
        x = x + dp(_FeedForward(dim, bb.get("MLP_MULT", 4),
                                bb.get("FF_DROPOUT", 0.0), name="ffn")(
            fp32_island(nn.LayerNorm(epsilon=1e-6, name="norm_ffn"), x),
            train=train), train)
        return x


@BRANCH_REGISTRY.register()
class TimesformerLayer(nn.Module):
    """Divided space-time block (transformer.py:177-219): temporal attn
    (group = patch position, tokens = frames), spatial attn (group = frame,
    tokens = patches), then FFN."""

    cfg: Any
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train=True):
        cfg = self.cfg
        bb = cfg.VIDEO.BACKBONE
        dim, heads = bb.NUM_FEATURES, bb.NUM_HEADS
        f = cfg.DATA.NUM_INPUT_FRAMES // int(bb.get("TUBELET_SIZE", 1) or 1)
        # patches per frame from the ACTUAL token count — deriving it from
        # TRAIN_CROP_SIZE would mis-group tokens (or crash) whenever eval/
        # serving runs at a different resolution
        n = (x.shape[1] - 1) // f
        assert (x.shape[1] - 1) == f * n, (x.shape, f)
        dp = DropPath(self.drop_path_rate)

        # temporal: tokens laid out (f, n) -> group by patch position.
        # transpose (B, f*n, C) -> (B, n*f, C) so groups are contiguous.
        def to_tf(t):
            b, _, c = t.shape
            cls, rest = t[:, :1], t[:, 1:]
            rest = rest.reshape(b, f, n, c).transpose(0, 2, 1, 3).reshape(b, f * n, c)
            return jnp.concatenate([cls, rest], axis=1)

        def from_tf(t):
            b, _, c = t.shape
            cls, rest = t[:, :1], t[:, 1:]
            rest = rest.reshape(b, n, f, c).transpose(0, 2, 1, 3).reshape(b, f * n, c)
            return jnp.concatenate([cls, rest], axis=1)

        h = fp32_island(nn.LayerNorm(epsilon=1e-6, name="norm_temporal"), x)
        h = to_tf(h)
        h = _Attention(dim, heads, bb.get("ATTN_DROPOUT", 0.0),
                       bb.get("FF_DROPOUT", 0.0), name="attn_temporal")(
            h, groups=n, group_size=f, train=train)
        x = x + dp(from_tf(h), train)

        h = fp32_island(nn.LayerNorm(epsilon=1e-6, name="norm"), x)
        h = _Attention(dim, heads, bb.get("ATTN_DROPOUT", 0.0),
                       bb.get("FF_DROPOUT", 0.0), name="attn")(
            h, groups=f, group_size=n, train=train)
        x = x + dp(h, train)

        h = fp32_island(nn.LayerNorm(epsilon=1e-6, name="norm_ffn"), x)
        x = x + dp(_FeedForward(dim, 4, bb.get("FF_DROPOUT", 0.0),
                                name="ffn")(h, train=train), train)
        return x


@BACKBONE_REGISTRY.register(name="Transformer")
class VideoTransformer(nn.Module):
    """TimeSformer-style video ViT (transformer.py:221-282)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        cfg = self.cfg
        bb = cfg.VIDEO.BACKBONE
        if isinstance(x, dict):
            x = x["video"]
        x = maybe_bf16_input(cfg, x)
        dim = bb.NUM_FEATURES
        p = bb.PATCH_SIZE
        h, w = x.shape[2], x.shape[3]
        n_per_frame = (h // p) * (w // p)
        train_per_frame = (cfg.DATA.TRAIN_CROP_SIZE // p) ** 2

        stem_cls = STEM_REGISTRY.get_strict(bb.STEM.NAME)
        x = stem_cls(cfg, name="stem")(x, train)
        b, num_patches, _ = x.shape
        frames_tok = num_patches // n_per_frame

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, dim)).astype(x.dtype), x], axis=1)
        # pos embed is sized at the TRAIN resolution; evaluating at another
        # crop (e.g. hico++ ft_vit-s trains 112, evals 128) bilinear-resizes
        # each frame's spatial grid on the fly (same scheme as
        # FactorizedTransformer / reference transformer.py:370-390)
        pos = self.param("pos_embd", nn.initializers.truncated_normal(0.02),
                         (1, frames_tok * train_per_frame + 1, dim))
        if n_per_frame != train_per_frame:
            side0 = int(round(train_per_frame ** 0.5))
            side1 = int(round(n_per_frame ** 0.5))
            grid = pos[:, 1:].reshape(frames_tok, side0, side0, dim)
            grid = jax.image.resize(grid, (frames_tok, side1, side1, dim),
                                    "bilinear")
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, frames_tok * n_per_frame, dim)],
                axis=1)
        x = x + pos.astype(x.dtype)

        depth = bb.DEPTH
        dpr = [float(r) for r in jnp.linspace(0, bb.get("DROP_PATH", 0.0), depth)]
        branch_cls = BRANCH_REGISTRY.get_strict(bb.BRANCH.NAME)
        for i in range(depth):
            x = branch_cls(cfg, drop_path_rate=dpr[i], name=f"layer_{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        return x[:, 0]


@BACKBONE_REGISTRY.register()
class FactorizedTransformer(nn.Module):
    """ViViT factorized encoder (transformer.py:284-397): spatial layers per
    frame, then temporal layers over per-frame cls tokens. Test-time
    pos-embed super-resolution is handled by bilinear-resizing the spatial
    grid on the fly (transformer.py:370-390)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        cfg = self.cfg
        bb = cfg.VIDEO.BACKBONE
        if isinstance(x, dict):
            x = x["video"]
        x = maybe_bf16_input(cfg, x)
        dim = bb.NUM_FEATURES
        p = bb.PATCH_SIZE
        ts = bb.get("TUBELET_SIZE", 1)
        h, w = x.shape[2], x.shape[3]
        n_frames_tok = x.shape[1] // ts
        n_per_frame = (h // p) * (w // p)
        train_per_frame = (cfg.DATA.TRAIN_CROP_SIZE // p) ** 2

        stem_cls = STEM_REGISTRY.get_strict(bb.STEM.NAME)
        x = stem_cls(cfg, name="stem")(x, train)
        b = x.shape[0]
        x = x.reshape(b * n_frames_tok, n_per_frame, dim)

        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02), (1, 1, dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (x.shape[0], 1, dim)).astype(x.dtype), x],
            axis=1)

        pos = self.param("pos_embd", nn.initializers.truncated_normal(0.02),
                         (1, train_per_frame + 1, dim))
        if n_per_frame != train_per_frame:
            # test-time spatial super-resolution of the pos embed
            side0 = int(round(train_per_frame ** 0.5))
            side1 = int(round(n_per_frame ** 0.5))
            grid = pos[:, 1:].reshape(1, side0, side0, dim)
            grid = jax.image.resize(grid, (1, side1, side1, dim), "bilinear")
            pos = jnp.concatenate(
                [pos[:, :1], grid.reshape(1, side1 * side1, dim)], axis=1)
        x = x + pos.astype(x.dtype)

        depth, depth_temp = bb.DEPTH, bb.get("DEPTH_TEMP", 4)
        dpr = [float(r) for r in
               jnp.linspace(0, bb.get("DROP_PATH", 0.0), depth + depth_temp)]
        branch_cls = BRANCH_REGISTRY.get_strict(bb.BRANCH.NAME)
        for i in range(depth):
            x = branch_cls(cfg, drop_path_rate=dpr[i], name=f"layer_{i}")(x, train)
        # island (not a plain LN) so the temporal layers below keep the
        # bf16 activation dtype under mixed precision
        x = fp32_island(nn.LayerNorm(epsilon=1e-6, name="norm"), x)[:, 0]

        x = x.reshape(b, n_frames_tok, dim)
        cls_out = self.param("cls_token_out", nn.initializers.truncated_normal(0.02),
                             (1, 1, dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_out, (b, 1, dim)).astype(x.dtype), x],
            axis=1)
        temp = self.param("temp_embd", nn.initializers.truncated_normal(0.02),
                          (1, n_frames_tok + 1, dim))
        x = x + temp.astype(x.dtype)
        for i in range(depth_temp):
            x = branch_cls(cfg, drop_path_rate=dpr[depth + i],
                           name=f"layer_temporal_{i}")(x, train)
        x = nn.LayerNorm(epsilon=1e-6, name="norm_out")(x)
        return x[:, 0]
