"""Contrastive / HiCo projection + prediction heads
(reference models/module_zoo/heads/contrastive_head.py:14-218)."""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dist_tpu.models.base.models import HEAD_REGISTRY
from dist_tpu.models.base.bn import bn_running


class ProjectionMLP(nn.Module):
    """SimCLR-style 3-layer projection MLP with optional BNs and final L2
    normalization (contrastive_head.py:43-98)."""

    mid_dim: int
    out_dim: int
    with_bn: bool = False
    final_bn: bool = False
    normalize: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        x = nn.Dense(self.mid_dim, name="linear_a")(x)
        if self.with_bn:
            x = nn.BatchNorm(use_running_average=bn_running(train), epsilon=1e-3,
                             name="linear_a_bn")(x)
        x = nn.relu(x)
        x = nn.Dense(self.mid_dim, name="linear_b")(x)
        if self.with_bn:
            x = nn.BatchNorm(use_running_average=bn_running(train), epsilon=1e-3,
                             name="linear_b_bn")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, name="logits_out_b2")(x)
        if self.final_bn:
            x = nn.BatchNorm(use_running_average=bn_running(train), epsilon=1e-3,
                             name="final_bn")(x)
        if self.normalize:
            x = x / jnp.maximum(
                jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True),
                1e-6).astype(x.dtype)
        return x


def _pool(x):
    if isinstance(x, dict):
        x = x.get("features", x)
    if hasattr(x, "ndim") and x.ndim == 5:
        x = x.mean(axis=(1, 2, 3))
    return x


@HEAD_REGISTRY.register()
class ContrastiveHead(nn.Module):
    """Pool + projection MLP (contrastive_head.py:14-42).
    Returns (pooled_features, normalized_embeddings)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        c = self.cfg.PRETRAIN.CONTRASTIVE
        x = _pool(x)
        emb = ProjectionMLP(
            mid_dim=int(c.HEAD_MID_DIM), out_dim=int(c.HEAD_OUT_DIM),
            with_bn=bool(c.get("HEAD_BN", False)),
            final_bn=bool(c.get("FINAL_BN", False)), name="mlp",
        )(x, train)
        return x, emb


class TopicalPredictor(nn.Module):
    """Pairwise same-topic predictor (contrastive_head.py:129-157): an MLP
    embedding followed by a symmetric pairwise MLP scoring map (N, N, 2)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        c = self.cfg.PRETRAIN.CONTRASTIVE
        z = ProjectionMLP(
            mid_dim=int(c.HEAD_MID_DIM), out_dim=int(c.HEAD_OUT_DIM),
            with_bn=bool(c.get("HEAD_BN", False)), name="mlp",
        )(x, train)
        n, d = z.shape
        a = jnp.broadcast_to(z[:, None, :], (n, n, d))
        b = jnp.broadcast_to(z[None, :, :], (n, n, d))
        pair1 = jnp.concatenate([a, b], axis=-1)
        pair2 = jnp.concatenate([b, a], axis=-1)
        # one scorer shared by both orderings (contrastive_head.py:154-156)
        mlp = _PairScorer(name="topical_predictor")
        return jnp.concatenate([mlp(pair1), mlp(pair2)], axis=-1)


class _PairScorer(nn.Module):
    @nn.compact
    def __call__(self, p):
        h = nn.relu(nn.Dense(256, name="fc1")(p))
        return nn.Dense(1, name="fc2")(h)


class TopicalPredictorPlusPlus(nn.Module):
    """HiCo++ topical predictor (contrastive_head.py:189-217): embeddings of
    ADJACENT VIEW PAIRS are averaged before the symmetric pairwise map, so
    the topical map scores (N/2, N/2) pair groups."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        c = self.cfg.PRETRAIN.CONTRASTIVE
        z = ProjectionMLP(
            mid_dim=int(c.HEAD_MID_DIM), out_dim=int(c.HEAD_OUT_DIM),
            with_bn=bool(c.get("HEAD_BN", False)), name="mlp",
        )(x, train)
        n, d = z.shape
        z = z.reshape(n // 2, 2, d).mean(axis=1)
        m = n // 2
        a = jnp.broadcast_to(z[:, None, :], (m, m, d))
        b = jnp.broadcast_to(z[None, :, :], (m, m, d))
        pair1 = jnp.concatenate([a, b], axis=-1)
        pair2 = jnp.concatenate([b, a], axis=-1)
        mlp = _PairScorer(name="topical_predictor")
        return jnp.concatenate([mlp(pair1), mlp(pair2)], axis=-1)


@HEAD_REGISTRY.register()
class ContrastiveHeadTopicPredPlusPlus(nn.Module):
    """HiCo++ head (contrastive_head.py:161-186): VCL projection + the
    pair-averaged TCL topical map."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        x = _pool(x)
        c = self.cfg.PRETRAIN.CONTRASTIVE
        emb = ProjectionMLP(
            mid_dim=int(c.HEAD_MID_DIM), out_dim=int(c.HEAD_OUT_DIM),
            with_bn=bool(c.get("HEAD_BN", False)), name="mlp_vcl",
        )(x, train)
        tcl = TopicalPredictorPlusPlus(self.cfg, name="mlp_tcl")(x, train)
        return tcl, emb


@HEAD_REGISTRY.register()
class ContrastiveHeadTopicPred(nn.Module):
    """VCL projection + TCL topical map (contrastive_head.py:89-127).
    Returns (topical_map_preds, vcl_embeddings)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        x = _pool(x)
        c = self.cfg.PRETRAIN.CONTRASTIVE
        emb = ProjectionMLP(
            mid_dim=int(c.HEAD_MID_DIM), out_dim=int(c.HEAD_OUT_DIM),
            with_bn=bool(c.get("HEAD_BN", False)), name="mlp_vcl",
        )(x, train)
        tcl = TopicalPredictor(self.cfg, name="mlp_tcl")(x, train)
        return tcl, emb
