"""3D-ResNet meta-architecture + branch zoo (flax, channels-last).

Rebuild of the reference's conv family:

- ``ResNet3D`` meta-arch: stem + 4 res-stages with a registry-pluggable
  branch per block (``models/base/backbone.py:29-88``),
- per-block shape derivation (``update_3d_conv_params``,
  ``models/utils/params.py:6-64``),
- branches: ``R2Plus1DBranch`` (``branches/r2plus1d_branch.py:14-158``),
  ``R2D3DBranch`` (``branches/r2d3d_branch.py:13-108``), ``CSNBranch``
  (``branches/csn_branch.py:13-74``), ``SimpleBlockBranch`` /
  ``BottleneckBranch`` vanilla 3D convs, ``TAdaConvBlockAvgPool``
  (``branches/tada_branch.py:15-230``), ``NonLocal``
  (``branches/non_local.py:12-75``),
- stems: ``DownSampleStem`` / ``Base2DStem`` / ``Base3DStem`` /
  ``R2Plus1DStem`` (``stems/``, ``models/base/base_blocks.py:240-365``).

Layout: activations are (B, T, H, W, C) NDHWC — XLA's native TPU conv
layout; BatchNorm runs on the channel axis with stats in the
``batch_stats`` collection (cross-device sync happens automatically when
the train step is compiled over the mesh with a batch sharding: XLA turns
the batch-mean reduction into a psum — the reference needed explicit
SyncBN conversion, models/base/builder.py:62-66).
"""

import math
from typing import Any, Tuple

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
from dist_tpu.models.base.bn import bn_running

_N_CONV_RESNET = {
    10: (1, 1, 1, 1),
    16: (2, 2, 2, 1),
    18: (2, 2, 2, 2),
    26: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


def block_shapes(cfg, stage_id, block_id):
    """Per-block (dim_in, num_filters, kernel, stride, transformation)
    (reference models/utils/params.py:6-64)."""
    bb = cfg.VIDEO.BACKBONE
    if block_id == 0:
        dim_in = bb.NUM_FILTERS[stage_id - 1]
        downsampling = bb.DOWNSAMPLING[stage_id]
        downsampling_temporal = bb.DOWNSAMPLING_TEMPORAL[stage_id]
    else:
        dim_in = bb.NUM_FILTERS[stage_id]
        downsampling = False
        downsampling_temporal = False
    num_filters = bb.NUM_FILTERS[stage_id]
    kernel_size = tuple(bb.KERNEL_SIZE[stage_id])
    if downsampling:
        stride = (2, 2, 2) if downsampling_temporal else (1, 2, 2)
    else:
        stride = (1, 1, 1)
    depth = bb.DEPTH
    transformation = ("bottleneck" if isinstance(depth, str) or depth > 34
                      else "simple_block")
    return dict(dim_in=dim_in, num_filters=num_filters,
                kernel_size=kernel_size, stride=stride,
                transformation=transformation,
                expansion_ratio=bb.get("EXPANSION_RATIO", 2),
                branch_cfg=bb.BRANCH)


class ConvBN(nn.Module):
    """conv3d + BN (+ relu) on NDHWC."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    relu: bool = True
    use_bn: bool = True
    bn_eps: float = 1e-5
    bn_mmt: float = 0.1
    groups: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        pad = tuple((k // 2, k // 2) for k in self.kernel)
        # bf16 activations select bf16 MXU compute (params stay fp32);
        # BN is an fp32 island (models/precision.py)
        x = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=pad, use_bias=not self.use_bn,
                    feature_group_count=self.groups, dtype=compute_dtype(x),
                    kernel_init=nn.initializers.he_normal(), name="conv")(x)
        if self.use_bn:
            x = fp32_island(
                nn.BatchNorm(use_running_average=bn_running(train),
                             momentum=1.0 - self.bn_mmt, epsilon=self.bn_eps,
                             name="bn"), x)
        if self.relu:
            x = nn.relu(x)
        return x


def _r2plus1d_mid(k, din, dout):
    """(2+1)D factorization mid-width (r2plus1d_branch.py:30-33)."""
    return int(math.floor((k[0] * k[1] * k[2] * din * dout)
                          / (k[1] * k[2] * din + k[0] * dout)))


@BRANCH_REGISTRY.register()
class R2Plus1DBranch(nn.Module):
    """(2+1)D factorized conv branch (r2plus1d_branch.py:14-158)."""

    spec: Any

    @nn.compact
    def __call__(self, x, train=True):
        s = self.spec
        k, st = s["kernel_size"], s["stride"]
        if s["transformation"] == "simple_block":
            mid = _r2plus1d_mid(k, s["dim_in"], s["num_filters"])
            x = ConvBN(mid, (1, k[1], k[2]), (1, st[1], st[2]), name="a1")(x, train)
            x = ConvBN(s["num_filters"], (k[0], 1, 1), (st[0], 1, 1), name="a2")(x, train)
            mid = _r2plus1d_mid(k, s["num_filters"], s["num_filters"])
            x = ConvBN(mid, (1, k[1], k[2]), name="b1")(x, train)
            x = ConvBN(s["num_filters"], (k[0], 1, 1), relu=False, name="b2")(x, train)
            return x
        exp = s["num_filters"] // s["expansion_ratio"]
        x = ConvBN(exp, (1, 1, 1), name="a")(x, train)
        x = ConvBN(exp, (1, k[1], k[2]), (1, st[1], st[2]), name="b1")(x, train)
        x = ConvBN(exp, (k[0], 1, 1), (st[0], 1, 1), name="b2")(x, train)
        x = ConvBN(s["num_filters"], (1, 1, 1), relu=False, name="c")(x, train)
        return x


@BRANCH_REGISTRY.register()
class R2D3DBranch(nn.Module):
    """2D-in-3D branch: spatial-only convs at the configured kernel
    (r2d3d_branch.py:13-108)."""

    spec: Any

    @nn.compact
    def __call__(self, x, train=True):
        s = self.spec
        k, st = s["kernel_size"], s["stride"]
        if s["transformation"] == "simple_block":
            x = ConvBN(s["num_filters"], k, st, name="a")(x, train)
            x = ConvBN(s["num_filters"], k, relu=False, name="b")(x, train)
            return x
        exp = s["num_filters"] // s["expansion_ratio"]
        x = ConvBN(exp, (1, 1, 1), name="a")(x, train)
        x = ConvBN(exp, k, st, name="b")(x, train)
        x = ConvBN(s["num_filters"], (1, 1, 1), relu=False, name="c")(x, train)
        return x


@BRANCH_REGISTRY.register()
class CSNBranch(nn.Module):
    """Channel-separated bottleneck: depthwise 3x3x3 (csn_branch.py:13-74)."""

    spec: Any

    @nn.compact
    def __call__(self, x, train=True):
        s = self.spec
        k, st = s["kernel_size"], s["stride"]
        exp = s["num_filters"] // s["expansion_ratio"]
        x = ConvBN(exp, (1, 1, 1), name="a")(x, train)
        x = ConvBN(exp, k, st, groups=exp, name="b")(x, train)
        x = ConvBN(s["num_filters"], (1, 1, 1), relu=False, name="c")(x, train)
        return x


@BRANCH_REGISTRY.register()
class SimpleBranch(nn.Module):
    """Vanilla 3D conv branch (slowfast_branch.py:14-100 style)."""

    spec: Any

    @nn.compact
    def __call__(self, x, train=True):
        s = self.spec
        k, st = s["kernel_size"], s["stride"]
        if s["transformation"] == "simple_block":
            x = ConvBN(s["num_filters"], k, st, name="a")(x, train)
            x = ConvBN(s["num_filters"], k, relu=False, name="b")(x, train)
            return x
        exp = s["num_filters"] // s["expansion_ratio"]
        x = ConvBN(exp, (k[0], 1, 1), name="a")(x, train)
        x = ConvBN(exp, (1, k[1], k[2]), (1, st[1], st[2]), name="b")(x, train)
        x = ConvBN(s["num_filters"], (1, 1, 1), relu=False, name="c")(x, train)
        return x


@BRANCH_REGISTRY.register()
class NonLocal(nn.Module):
    """Non-local block: embedded-gaussian attention over T*H*W
    (non_local.py:12-75)."""

    spec: Any

    @nn.compact
    def __call__(self, x, train=True):
        dim = x.shape[-1]
        inner = dim // 2
        dt = compute_dtype(x)
        theta = nn.Conv(inner, (1, 1, 1), dtype=dt, name="theta")(x)
        phi = nn.Conv(inner, (1, 1, 1), dtype=dt, name="phi")(x)
        g = nn.Conv(inner, (1, 1, 1), dtype=dt, name="g")(x)
        b = x.shape[0]
        q = theta.reshape(b, -1, inner)
        k = phi.reshape(b, -1, inner)
        v = g.reshape(b, -1, inner)
        att = jnp.einsum("bic,bjc->bij", q, k,
                         preferred_element_type=jnp.float32)
        att = att * (inner ** -0.5)  # reference non_local.py:68
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bij,bjc->bic", att.astype(v.dtype), v)
        out = out.reshape(x.shape[:-1] + (inner,))
        out = nn.Conv(dim, (1, 1, 1), dtype=dt, name="out")(out)
        out = fp32_island(
            nn.BatchNorm(use_running_average=bn_running(train),
                         scale_init=nn.initializers.zeros, name="bn"), out)
        return x + out


class Base3DBlock(nn.Module):
    """Residual block: shortcut (+1x1x1 conv-BN when shape changes) +
    registry branch (base_blocks.py:103-152)."""

    cfg: Any
    stage_id: int
    block_id: int

    @nn.compact
    def __call__(self, x, train=True):
        spec = block_shapes(self.cfg, self.stage_id, self.block_id)
        branch_cls = BRANCH_REGISTRY.get_strict(
            self.cfg.VIDEO.BACKBONE.BRANCH.NAME)
        shortcut = x
        if spec["dim_in"] != spec["num_filters"] or spec["stride"] != (1, 1, 1):
            shortcut = ConvBN(spec["num_filters"], (1, 1, 1), spec["stride"],
                              relu=False, name="short_cut")(x, train)
        x = branch_cls(spec, name="conv_branch")(x, train)
        return nn.relu(shortcut + x)


class Base3DResStage(nn.Module):
    """(base_blocks.py:155-215)"""

    cfg: Any
    num_blocks: int
    stage_id: int

    @nn.compact
    def __call__(self, x, train=True):
        for i in range(self.num_blocks):
            x = Base3DBlock(self.cfg, self.stage_id, i, name=f"res_{i + 1}")(x, train)
        nl = self.cfg.VIDEO.BACKBONE.NONLOCAL
        if nl.ENABLE and (self.stage_id + 1) in list(nl.STAGES):
            x = NonLocal(None, name="nonlocal")(x, train)
        return x


# ----------------------------- stems -----------------------------


@STEM_REGISTRY.register()
class Base2DStem(nn.Module):
    """Spatial-only stem (base_blocks.py:240-300)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        bb = self.cfg.VIDEO.BACKBONE
        k = tuple(bb.KERNEL_SIZE[0])
        f = bb.NUM_FILTERS[0]
        down = bb.DOWNSAMPLING[0]
        return ConvBN(f, (1, k[1], k[2]),
                      (1, 2, 2) if down else (1, 1, 1), name="a")(x, train)


@STEM_REGISTRY.register()
class Base3DStem(nn.Module):
    """(base_blocks.py:300-365)"""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        bb = self.cfg.VIDEO.BACKBONE
        k = tuple(bb.KERNEL_SIZE[0])
        f = bb.NUM_FILTERS[0]
        down = bb.DOWNSAMPLING[0]
        down_t = bb.DOWNSAMPLING_TEMPORAL[0]
        stride = ((2, 2, 2) if down_t else (1, 2, 2)) if down else (1, 1, 1)
        return ConvBN(f, k, stride, name="a")(x, train)


@STEM_REGISTRY.register()
class DownSampleStem(nn.Module):
    """Base3DStem + maxpool (stems/downsample_stem.py:13-43)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        x = Base3DStem(self.cfg, name="stem")(x, train)
        return nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                           padding=((0, 0), (1, 1), (1, 1)))


@STEM_REGISTRY.register()
class R2Plus1DStem(nn.Module):
    """(2+1)D stem (stems/r2plus1d_stem.py:14-68)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        bb = self.cfg.VIDEO.BACKBONE
        k = tuple(bb.KERNEL_SIZE[0])
        f = bb.NUM_FILTERS[0]
        down = bb.DOWNSAMPLING[0]
        down_t = bb.DOWNSAMPLING_TEMPORAL[0]
        stride = ((2, 2, 2) if down_t else (1, 2, 2)) if down else (1, 1, 1)
        mid = _r2plus1d_mid(k, x.shape[-1], f)
        x = ConvBN(mid, (1, k[1], k[2]), (1, stride[1], stride[2]), name="a1")(x, train)
        x = ConvBN(f, (k[0], 1, 1), (stride[0], 1, 1), name="a2")(x, train)
        return x


# ----------------------------- meta-arch -----------------------------


@BACKBONE_REGISTRY.register()
class ResNet3D(nn.Module):
    """(backbone.py:29-88). Input (B, T, H, W, C); output feature map
    (B, t, h, w, C_out)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        cfg = self.cfg
        if isinstance(x, dict):
            x = x["video"]
        # TRAIN.MIXED_PRECISION: cast once; every ConvBN below follows the
        # activation dtype (reference fp16 semantics, clip.py:540-561)
        x = maybe_bf16_input(cfg, x)
        stem_cls = STEM_REGISTRY.get_strict(cfg.VIDEO.BACKBONE.STEM.NAME)
        x = stem_cls(cfg, name="conv1")(x, train)
        blocks = _N_CONV_RESNET[cfg.VIDEO.BACKBONE.DEPTH]
        for stage_id, n in enumerate(blocks, start=1):
            x = Base3DResStage(cfg, n, stage_id, name=f"conv{stage_id + 1}")(x, train)
        return x
