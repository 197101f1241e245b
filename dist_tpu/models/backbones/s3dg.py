"""I3D / S3D-G Inception backbone (reference models/base/backbone.py:90-178,
branches/s3dg_branch.py:13-150).

Inception-v1 channel plan with 3D convs; ``STConv3d`` factorizes each 3x3x3
into spatial (1,3,3) + temporal (3,1,1) convs (S3D), and ``SelfGating``
applies the S3D-G feature gate. NDHWC throughout.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from dist_tpu.models.base.models import BACKBONE_REGISTRY, BRANCH_REGISTRY
from dist_tpu.models.precision import (
    compute_dtype,
    fp32_island,
    maybe_bf16_input,
)
from dist_tpu.models.base.bn import bn_running


class InceptionBaseConv3D(nn.Module):
    """conv-BN-relu (base_blocks.py:218-238)."""

    features: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        k, s = self.kernel, self.stride
        pad = tuple(((kk // 2, kk // 2)) for kk in
                    ((k, k, k) if isinstance(k, int) else k))
        x = nn.Conv(self.features, (k, k, k) if isinstance(k, int) else k,
                    strides=(s, s, s) if isinstance(s, int) else s,
                    padding=pad, use_bias=False, dtype=compute_dtype(x),
                    name="conv")(x)
        x = fp32_island(nn.BatchNorm(use_running_average=bn_running(train),
                                     name="bn"), x)
        return nn.relu(x)


@BRANCH_REGISTRY.register()
class STConv3d(nn.Module):
    """Separable spatio-temporal conv (s3dg_branch.py:104-150):
    (1,k,k) spatial then (k,1,1) temporal, each with BN+relu."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=True):
        k, s = self.kernel, self.stride
        x = nn.Conv(self.features, (1, k, k), strides=(1, s, s),
                    padding=((0, 0), (k // 2, k // 2), (k // 2, k // 2)),
                    use_bias=False, dtype=compute_dtype(x), name="conv")(x)
        x = fp32_island(nn.BatchNorm(use_running_average=bn_running(train),
                                     name="bn"), x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (k, 1, 1), strides=(s, 1, 1),
                    padding=((k // 2, k // 2), (0, 0), (0, 0)),
                    use_bias=False, dtype=compute_dtype(x), name="conv2")(x)
        x = fp32_island(nn.BatchNorm(use_running_average=bn_running(train),
                                     name="bn2"), x)
        return nn.relu(x)


class SelfGating(nn.Module):
    """S3D-G feature gate (s3dg_branch.py:92-102)."""

    @nn.compact
    def __call__(self, x):
        avg = x.mean(axis=(1, 2, 3), dtype=jnp.float32)
        w = jax.nn.sigmoid(nn.Dense(x.shape[-1], name="fc")(avg))
        return x * w[:, None, None, None, :].astype(x.dtype)


class InceptionBlock3D(nn.Module):
    """4-branch inception block (backbone.py:186-252 equivalent)."""

    out_planes: Sequence[int]
    gating: bool = True
    use_st: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        o0, o1a, o1b, o2a, o2b, o3 = self.out_planes
        conv3 = STConv3d if self.use_st else InceptionBaseConv3D

        b0 = InceptionBaseConv3D(o0, 1, name="branch0")(x, train)
        b1 = InceptionBaseConv3D(o1a, 1, name="branch1_0")(x, train)
        b1 = conv3(o1b, 3, name="branch1_1")(b1, train)
        b2 = InceptionBaseConv3D(o2a, 1, name="branch2_0")(x, train)
        b2 = conv3(o2b, 3, name="branch2_1")(b2, train)
        b3 = nn.max_pool(x, (3, 3, 3), strides=(1, 1, 1),
                         padding=((1, 1), (1, 1), (1, 1)))
        b3 = InceptionBaseConv3D(o3, 1, name="branch3_1")(b3, train)
        if self.gating:
            b0 = SelfGating(name="gating_b0")(b0)
            b1 = SelfGating(name="gating_b1")(b1)
            b2 = SelfGating(name="gating_b2")(b2)
            b3 = SelfGating(name="gating_b3")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


_INCEPTION_PLAN = {
    "Mixed_3b": (192, [64, 96, 128, 16, 32, 32]),
    "Mixed_3c": (256, [128, 128, 192, 32, 96, 64]),
    "Mixed_4b": (480, [192, 96, 208, 16, 48, 64]),
    "Mixed_4c": (512, [160, 112, 224, 24, 64, 64]),
    "Mixed_4d": (512, [128, 128, 256, 24, 64, 64]),
    "Mixed_4e": (512, [112, 144, 288, 32, 64, 64]),
    "Mixed_4f": (528, [256, 160, 320, 32, 128, 128]),
    "Mixed_5b": (832, [256, 160, 320, 32, 128, 128]),
    "Mixed_5c": (832, [384, 192, 384, 48, 128, 128]),
}


@BACKBONE_REGISTRY.register()
class Inception3D(nn.Module):
    """S3D-G / I3D backbone (backbone.py:90-178). Output (B,t,h,w,1024)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        cfg = self.cfg
        if isinstance(x, dict):
            x = x["video"]
        x = maybe_bf16_input(cfg, x)
        branch = cfg.VIDEO.BACKBONE.BRANCH.NAME
        use_st = branch == "STConv3d"
        gating = bool(cfg.VIDEO.BACKBONE.BRANCH.get("GATING", True))
        conv3 = STConv3d if use_st else InceptionBaseConv3D

        x = conv3(64, 7, 2, name="Conv_1a")(x, train)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        x = InceptionBaseConv3D(64, 1, name="Conv_2b")(x, train)
        x = conv3(192, 3, name="Conv_2c")(x, train)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        x = InceptionBlock3D(_INCEPTION_PLAN["Mixed_3b"][1], gating, use_st,
                             name="Mixed_3b")(x, train)
        x = InceptionBlock3D(_INCEPTION_PLAN["Mixed_3c"][1], gating, use_st,
                             name="Mixed_3c")(x, train)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                        padding=((1, 1), (1, 1), (1, 1)))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionBlock3D(_INCEPTION_PLAN[name][1], gating, use_st,
                                 name=name)(x, train)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="VALID")
        x = InceptionBlock3D(_INCEPTION_PLAN["Mixed_5b"][1], gating, use_st,
                             name="Mixed_5b")(x, train)
        x = InceptionBlock3D(_INCEPTION_PLAN["Mixed_5c"][1], gating, use_st,
                             name="Mixed_5c")(x, train)
        assert all(s > 0 for s in x.shape), (
            f"S3D-G collapsed a dimension to zero ({x.shape}) — the input "
            f"clip is too short/small for the temporal/spatial downsampling "
            f"(needs >= 8 frames); a zero-sized pool yields NaN features")
        return x
