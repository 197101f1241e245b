"""TAda branch: temporally-adaptive convolutions, TPU-native.

Rebuild of ``models/module_zoo/branches/tada_branch.py:15-230``.

The reference's ``TAdaConv2d`` materializes a per-(batch, frame) conv
weight ``W_t = alpha_t * W_b`` (calibrating the **input-channel** axis) and
runs a grouped conv with ``groups = b * t`` (tada_branch.py:253-262) — a
CUDA-friendly trick that is hostile to the MXU (thousands of tiny groups).

On TPU we use the algebraic identity

    conv(x, W  * diag(alpha)_{c_in}) == conv(x * alpha, W)

so TAdaConv2d becomes ONE fused elementwise scale (VPU, fuses into the
preceding BN/ReLU) followed by ONE large batched spatial conv (MXU) — no
dynamic weights, no groups, no reshape through a degenerate batch of 1.
"""

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dist_tpu.models.base.models import BRANCH_REGISTRY
from dist_tpu.models.precision import compute_dtype, fp32_island
from dist_tpu.models.base.bn import bn_running


class RouteFuncMLP(nn.Module):
    """Calibration-weight generator (tada_branch.py:15-63): frame-wise GAP
    (+ global context), two temporal 1D convs, output 1 + residual."""

    c_in: int
    ratio: int
    kernels: Tuple[int, int]
    bn_eps: float = 1e-5
    bn_mmt: float = 0.1

    @nn.compact
    def __call__(self, x, train=True):
        # x (B, T, H, W, C) -> alpha (B, T, 1, 1, C); the tiny calibration
        # MLP runs fp32 regardless of the activation dtype (the pooled
        # means accumulate in fp32, the convs promote with fp32 params)
        frame = x.mean(axis=(2, 3), keepdims=True,
                       dtype=jnp.float32)                   # (B,T,1,1,C)
        glob = x.mean(axis=(1, 2, 3), keepdims=True,
                      dtype=jnp.float32)                    # (B,1,1,1,C)
        g = nn.Conv(self.c_in, (1, 1, 1), name="g")(glob)
        h = nn.Conv(self.c_in // self.ratio, (self.kernels[0], 1, 1),
                    padding=((self.kernels[0] // 2,) * 2, (0, 0), (0, 0)),
                    name="a")(frame + g)
        h = nn.BatchNorm(use_running_average=bn_running(train),
                         momentum=1.0 - self.bn_mmt, epsilon=self.bn_eps,
                         name="bn")(h)
        h = nn.relu(h)
        # zero-init so alpha starts at exactly 1 (tada_branch.py:53-55)
        h = nn.Conv(self.c_in, (self.kernels[1], 1, 1),
                    padding=((self.kernels[1] // 2,) * 2, (0, 0), (0, 0)),
                    use_bias=False, kernel_init=nn.initializers.zeros,
                    name="b")(h)
        return h + 1.0


class TAdaConv2d(nn.Module):
    """Temporally-adaptive 2D conv on (B, T, H, W, C): scale the input by
    the per-frame calibration, then one shared spatial conv."""

    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, alpha):
        # the calibration generator runs fp32; cast its output so the
        # scale doesn't promote a bf16 activation back to fp32
        x = x * alpha.astype(x.dtype)  # (B,T,H,W,C) * (B,T,1,1,C)
        pad = tuple((k // 2, k // 2) for k in self.kernel)
        return nn.Conv(self.features, (1,) + self.kernel,
                       strides=(1,) + self.stride,
                       padding=((0, 0),) + pad, use_bias=False,
                       dtype=compute_dtype(x), name="conv")(x)


@BRANCH_REGISTRY.register()
class TAdaConvBlockAvgPool(nn.Module):
    """TAda bottleneck with avg-pool aggregation (tada_branch.py:147-230)."""

    spec: Any

    @nn.compact
    def __call__(self, x, train=True):
        s = self.spec
        cfg_branch = s.get("branch_cfg")
        route_r = cfg_branch.get("ROUTE_FUNC_R", 4) if cfg_branch else 4
        route_k = tuple(cfg_branch.get("ROUTE_FUNC_K", [3, 3])) if cfg_branch else (3, 3)
        pool_k = tuple(cfg_branch.get("POOL_K", [3, 1, 1])) if cfg_branch else (3, 1, 1)

        exp = s["num_filters"] // s["expansion_ratio"]
        k, st = s["kernel_size"], s["stride"]

        def bn(name, zero=False):
            return nn.BatchNorm(
                use_running_average=bn_running(train), momentum=0.9, epsilon=1e-5,
                scale_init=nn.initializers.zeros if zero else nn.initializers.ones,
                bias_init=nn.initializers.zeros, name=name)

        x = nn.Conv(exp, (1, 1, 1), use_bias=False, dtype=compute_dtype(x),
                    name="a")(x)
        x = nn.relu(fp32_island(bn("a_bn"), x))

        alpha = RouteFuncMLP(exp, route_r, route_k, name="b_rf")(x, train)
        h = TAdaConv2d(exp, (k[1], k[2]), (st[1], st[2]), name="b")(x, alpha)
        # the avg-pool aggregation runs on the TAdaConv OUTPUT
        # (tada_branch.py:225-226: x is reassigned before pooling)
        pooled = nn.avg_pool(
            h, pool_k, strides=(1, 1, 1),
            padding=tuple((kk // 2, kk // 2) for kk in pool_k))
        x = (fp32_island(bn("b_bn"), h)
             + fp32_island(bn("b_avgpool_bn", zero=True), pooled))
        x = nn.relu(x)

        x = nn.Conv(s["num_filters"], (1, 1, 1), use_bias=False,
                    dtype=compute_dtype(x), name="c")(x)
        return fp32_island(bn("c_bn"), x)
