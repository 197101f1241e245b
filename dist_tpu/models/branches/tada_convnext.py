"""TAda-ConvNeXt blocks + ConvNeXt video meta-arch
(reference models/module_zoo/branches/tada_convnext.py:10-482).

Block = temporally-adaptive depthwise 7x7 conv (cal_dim="cout": the
calibration scales OUTPUT channels, so on TPU it is a post-scale —
``conv(x, diag(a)_cout W) == a * conv(x, W)`` — no dynamic weights), an
optional temporal avg-pool branch through a zero-init LayerNorm, then the
ConvNeXt MLP with layer scale and stochastic depth.

The reference ships these blocks and the ``tada_convnext_tiny`` config but
no ConvNeXt meta-arch class (META_ARCH: ConvNeXt resolves to nothing
there); :class:`ConvNeXt` here completes the family with the standard
4-stage ConvNeXt layout (per-stage downsample convs, 4x4 patchify stem
with optional temporal kernel + central init).
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dist_tpu.models.base.models import BACKBONE_REGISTRY, BRANCH_REGISTRY
from dist_tpu.models.backbones.video_transformer import DropPath
from dist_tpu.models.precision import (
    compute_dtype,
    fp32_island,
    maybe_bf16_input,
)
from dist_tpu.models.base.bn import bn_running


class RouteFuncNeXt(nn.Module):
    """Calibration generator; 'normal' uses BN (tada_convnext.py:246-309),
    'normal_lngelu' LayerNorm+GELU (311-378). Emits (weight_cal, bias_cal)
    when ``with_bias_cal``."""

    c_in: int
    ratio: int
    kernels: Any
    route_type: str = "normal"
    with_bias_cal: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        # x (B, T, H, W, C) -> (B, T, 1, 1, C); the calibration generator
        # runs fp32 regardless of the activation dtype (fp32-accumulated
        # means; the convs promote with their fp32 params)
        frame = x.mean(axis=(2, 3), keepdims=True, dtype=jnp.float32)
        glob = x.mean(axis=(1, 2, 3), keepdims=True, dtype=jnp.float32)
        g = nn.Conv(self.c_in, (1, 1, 1), name="g")(glob)
        h = nn.Conv(self.c_in // self.ratio, (self.kernels[0], 1, 1),
                    padding=((self.kernels[0] // 2,) * 2, (0, 0), (0, 0)),
                    name="a")(frame + g)
        if self.route_type == "normal":
            h = nn.BatchNorm(use_running_average=bn_running(train), name="bn")(h)
            h = nn.relu(h)
        else:
            h = nn.LayerNorm(epsilon=1e-6, name="ln")(h)
            h = nn.gelu(h, approximate=False)
        kwargs = dict(padding=((self.kernels[1] // 2,) * 2, (0, 0), (0, 0)),
                      use_bias=False, kernel_init=nn.initializers.zeros)
        w_cal = nn.Conv(self.c_in, (self.kernels[1], 1, 1), name="b",
                        **kwargs)(h) + 1.0
        if self.with_bias_cal:
            b_cal = nn.Conv(self.c_in, (self.kernels[1], 1, 1), name="b_bias",
                            **kwargs)(h) + 1.0
            return w_cal, b_cal
        return w_cal


class _TAdaConvNeXtBlockBase(nn.Module):
    dim: int
    cfg: Any
    drop_path_rate: float = 0.0
    layer_scale_init: float = 1e-6
    with_avgpool: bool = True
    # zero-init the avg-pool LayerNorm so the pooled branch starts as a
    # no-op (tada_convnext.py:56-58); the "Original" variant keeps the
    # default ones/zeros init (tada_convnext.py:134-136)
    avgpool_norm_zero_init: bool = True

    @nn.compact
    def __call__(self, x, train=True):
        br = self.cfg.VIDEO.BACKBONE.BRANCH
        inp = x
        dt = compute_dtype(x)
        alpha = RouteFuncNeXt(
            self.dim, int(br.get("ROUTE_FUNC_R", 4)),
            tuple(br.get("ROUTE_FUNC_K", [3, 3])),
            route_type=br.get("ROUTE_FUNC_TYPE", "normal"),
            with_bias_cal=True, name="dwconv_rf")(x, train)
        w_cal, b_cal = alpha
        # depthwise 1x7x7 conv; cout calibration = post-scale of the conv
        # output, bias calibration scales the (separate) bias term
        # (tada_convnext.py:463-470)
        h = nn.Conv(self.dim, (1, 7, 7),
                    padding=((0, 0), (3, 3), (3, 3)),
                    feature_group_count=self.dim, use_bias=False,
                    dtype=dt, name="dwconv")(x)
        bias = self.param("dwconv_bias", nn.initializers.zeros, (self.dim,))
        h = h * w_cal.astype(h.dtype) + (bias * b_cal).astype(h.dtype)
        normed = fp32_island(nn.LayerNorm(epsilon=1e-6, name="norm"), h)
        if self.with_avgpool:
            pooled = nn.avg_pool(h, (3, 1, 1), strides=(1, 1, 1),
                                 padding=((1, 1), (0, 0), (0, 0)))
            scale_init = (nn.initializers.zeros if self.avgpool_norm_zero_init
                          else nn.initializers.ones)
            normed = normed + fp32_island(nn.LayerNorm(
                epsilon=1e-6, name="avgpool_norm",
                scale_init=scale_init,
                bias_init=nn.initializers.zeros), pooled)
        h = nn.Dense(4 * self.dim, dtype=dt, name="pwconv1")(normed)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=dt, name="pwconv2")(h)
        if self.layer_scale_init > 0:
            gamma = self.param("gamma",
                               nn.initializers.constant(self.layer_scale_init),
                               (self.dim,))
            h = gamma.astype(h.dtype) * h
        return inp + DropPath(self.drop_path_rate)(h, train)


@BRANCH_REGISTRY.register()
class TAdaConvNeXtBlock(_TAdaConvNeXtBlockBase):
    """No-avgpool variant (tada_convnext.py:159-214)."""

    with_avgpool: bool = False


@BRANCH_REGISTRY.register()
class TAdaConvNeXtBlockAvgPoolGELU(_TAdaConvNeXtBlockBase):
    """Avg-pool aggregation variant (tada_convnext.py:10-82)."""

    with_avgpool: bool = True


@BRANCH_REGISTRY.register()
class TAdaConvNeXtBlockAvgPoolGELUOriginal(_TAdaConvNeXtBlockBase):
    """Avg-pool variant with a normally-initialized pooled-branch LayerNorm
    (tada_convnext.py:84-160): identical math to ``...AvgPoolGELU`` but the
    pooled branch contributes from step 0 instead of fading in."""

    with_avgpool: bool = True
    avgpool_norm_zero_init: bool = False


@BACKBONE_REGISTRY.register()
class ConvNeXt(nn.Module):
    """4-stage video ConvNeXt with TAda blocks. Input (B,T,H,W,3)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        cfg = self.cfg
        bb = cfg.VIDEO.BACKBONE
        if isinstance(x, dict):
            x = x["video"]
        depths = list(bb.DEPTH)
        dims = list(bb.NUM_FILTERS)
        tk = int(bb.STEM.get("T_KERNEL_SIZE", 1) or 1)
        x = maybe_bf16_input(cfg, x)
        # patchify stem: (tk,4,4) conv stride (1,4,4)
        x = nn.Conv(dims[0], (tk, 4, 4), strides=(1, 4, 4),
                    padding=((tk // 2, tk // 2), (0, 0), (0, 0)),
                    dtype=compute_dtype(x), name="stem_conv")(x)
        x = fp32_island(nn.LayerNorm(epsilon=1e-6, name="stem_norm"), x)

        branch_cls = BRANCH_REGISTRY.get_strict(bb.BRANCH.NAME)
        total = sum(depths)
        dpr = [float(r) for r in jnp.linspace(0, bb.get("DROP_PATH", 0.0), total)]
        block_id = 0
        for stage, (depth, dim) in enumerate(zip(depths, dims)):
            if stage > 0:
                x = fp32_island(
                    nn.LayerNorm(epsilon=1e-6, name=f"down_norm{stage}"), x)
                x = nn.Conv(dim, (1, 2, 2), strides=(1, 2, 2),
                            dtype=compute_dtype(x),
                            name=f"down_conv{stage}")(x)
            for i in range(depth):
                x = branch_cls(
                    dim=dim, cfg=cfg, drop_path_rate=dpr[block_id],
                    layer_scale_init=float(bb.get("LARGE_SCALE_INIT_VALUE", 1e-6)),
                    name=f"stage{stage}_block{i}")(x, train)
                block_id += 1
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)
