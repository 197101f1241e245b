"""DiST side network (the trainable part of the DiST model).

TPU-native rebuild of the reference's ``DiSTNetwork``
(``models/module_zoo/branches/dist.py:16-247``): a dense temporal 3D-conv
stream over all T frames plus a per-CLIP-layer integration ladder over the
sparse T/alpha frames, fused bidirectionally each step, finished with two
cross-attention adaptive-pooling layers.

TPU-first design choices:

- the 12/24-step ladder is one ``nn.scan`` over stacked per-layer params
  (one compiled body; the reference unrolls Python loops over ModuleLists,
  ``dist.py:227-235``),
- everything is channels-last (NDHWC) so 3D convs hit XLA's native TPU
  layout; the reference's permute gymnastics around channels-first LayerNorm
  (``dist.py:43-44,65``) disappear,
- temporal upsampling (``dist.py:105``) is ``jnp.repeat``; the strided
  temporal downsample (``dist.py:75``) is a stride-alpha conv, both static.

Shapes (B videos, T dense frames, t = T/alpha sparse frames, L tokens):
  video  (B, T, H, W, 3)
  taps   (num_selected, B*t, L, d_model)  — CLIP block outputs
  out    (B, embed_dim)
"""

from typing import Tuple

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from dist_tpu.models.base.blocks import (
    CrossAttentionBlock,
    LayerNorm,
    MLP,
    quick_gelu,
)


@dataclasses.dataclass(frozen=True)
class DiSTConfig:
    """Static hyperparameters (cfg.VIDEO.BACKBONE.DIST.* in the reference)."""

    selected_layers: Tuple[int, ...]
    temporal_dim: int = 96
    integration_dim: int = 384
    s_patch_size: int = 16
    t_patch_size: int = 5
    temporal_kernel_size: int = 3
    temporal_conv_mlp_ratio: float = 1.0
    integration_mlp_ratio: float = 1.0
    integration_temporal_mlp_ratio: float = 0.25
    ada_pooling_layers: int = 2
    num_frames: int = 16
    alpha: int = 2

    @classmethod
    def from_cfg(cls, cfg):
        d = cfg.VIDEO.BACKBONE.DIST
        assert int(cfg.DATA.NUM_INPUT_FRAMES) % int(
            cfg.DATA.SPARSE_SAMPLE_ALPHA) == 0, (
            "NUM_INPUT_FRAMES must be divisible by SPARSE_SAMPLE_ALPHA "
            f"({cfg.DATA.NUM_INPUT_FRAMES} % {cfg.DATA.SPARSE_SAMPLE_ALPHA})"
            " — every t = T/alpha reshape in the ladder assumes it")
        return cls(
            selected_layers=tuple(d.SELECTED_LAYERS),
            temporal_dim=d.TEMPORAL_DIM,
            integration_dim=d.INTEGRATION_DIM,
            s_patch_size=d.S_PATCH_SIZE,
            t_patch_size=d.T_PATCH_SIZE,
            temporal_kernel_size=d.TEMPORAL_KERNEL_SIZE,
            temporal_conv_mlp_ratio=d.TEMPORAL_CONV_MLP_RATIO,
            integration_mlp_ratio=d.INTEGRATION_MLP_RATIO,
            integration_temporal_mlp_ratio=d.INTEGRATION_TEMPORAL_MLP_RATIO,
            ada_pooling_layers=d.ADA_POOLING_LAYERS,
            num_frames=cfg.DATA.NUM_INPUT_FRAMES,
            alpha=int(cfg.DATA.SPARSE_SAMPLE_ALPHA),
        )


class TemporalPatchStem(nn.Module):
    """The dense temporal patch stem — a (tp, p, p) conv with stride
    (1, p, p) — computed as a 2-D patch conv to tp*C channels + tp
    temporally shifted adds.

    XLA's lowering of the 3-D conv with OVERLAPPING temporal windows runs
    at ~7 TFLOP/s on v5e (2.7 ms at the flagship shape), while the
    non-overlapping 2-D patch conv takes the fast matmul path (~0.5 ms —
    same as the CLIP tower's conv1). Since the spatial windows don't
    overlap, conv3d(video, W) == shift-add over taps d of
    conv2d(video, W[d]); computing all taps as one conv to tp*C channels
    and summing tp shifted lane-slices of the small output is exact and
    ~3.5x faster (measured: 2.87 ms -> ~0.8 ms).

    Param tree matches ``nn.Conv`` (kernel (tp, p, p, 3, C) + bias) so
    checkpoints are layout-compatible.
    """

    channels: int
    t_patch: int
    s_patch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video):
        # video (B, T, H, W, 3)
        tp, p, c = self.t_patch, self.s_patch, self.channels
        b, t, h, w, ci = video.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (tp, p, p, ci, c), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        x = video.astype(self.dtype).reshape(b * t, h, w, ci)
        # all temporal taps as extra output channels of ONE 2-D patch conv
        w2d = jnp.transpose(kernel.astype(self.dtype), (1, 2, 3, 0, 4))
        w2d = w2d.reshape(p, p, ci, tp * c)
        y = jax.lax.conv_general_dilated(
            x, w2d, window_strides=(p, p), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B*T, hh, ww, tp*C)
        hh, ww = y.shape[1], y.shape[2]
        y = y.reshape(b, t, hh * ww, tp * c)
        # cross-correlation over taps: out[t] = sum_d y[t+d-tp//2, ..., d*C:]
        pad = tp // 2
        ypad = jnp.pad(y, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        out = ypad[:, 0:t, :, 0:c]
        for d in range(1, tp):
            out = out + ypad[:, d:d + t, :, d * c:(d + 1) * c]
        out = out + bias.astype(self.dtype)
        return out.reshape(b, t, hh, ww, c)


class TemporalConv(nn.Module):
    """'same'-padded (k,1,1) temporal conv on (B, T, ..., C) computed as ONE
    matmul to k*features channels + k temporally shifted adds.

    Exact reformulation: XLA's conv lowering for OVERLAPPING temporal
    windows runs ~5x slower than its matmul path on v5e (measured on the
    patch stem: 2.9 ms vs 0.8 ms). Param tree matches ``nn.Conv`` with
    kernel (k, 1, 1, Cin, Cout) + bias, so checkpoints are identical.
    """

    features: int
    k: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        f, k = self.features, self.k
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, 1, 1, cin, f), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        w = kernel.astype(self.dtype).reshape(k, cin, f)
        w = jnp.transpose(w, (1, 0, 2)).reshape(cin, k * f)
        y = x.astype(self.dtype) @ w  # (B, T, ..., k*f)
        pad = k // 2
        padcfg = [(0, 0)] * y.ndim
        padcfg[1] = (pad, pad)
        yp = jnp.pad(y, padcfg)
        t = x.shape[1]
        out = yp[:, 0:t, ..., 0:f]
        for d in range(1, k):
            out = out + yp[:, d:d + t, ..., d * f:(d + 1) * f]
        return out + bias.astype(self.dtype)


class _LNParams(nn.Module):
    """Param-only twin of LayerNorm (same names/shapes/inits) for the
    fused-kernel path: creates an IDENTICAL param subtree without running
    the unfused compute."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.dim,),
                           jnp.float32))


class _ConvParams(nn.Module):
    """Param-only twin of nn.Conv / TemporalConv (kernel + bias)."""

    kshape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           self.kshape, jnp.float32),
                self.param("bias", nn.initializers.zeros,
                           (self.kshape[-1],), jnp.float32))


class TemporalNet(nn.Module):
    """Residual temporal conv block (dist.py:48-65):
    qgelu(x + conv(1,3,3)(qgelu(conv(k,1,1)(LN(x)))))  on (B,T,H,W,C).

    With ``fused=True`` the whole chain runs as one VMEM-resident Pallas
    program per batch row (ops/temporal_net.py), fwd and bwd; the param
    tree is bit-identical to the unfused path, so the flag can be toggled
    on any checkpoint. The fused kernel computes in fp32 internally."""

    cfg: DiSTConfig
    dtype: jnp.dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        c = self.cfg.temporal_dim
        k = self.cfg.temporal_kernel_size
        hidden = int(c * self.cfg.temporal_conv_mlp_ratio)
        if self.fused:
            from dist_tpu.ops.temporal_net import fused_temporal_net

            lns, lnb = _LNParams(x.shape[-1], name="ln")()
            w1, b1 = _ConvParams((k, 1, 1, x.shape[-1], hidden),
                                 name="c_fc1")()
            w2, b2 = _ConvParams((1, 3, 3, hidden, c), name="c_fc2")()
            return fused_temporal_net(x, lns, lnb, w1, b1, w2, b2)
        h = LayerNorm(name="ln")(x)
        h = TemporalConv(hidden, k, dtype=self.dtype, name="c_fc1")(h)
        h = quick_gelu(h)
        h = nn.Conv(c, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="c_fc2")(h)
        return quick_gelu(x + h)


class IntegrationNetwork(nn.Module):
    """Dual FFN over integration tokens (dist.py:16-45): a token-MLP plus a
    temporal conv-FFN across the sparse frame axis. NOT residual — the
    caller threads the residual (dist.py:229,239)."""

    cfg: DiSTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B*t, L, C)
        c = self.cfg.integration_dim
        t = self.cfg.num_frames // self.cfg.alpha
        k = self.cfg.temporal_kernel_size
        bt, l, _ = x.shape
        b = bt // t

        ffn_out = MLP(int(c * self.cfg.integration_mlp_ratio), c,
                      dtype=self.dtype, name="ffn")(LayerNorm(name="ln")(x))

        hidden = int(c * self.cfg.integration_temporal_mlp_ratio)
        h = LayerNorm(name="ln_temporal")(x).reshape(b, t, l, 1, c)
        # convs over (t, l, 1) as NDHWC; kernels (1,1,1), (k,1,1), (1,1,1)
        # match the reference's Sequential order: c_fc1 -> c_fc2 -> gelu -> c_proj
        h = nn.Conv(hidden, (1, 1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="c_fc1")(h)
        h = TemporalConv(hidden, k, dtype=self.dtype, name="c_fc2")(h)
        h = quick_gelu(h)
        h = nn.Conv(c, (1, 1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="c_proj")(h)
        return ffn_out + h.reshape(bt, l, c)


class Temporal2Integration(nn.Module):
    """Dense->sparse lift (dist.py:68-86): stride-alpha temporal conv maps the
    dense stream onto sparse-frame integration tokens; a learned cls token is
    prepended to align with CLIP's token 0."""

    cfg: DiSTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_temporal):
        # x_temporal: (B, T, H', W', temporal_dim)
        a = self.cfg.alpha
        c = self.cfg.integration_dim
        t = self.cfg.num_frames // a
        x = nn.Conv(c, (a, 1, 1), strides=(a, 1, 1), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="linear_fuse")(x_temporal)
        b, _, hh, ww, _ = x.shape
        x = x.reshape(b, t, hh * ww, c)
        cls = self.param("cls_token", nn.initializers.truncated_normal(0.02),
                         (1, t, c), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(x.dtype), (b, t, c))[:, :, None, :]
        x = jnp.concatenate([cls, x], axis=2)  # (B, t, L=1+HW, C)
        return x.reshape(b * t, 1 + hh * ww, c)


class Integration2Temporal(nn.Module):
    """Sparse->dense injection (dist.py:90-105): drop cls, project to the
    temporal dim, nearest-upsample the frame axis by alpha."""

    cfg: DiSTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mid_feat):
        # mid_feat: (B*t, L, integration_dim)
        t = self.cfg.num_frames // self.cfg.alpha
        x = nn.Dense(self.cfg.temporal_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear_fuse")(mid_feat[:, 1:, :])
        bt, l, c = x.shape
        hw = int(round(l ** 0.5))
        x = x.reshape(bt // t, t, hw, hw, c)
        return jnp.repeat(x, self.cfg.alpha, axis=1)


class StackedInputLinear(nn.Module):
    """All per-layer 768->384 tap projections (``input_linears``,
    dist.py:183) as ONE batched einsum over the stacked taps.

    Inside the scan these are 12/24 small GEMMs (one per ladder step, each
    latency-bound); hoisted out they are a single (n, bt*L, d_model) x
    (n, d_model, c) batched matmul that runs at near-peak MXU rate, and the
    scan's xs input shrinks from d_model to integration_dim (half the HBM
    traffic through the loop). Param tree: kernel (n, d_model, c),
    bias (n, c) — the direct stack of the reference's Linear weights.
    """

    n: int
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, taps):
        # taps (n, bt, L, d_model)
        d = taps.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(batch_axis=(0,)),
            (self.n, d, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.n, self.features), jnp.float32)
        y = jnp.einsum("nblc,ncf->nblf", taps.astype(self.dtype),
                       kernel.astype(self.dtype))
        return y + bias.astype(self.dtype)[:, None, None, :]


class _LadderStep(nn.Module):
    """One ladder iteration (dist.py:227-235), scanned over selected layers.
    ``tap_mid`` is the already-projected CLIP tap (see StackedInputLinear)."""

    cfg: DiSTConfig
    d_model: int
    dtype: jnp.dtype = jnp.float32
    fused_temporal: bool = False

    @nn.compact
    def __call__(self, carry, tap_mid):
        x_temporal, res_feat, _ = carry
        x_temporal = TemporalNet(self.cfg, self.dtype,
                                 fused=self.fused_temporal,
                                 name="temporal_net")(x_temporal)
        mid = tap_mid + res_feat
        upd_temporal = Integration2Temporal(
            self.cfg, self.dtype, name="integration2temporal")(mid) + x_temporal
        upd_mid = mid + Temporal2Integration(
            self.cfg, self.dtype, name="temporal2integration")(x_temporal)
        res_feat = IntegrationNetwork(
            self.cfg, self.dtype, name="integration_net")(upd_mid)
        return (upd_temporal, res_feat, upd_mid), None


class AdaPooling(nn.Module):
    """Spatial-then-temporal cross-attention pooling (dist.py:108-162)."""

    cfg: DiSTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, prev_feat, top_cls, spatial_cls):
        # prev_feat (B*t, L, C); top_cls (B, 1, C); spatial_cls (B*t, 1, C)
        c = self.cfg.integration_dim
        heads = c // 64
        t = self.cfg.num_frames // self.cfg.alpha
        bt = prev_feat.shape[0]
        b = bt // t

        agg_sp = CrossAttentionBlock(heads, dtype=self.dtype,
                                     name="spatial_transformer")(spatial_cls, prev_feat)
        spatial_cls = spatial_cls + agg_sp
        spatial_cls = spatial_cls + MLP(c * 4, c, dtype=self.dtype,
                                        name="output_map_spatial_cls_token")(
            LayerNorm(name="ln_out_spat_cls_token")(spatial_cls))

        cls_tok = spatial_cls[:, 0, :].reshape(b, t, c)
        pos = self.param("positional_embedding",
                         nn.initializers.truncated_normal(0.02), (1, t, c),
                         jnp.float32)
        cls_tok = cls_tok + pos.astype(cls_tok.dtype)
        agg = CrossAttentionBlock(heads, dtype=self.dtype,
                                  name="temporal_transformer")(top_cls, cls_tok)
        top_cls = top_cls + agg
        top_cls = top_cls + MLP(c * 4, c, dtype=self.dtype,
                                name="output_map_cls_token")(
            LayerNorm(name="ln_out_temp_cls_token")(top_cls))
        return top_cls, spatial_cls


class DiSTNetwork(nn.Module):
    """The full trainable side network (dist.py:165-247)."""

    cfg: DiSTConfig
    d_model: int      # CLIP vision width (tap feature dim)
    output_dim: int   # CLIP embed dim

    dtype: jnp.dtype = jnp.float32
    # recompute ladder-step activations in the backward instead of saving
    # them (measured ~11% faster ladder backward + much lower residual
    # memory at 32/64-frame shapes)
    remat: bool = False
    # lax.scan unroll for the ladder (TPU.LADDER_UNROLL). -1 = FULL unroll:
    # XLA fuses/schedules across steps and drops the rolled scan's stacked
    # dynamic-slice residual buffers — measured ladder fwd+bwd 26.2 ->
    # 15.9 ms at B/16 batch-8 (tools/microbench.py bwd). PARTIAL unroll
    # pessimizes (unroll=4 measured 42 ms); only 1 (rolled) or full make
    # sense, so any other value is clamped to full.
    unroll: int = -1
    # run each TemporalNet block as one fused VMEM-resident Pallas program
    # (fwd + bwd; ops/temporal_net.py). Param-tree identical to unfused.
    fused_temporal: bool = False

    @nn.compact
    def __call__(self, video, taps_selected):
        """video (B, T, H, W, 3); taps_selected (num_sel, B*t, L, d_model)."""
        c = self.cfg.integration_dim
        t = self.cfg.num_frames // self.cfg.alpha
        n_sel, bt = taps_selected.shape[0], taps_selected.shape[1]
        b = bt // t
        p = self.cfg.s_patch_size
        tp = self.cfg.t_patch_size

        # dense temporal stem over ALL frames (dist.py:178-181,225), as a
        # patchify+GEMM (see TemporalPatchStem; conv-equivalent params)
        x_temporal = TemporalPatchStem(
            channels=self.cfg.temporal_dim, t_patch=tp, s_patch=p,
            dtype=self.dtype, name="temporal_stem",
        )(video)

        taps_mid = StackedInputLinear(
            n=n_sel, features=c, dtype=self.dtype, name="input_linears"
        )(taps_selected)

        Ladder = nn.scan(
            nn.remat(_LadderStep) if self.remat else _LadderStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            unroll=n_sel if int(self.unroll) != 1 else 1,
        )
        zeros_mid = jnp.zeros(
            (bt, taps_selected.shape[2], c), dtype=self.dtype
        )
        (x_temporal, res_feat, upd_mid), _ = Ladder(
            self.cfg, self.d_model, self.dtype,
            fused_temporal=self.fused_temporal, name="ladder"
        )((x_temporal, jnp.zeros_like(zeros_mid), zeros_mid), taps_mid)

        current_feat = res_feat + upd_mid

        top_cls = self.param("aggregated_cls_token",
                             nn.initializers.truncated_normal(0.02), (1, 1, c),
                             jnp.float32)
        top_cls = jnp.broadcast_to(top_cls.astype(self.dtype), (b, 1, c))
        spatial_cls = self.param("aggregated_spatial_cls_token",
                                 nn.initializers.truncated_normal(0.02), (1, 1, c),
                                 jnp.float32)
        spatial_cls = jnp.broadcast_to(spatial_cls.astype(self.dtype), (bt, 1, c))

        for i in range(self.cfg.ada_pooling_layers):
            top_cls, spatial_cls = AdaPooling(
                self.cfg, self.dtype, name=f"adapooling_{i}"
            )(current_feat, top_cls, spatial_cls)

        # final head: pooled cls + mean of the last selected CLIP layer's cls
        # across sparse frames (dist.py:243-246)
        last_cls = taps_selected[-1][:, 0, :].reshape(b, t, self.d_model)
        spatial_mean = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                                name="proj_spatial_cls_token")(
            last_cls.astype(self.dtype).mean(axis=1))
        x_logits = LayerNorm(name="ln_post")(top_cls[:, 0, :] + spatial_mean)
        proj = self.param("proj", nn.initializers.normal(stddev=c ** -0.5),
                          (c, self.output_dim), jnp.float32)
        return x_logits @ proj.astype(x_logits.dtype)
