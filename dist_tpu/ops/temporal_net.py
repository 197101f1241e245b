"""Fused DiST TemporalNet block (Pallas TPU kernels, fwd AND bwd).

The ladder's temporal block — qgelu(x + conv(1,3,3)(qgelu(conv(k,1,1)(
LN(x))))) on (B, T, H, W, C), reference models/module_zoo/branches/
dist.py:48-65 — is a chain of five bandwidth-bound ops over a small
(T*H*W, 96) volume. XLA materializes intermediates in HBM between them;
per batch row the whole working set is a few MB, so both the forward and
the backward fit entirely in VMEM. These kernels run the full chain (and
its full gradient, with forward recomputation in VMEM) as ONE program
per batch row.

Kernel geometry: everything lives as ONE 2-D (T*H*W, C) buffer per
program — Mosaic's best-supported shape class (no in-kernel reshapes, no
rank>2 vector ops; the first rank-5 formulation crashed the remote
Mosaic compiler outright). Every conv tap becomes "sublane-shift the
buffer, mask the rows that wrapped across a frame/image-row boundary,
one dense (T*H*W, C)x(C, F) matmul":

  temporal tap d:  shift by (d-pad)*H*W rows  (whole frames; no mask)
  spatial tap dy:  shift by (dy-1)*W rows     + first/last-image-row mask
  spatial tap dx:  shift by (dx-1) rows       + first/last-column mask

The boundary masks are precomputed (T*H*W, 1) constants; this is the
shifted-matmul conv formulation the repo already uses against XLA's ~5x
overlapping-window slow path (see TemporalConv), taken to its VMEM-
resident conclusion.

Used by TemporalNet when DiSTNetwork is built with fused_temporal=True
(cfg key TPU.FUSED_TEMPORAL_NET); jnp reference elsewhere. Param layouts
are IDENTICAL to the unfused module (raw flax conv kernels in, raw grads
out), so checkpoints and optimizer trees are unaffected by the flag.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5


def _qgelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _qgelu_grad(x):
    s = jax.nn.sigmoid(1.702 * x)
    return s * (1.0 + 1.702 * x * (1.0 - s))


def _pack_w1(w1_raw):
    """(k,1,1,C,F) raw flax kernel -> (k*C, F) tap-major rows (per-tap
    slices cut the SUBLANE dim; lane-dim slices at non-128 offsets are
    Mosaic-hostile)."""
    k, _, _, c, f = w1_raw.shape
    return w1_raw.reshape(k * c, f)


def _unpack_dw1(dw1_packed, k, c, f):
    return dw1_packed.reshape(k, 1, 1, c, f)


def _pack_w2(w2_raw):
    """(1,3,3,F,C) raw flax kernel -> (9*F, C) tap-major rows."""
    _, kh, kw, f, c = w2_raw.shape
    return w2_raw.reshape(kh * kw * f, c)


def _masks(t, h, w):
    """Boundary masks for flat sublane shifts of a (T*H*W, C) buffer,
    shape (T*H*W, 1) fp32: rows_first zeroes each frame's FIRST image row
    (for one row-shift direction), rows_last its LAST; cols_* likewise
    for the first/last column of each image row."""
    import numpy as np
    hw = np.arange(t * h * w) % (h * w)
    rows, cols = hw // w, hw % w

    def m(keep):
        return jnp.asarray(keep.astype(np.float32)[:, None])

    return (m(rows != 0), m(rows != h - 1), m(cols != 0), m(cols != w - 1))


def _shift_rows(x, s):
    """x (N, C) -> y with y[p] = x[p+s], zeros outside. Static s."""
    n = x.shape[0]
    if s == 0:
        return x
    z = jnp.zeros((abs(s), x.shape[1]), x.dtype)
    if s > 0:
        return jnp.concatenate([x[s:], z], axis=0)
    return jnp.concatenate([z, x[:n + s]], axis=0)


def _shift_spatial(x, dy, dx, w, mrf, mrl, mcf, mcl):
    """Spatial (dy-1, dx-1)-tap view of the flat (T*H*W, C) buffer:
    row-shift with frame-boundary mask, then column-shift with
    row-boundary mask."""
    y = x
    if dy != 1:
        y = _shift_rows(y, (dy - 1) * w)
        y = y * (mrl if dy == 2 else mrf)
    if dx != 1:
        y = _shift_rows(y, dx - 1)
        y = y * (mcl if dx == 2 else mcf)
    return y


def _mm(a, b):
    """(M, K) @ (K, N)."""
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    """(M, K) x (N, K) -> (M, N): contract the last dims (b transposed)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_tn(a, b):
    """(K, M) x (K, N) -> (M, N): contract the first dims (a transposed)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _ln_fwd(xf, scale, bias):
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    z = xc * rstd
    return z * scale + bias, z, rstd


def _chain_fwd(xf, ln_s, ln_b, w1p, b1, w2p, b2, masks, *, k, f, hw, w):
    """Forward on one flat (T*H*W, C) fp32 buffer; returns what the
    backward needs."""
    n, c = xf.shape
    pad = k // 2
    mrf, mrl, mcf, mcl = masks
    xl, z, rstd = _ln_fwd(xf, ln_s, ln_b)
    hb = jnp.zeros((n, f), jnp.float32)
    for d in range(k):
        hb = hb + _mm(_shift_rows(xl, (d - pad) * hw),
                      w1p[d * c:(d + 1) * c])
    hb = hb + b1
    g = _qgelu(hb)
    acc = jnp.zeros((n, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = 3 * dy + dx
            acc = acc + _mm(_shift_spatial(g, dy, dx, w, mrf, mrl, mcf, mcl),
                            w2p[tap * f:(tap + 1) * f])
    r = xf + acc + b2
    return r, g, hb, xl, z, rstd


def _fwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                mrf_ref, mrl_ref, mcf_ref, mcl_ref, o_ref, *, k, f, hw, w):
    xf = x_ref[0].astype(jnp.float32)
    masks = (mrf_ref[...], mrl_ref[...], mcf_ref[...], mcl_ref[...])
    r, _, _, _, _, _ = _chain_fwd(
        xf, lns_ref[0], lnb_ref[0], w1_ref[...], b1_ref[0], w2_ref[...],
        b2_ref[0], masks, k=k, f=f, hw=hw, w=w)
    o_ref[0] = _qgelu(r).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, mrf_ref, mrl_ref, mcf_ref, mcl_ref,
                dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref, dw2_ref,
                db2_ref, *, k, f, hw, w):
    n, c = x_ref.shape[1:]
    pad = k // 2
    xf = x_ref[0].astype(jnp.float32)
    dout = g_ref[0].astype(jnp.float32)
    lns = lns_ref[0]
    w1p, w2p = w1_ref[...], w2_ref[...]
    masks = (mrf_ref[...], mrl_ref[...], mcf_ref[...], mcl_ref[...])
    mrf, mrl, mcf, mcl = masks

    # recompute the forward entirely in VMEM
    r, g, hb, xl, z, rstd = _chain_fwd(
        xf, lns, lnb_ref[0], w1p, b1_ref[0], w2p, b2_ref[0], masks,
        k=k, f=f, hw=hw, w=w)

    dr = _qgelu_grad(r) * dout             # grad at (residual + conv acc)
    db2_ref[0, 0] = jnp.sum(dr, axis=0)
    # spatial conv backward. fwd: acc += S(g) @ W_tap with S = mask∘shift;
    # S^T = shift^T ∘ mask where shift^T is the OPPOSITE shift, applied
    # in reverse op order (col then row).
    dg = jnp.zeros((n, f), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = 3 * dy + dx
            w2_tap = w2p[tap * f:(tap + 1) * f]          # (F, C)
            e = _mm_nt(dr, w2_tap)                       # (N, F)
            if dx != 1:
                e = _shift_rows(e * (mcl if dx == 2 else mcf), 1 - dx)
            if dy != 1:
                e = _shift_rows(e * (mrl if dy == 2 else mrf), (1 - dy) * w)
            dg = dg + e
            dw2_ref[0, tap * f:(tap + 1) * f] = _mm_tn(
                _shift_spatial(g, dy, dx, w, mrf, mrl, mcf, mcl), dr)

    dhb = _qgelu_grad(hb) * dg
    db1_ref[0, 0] = jnp.sum(dhb, axis=0)

    # temporal conv backward (whole-frame shifts; no masks needed)
    dxl = jnp.zeros((n, c), jnp.float32)
    for d in range(k):
        w1_d = w1p[d * c:(d + 1) * c]                    # (C, F)
        dxl = dxl + _shift_rows(_mm_nt(dhb, w1_d), (pad - d) * hw)
        dw1_ref[0, d * c:(d + 1) * c] = _mm_tn(
            _shift_rows(xl, (d - pad) * hw), dhb)

    # LayerNorm backward
    dlns_ref[0, 0] = jnp.sum(dxl * z, axis=0)
    dlnb_ref[0, 0] = jnp.sum(dxl, axis=0)
    dz = dxl * lns
    mean_dz = jnp.mean(dz, axis=-1, keepdims=True)
    mean_dzz = jnp.mean(dz * z, axis=-1, keepdims=True)
    dx_ln = rstd * (dz - mean_dz - z * mean_dzz)

    dx_ref[0] = (dr + dx_ln).astype(dx_ref.dtype)


def _flatten_thw(x):
    """(B,T,H,W,C) -> flat (B, T*H*W, C) + (t, h, w)."""
    b, t, h, w, c = x.shape
    return x.reshape(b, t * h * w, c), (t, h, w)


def _reference(x, ln_s, ln_b, w1_raw, b1, w2_raw, b2):
    """jnp reference of the whole block (CPU fallback and VJP source)."""
    k, f = w1_raw.shape[0], w1_raw.shape[-1]
    x2, (t, h, w) = _flatten_thw(x)
    w1p = _pack_w1(w1_raw).astype(jnp.float32)
    w2p = _pack_w2(w2_raw).astype(jnp.float32)
    masks = _masks(t, h, w)
    lns = ln_s.astype(jnp.float32)
    lnb = ln_b.astype(jnp.float32)
    b1f = b1.astype(jnp.float32)
    b2f = b2.astype(jnp.float32)

    def one(xb):
        r, *_ = _chain_fwd(xb.astype(jnp.float32), lns, lnb, w1p, b1f,
                           w2p, b2f, masks, k=k, f=f, hw=h * w, w=w)
        return _qgelu(r).astype(x.dtype)

    return jax.vmap(one)(x2).reshape(x.shape)


def _const_spec(arr):
    n = arr.ndim
    return pl.BlockSpec(arr.shape, lambda i, _n=n: (0,) * _n,
                        memory_space=pltpu.VMEM)


def _row_spec(shape):
    n = len(shape)
    return pl.BlockSpec((1,) + tuple(shape[1:]),
                        lambda i, _n=n: (i,) + (0,) * (_n - 1),
                        memory_space=pltpu.VMEM)


def _prep(ln_s, ln_b, w1_raw, b1, w2_raw, b2, t, h, w):
    f32 = jnp.float32
    vec = lambda v: v.reshape(1, -1).astype(f32)
    return ((vec(ln_s), vec(ln_b), _pack_w1(w1_raw).astype(f32), vec(b1),
             _pack_w2(w2_raw).astype(f32), vec(b2)) + _masks(t, h, w))


def _pallas_fwd(x, ln_s, ln_b, w1_raw, b1, w2_raw, b2, interpret=False):
    b, _, _, _, c = x.shape
    k, f = w1_raw.shape[0], w1_raw.shape[-1]
    x2, (t, h, w) = _flatten_thw(x)
    consts = _prep(ln_s, ln_b, w1_raw, b1, w2_raw, b2, t, h, w)
    kern = functools.partial(_fwd_kernel, k=k, f=f, hw=h * w, w=w)
    out = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(b,),
        in_specs=[_row_spec(x2.shape)] + [_const_spec(a) for a in consts],
        out_specs=_row_spec(x2.shape),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        # the default 16 MB scoped-vmem budget is what we're here to spend:
        # the whole per-row working set is VMEM-resident by design
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * h * w * c * f * (k + 9),
            transcendentals=2 * b * t * h * w * max(c, f),
            bytes_accessed=2 * x2.size * x.dtype.itemsize),
    )(x2, *consts)
    return out.reshape(x.shape)


def _pallas_bwd(x, g, ln_s, ln_b, w1_raw, b1, w2_raw, b2, interpret=False):
    b, _, _, _, c = x.shape
    k, f = w1_raw.shape[0], w1_raw.shape[-1]
    f32 = jnp.float32
    x2, (t, h, w) = _flatten_thw(x)
    g2, _ = _flatten_thw(g)
    consts = _prep(ln_s, ln_b, w1_raw, b1, w2_raw, b2, t, h, w)
    kern = functools.partial(_bwd_kernel, k=k, f=f, hw=h * w, w=w)
    # vector grads carry a singleton SUBLANE axis: a rank-2 (B, C) output
    # would need a (1, C) block whose sublane dim (1 of 8) breaks TPU
    # tiling; (B, 1, C) keeps the minor-most two block dims == array dims
    out_shapes = [
        jax.ShapeDtypeStruct(x2.shape, x.dtype),          # dx
        jax.ShapeDtypeStruct((b, 1, c), f32),             # dln_scale partial
        jax.ShapeDtypeStruct((b, 1, c), f32),             # dln_bias partial
        jax.ShapeDtypeStruct((b, k * c, f), f32),         # dw1p partial
        jax.ShapeDtypeStruct((b, 1, f), f32),             # db1 partial
        jax.ShapeDtypeStruct((b, 9 * f, c), f32),         # dw2p partial
        jax.ShapeDtypeStruct((b, 1, c), f32),             # db2 partial
    ]
    outs = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(b,),
        in_specs=[_row_spec(x2.shape), _row_spec(x2.shape)] +
                 [_const_spec(a) for a in consts],
        out_specs=[_row_spec(s.shape) for s in out_shapes],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(x2, g2, *consts)
    dx, dlns, dlnb, dw1p, db1, dw2p, db2 = outs
    dw1 = _unpack_dw1(jnp.sum(dw1p, 0), k, c, f)
    dw2 = jnp.sum(dw2p, 0).reshape(1, 3, 3, f, c)
    vsum = lambda a: jnp.sum(a, axis=(0, 1))
    return (dx.reshape(x.shape), vsum(dlns).astype(ln_s.dtype),
            vsum(dlnb).astype(ln_b.dtype), dw1.astype(w1_raw.dtype),
            vsum(db1).astype(b1.dtype), dw2.astype(w2_raw.dtype),
            vsum(db2).astype(b2.dtype))


def _use_pallas():
    return jax.default_backend() in ("tpu", "axon")


@jax.custom_vjp
def fused_temporal_net(x, ln_scale, ln_bias, w1_raw, b1, w2_raw, b2):
    """TemporalNet block: qgelu(x + conv133(qgelu(convk11(LN(x))))).

    x: (B, T, H, W, C); w1_raw: flax kernel (k,1,1,C,F); w2_raw: flax
    kernel (1,3,3,F,C). Returns (B, T, H, W, C) in x.dtype. Grad layouts
    match the raw flax params exactly.
    """
    if not _use_pallas():
        return _reference(x, ln_scale, ln_bias, w1_raw, b1, w2_raw, b2)
    return _pallas_fwd(x, ln_scale, ln_bias, w1_raw, b1, w2_raw, b2)


def _vjp_fwd(x, ln_scale, ln_bias, w1_raw, b1, w2_raw, b2):
    out = fused_temporal_net(x, ln_scale, ln_bias, w1_raw, b1, w2_raw, b2)
    return out, (x, ln_scale, ln_bias, w1_raw, b1, w2_raw, b2)


def _vjp_bwd(res, g):
    x, ln_scale, ln_bias, w1_raw, b1, w2_raw, b2 = res
    if not _use_pallas():
        _, vjp = jax.vjp(_reference, x, ln_scale, ln_bias, w1_raw, b1,
                         w2_raw, b2)
        return vjp(g)
    return _pallas_bwd(x, g, ln_scale, ln_bias, w1_raw, b1, w2_raw, b2)


fused_temporal_net.defvjp(_vjp_fwd, _vjp_bwd)
