"""Fused DiST TemporalNet block (Pallas TPU kernels, fwd AND bwd).

The ladder's temporal block — qgelu(x + conv(1,3,3)(qgelu(conv(k,1,1)(
LN(x))))) on (B, T, H, W, C), reference models/module_zoo/branches/
dist.py:48-65 — is a chain of five bandwidth-bound ops over a small
(T*H*W, 96) volume. XLA materializes intermediates in HBM between them;
per batch row the whole working set is a few MB, so both the forward and
the backward fit entirely in VMEM. These kernels run the full chain (and
its full gradient) as ONE program per batch row:

  fwd:  LN (VPU, fp32) -> k temporally-shifted matmuls (MXU)
        -> quick-gelu -> 9 spatially-shifted matmuls (MXU) -> residual gelu
  bwd:  recompute the forward pieces in VMEM (nothing saved to HBM except
        x itself), then walk the chain backwards; weight grads come out
        as per-program partials summed by XLA afterwards.

Both convs use the shifted-matmul formulation (the repo's measured
workaround for XLA's ~5x slow path on overlapping temporal conv windows —
see TemporalConv in models/dist/dist_net.py), which is exactly what a
VMEM-resident kernel wants anyway: k (resp. 9) dense (T*H*W, C)x(C, F)
matmuls over shifted views of one resident buffer.

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
    """(k,1,1,C,F) raw flax kernel -> (k*C, F) tap-major ROWS (slicing the
    sublane dim inside the kernel; lane-dim slices at non-128 offsets are
    Mosaic-hostile)."""
    k, _, _, c, f = w1_raw.shape
    return w1_raw.reshape(k * c, f)


def _unpack_dw1(dw1_packed, k, c, f):
    return dw1_packed.reshape(k, 1, 1, c, f)


def _pack_w2(w2_raw):
    """(1,3,3,F,C) raw flax kernel -> (9*F, C) tap-major rows."""
    _, kh, kw, f, c = w2_raw.shape
    return w2_raw.reshape(kh * kw * f, c)


def _shift_t(x, s):
    """x (T, HW, C) -> y with y[t] = x[t+s] (zeros outside). Static s."""
    t = x.shape[0]
    if s == 0:
        return x
    z = jnp.zeros((abs(s),) + x.shape[1:], x.dtype)
    if s > 0:
        return jnp.concatenate([x[s:], z], axis=0)
    return jnp.concatenate([z, x[:t + s]], axis=0)


def _shift_hw(x, sh, sw):
    """x (T, H, W, C) -> y[t,h,w] = x[t, h+sh, w+sw] (zeros outside)."""
    t, h, w, c = x.shape
    if sh:
        z = jnp.zeros((t, abs(sh), w, c), x.dtype)
        x = (jnp.concatenate([x[:, sh:], z], 1) if sh > 0
             else jnp.concatenate([z, x[:, :h + sh]], 1))
    if sw:
        z = jnp.zeros((t, h, abs(sw), c), x.dtype)
        x = (jnp.concatenate([x[:, :, sw:], z], 2) if sw > 0
             else jnp.concatenate([z, x[:, :, :w + sw]], 2))
    return x


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


def _chain_fwd(xf, ln_s, ln_b, w1p, b1, w2p, b2, *, k, f):
    """Shared fwd math on one (T,H,W,C) fp32 block; returns what the
    backward needs."""
    t, h, w, c = xf.shape
    pad = k // 2
    xl, z, rstd = _ln_fwd(xf, ln_s, ln_b)
    xl3 = xl.reshape(t, h * w, c)
    hb = jnp.zeros((t, h * w, f), jnp.float32)
    for d in range(k):
        hb = hb + _mm(_shift_t(xl3, d - pad).reshape(t * h * w, c),
                      w1p[d * c:(d + 1) * c]).reshape(t, h * w, f)
    hb = hb + b1
    g = _qgelu(hb)
    s4 = g.reshape(t, h, w, f)
    acc = jnp.zeros((t, h, w, c), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = 3 * dy + dx
            acc = acc + _mm(
                _shift_hw(s4, dy - 1, dx - 1).reshape(t * h * w, f),
                w2p[tap * f:(tap + 1) * f]).reshape(t, h, w, c)
    r = xf + acc + b2
    return r, s4, hb, xl, z, rstd


def _fwd_kernel(x_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                o_ref, *, k, f):
    xf = x_ref[0].astype(jnp.float32)
    r, _, _, _, _, _ = _chain_fwd(
        xf, lns_ref[0], lnb_ref[0], w1_ref[...], b1_ref[0], w2_ref[...],
        b2_ref[0], k=k, f=f)
    o_ref[0] = _qgelu(r).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, lns_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, dx_ref, dlns_ref, dlnb_ref, dw1_ref, db1_ref,
                dw2_ref, db2_ref, *, k, f):
    t, h, w, c = x_ref.shape[1:]
    pad = k // 2
    xf = x_ref[0].astype(jnp.float32)
    dout = g_ref[0].astype(jnp.float32)
    lns = lns_ref[0]
    w1p, w2p = w1_ref[...], w2_ref[...]

    # recompute the forward entirely in VMEM
    r, s4, hb, xl, z, rstd = _chain_fwd(
        xf, lns, lnb_ref[0], w1p, b1_ref[0], w2p, b2_ref[0], k=k, f=f)

    dr = _qgelu_grad(r) * dout             # grad at (residual + conv acc)
    db2_ref[0] = jnp.sum(dr, axis=(0, 1, 2))
    dr_flat = dr.reshape(t * h * w, c)

    # spatial conv backward: dg and per-tap weight grads
    dg = jnp.zeros((t, h, w, f), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = 3 * dy + dx
            w2_tap = w2p[tap * f:(tap + 1) * f]          # (F, C)
            dg = dg + _mm_nt(
                _shift_hw(dr, 1 - dy, 1 - dx).reshape(t * h * w, c),
                w2_tap).reshape(t, h, w, f)
            dw2_ref[0, tap * f:(tap + 1) * f] = _mm_tn(
                _shift_hw(s4, dy - 1, dx - 1).reshape(t * h * w, f),
                dr_flat)

    dhb = _qgelu_grad(hb) * dg.reshape(t, h * w, f)      # (T,HW,F)
    db1_ref[0] = jnp.sum(dhb, axis=(0, 1))

    # temporal conv backward
    xl3 = xl.reshape(t, h * w, c)
    dxl = jnp.zeros((t, h * w, c), jnp.float32)
    for d in range(k):
        w1_d = w1p[d * c:(d + 1) * c]                    # (C, F)
        dxl = dxl + _mm_nt(_shift_t(dhb, pad - d).reshape(t * h * w, f),
                           w1_d).reshape(t, h * w, c)
        dw1_ref[0, d * c:(d + 1) * c] = _mm_tn(
            _shift_t(xl3, d - pad).reshape(t * h * w, c),
            dhb.reshape(t * h * w, f))

    # LayerNorm backward
    dxl4 = dxl.reshape(t, h, w, c)
    dlns_ref[0] = jnp.sum(dxl4 * z, axis=(0, 1, 2))
    dlnb_ref[0] = jnp.sum(dxl4, axis=(0, 1, 2))
    dz = dxl4 * lns
    mean_dz = jnp.mean(dz, axis=-1, keepdims=True)
    mean_dzz = jnp.mean(dz * z, axis=-1, keepdims=True)
    dx_ln = rstd * (dz - mean_dz - z * mean_dzz)

    dx_ref[0] = (dr + dx_ln).astype(dx_ref.dtype)


def _reference(x, ln_s, ln_b, w1_raw, b1, w2_raw, b2):
    """jnp reference of the whole block (CPU fallback and VJP check)."""
    k = w1_raw.shape[0]
    f = w1_raw.shape[-1]
    w1p, w2p = _pack_w1(w1_raw), _pack_w2(w2_raw)
    lns = ln_s.astype(jnp.float32)
    lnb = ln_b.astype(jnp.float32)
    b1f = b1.astype(jnp.float32)
    b2f = b2.astype(jnp.float32)

    def one(xb):
        r, *_ = _chain_fwd(xb.astype(jnp.float32), lns, lnb,
                           w1p.astype(jnp.float32), b1f,
                           w2p.astype(jnp.float32), b2f, k=k, f=f)
        return _qgelu(r).astype(x.dtype)

    return jax.vmap(one)(x)


def _const_spec(arr):
    n = arr.ndim
    return pl.BlockSpec(arr.shape, lambda i, _n=n: (0,) * _n,
                        memory_space=pltpu.VMEM)


def _row_spec(shape):
    n = len(shape)
    return pl.BlockSpec((1,) + tuple(shape[1:]),
                        lambda i, _n=n: (i,) + (0,) * (_n - 1),
                        memory_space=pltpu.VMEM)


def _pallas_fwd(x, ln_s, ln_b, w1_raw, b1, w2_raw, b2, interpret=False):
    b, t, h, w, c = x.shape
    k, f = w1_raw.shape[0], w1_raw.shape[-1]
    w1p = _pack_w1(w1_raw).astype(jnp.float32)
    w2p = _pack_w2(w2_raw).astype(jnp.float32)
    vecs = [v.reshape(1, -1).astype(jnp.float32) for v in (ln_s, ln_b)]
    b1v = b1.reshape(1, -1).astype(jnp.float32)
    b2v = b2.reshape(1, -1).astype(jnp.float32)
    kern = functools.partial(_fwd_kernel, k=k, f=f)
    args = (x, vecs[0], vecs[1], w1p, b1v, w2p, b2v)
    return pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(b,),
        in_specs=[_row_spec(x.shape)] + [_const_spec(a) for a in args[1:]],
        out_specs=_row_spec(x.shape),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t * h * w * c * f * (k + 9),
            transcendentals=2 * b * t * h * w * max(c, f),
            bytes_accessed=2 * b * t * h * w * c * x.dtype.itemsize),
    )(*args)


def _pallas_bwd(x, g, ln_s, ln_b, w1_raw, b1, w2_raw, b2, interpret=False):
    b, t, h, w, c = x.shape
    k, f = w1_raw.shape[0], w1_raw.shape[-1]
    f32 = jnp.float32
    w1p = _pack_w1(w1_raw).astype(f32)
    w2p = _pack_w2(w2_raw).astype(f32)
    lnsv = ln_s.reshape(1, -1).astype(f32)
    lnbv = ln_b.reshape(1, -1).astype(f32)
    b1v = b1.reshape(1, -1).astype(f32)
    b2v = b2.reshape(1, -1).astype(f32)
    kern = functools.partial(_bwd_kernel, k=k, f=f)
    args = (x, g, lnsv, lnbv, w1p, b1v, w2p, b2v)
    out_shapes = [
        jax.ShapeDtypeStruct((b, t, h, w, c), x.dtype),   # dx
        jax.ShapeDtypeStruct((b, c), f32),                # dln_scale partial
        jax.ShapeDtypeStruct((b, c), f32),                # dln_bias partial
        jax.ShapeDtypeStruct((b, k * c, f), f32),         # dw1p partial
        jax.ShapeDtypeStruct((b, f), f32),                # db1 partial
        jax.ShapeDtypeStruct((b, 9 * f, c), f32),         # dw2p partial
        jax.ShapeDtypeStruct((b, c), f32),                # db2 partial
    ]
    outs = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(b,),
        in_specs=[_row_spec(x.shape), _row_spec(x.shape)] +
                 [_const_spec(a) for a in args[2:]],
        out_specs=[_row_spec(s.shape) for s in out_shapes],
        out_shape=out_shapes,
    )(*args)
    dx, dlns, dlnb, dw1p, db1, dw2p, db2 = outs
    dw1 = _unpack_dw1(jnp.sum(dw1p, 0), k, c, f)
    dw2 = jnp.sum(dw2p, 0).reshape(1, 3, 3, f, c)
    return (dx, jnp.sum(dlns, 0).astype(ln_s.dtype),
            jnp.sum(dlnb, 0).astype(ln_b.dtype), dw1.astype(w1_raw.dtype),
            jnp.sum(db1, 0).astype(b1.dtype), dw2.astype(w2_raw.dtype),
            jnp.sum(db2, 0).astype(b2.dtype))


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
