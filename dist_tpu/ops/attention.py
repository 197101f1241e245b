"""Fused multi-head attention (Pallas TPU kernel).

The frozen CLIP tower's attention runs over (B*t, 197/257, 768/1024) —
small sequences, huge batch. XLA's default lowering materializes the
(B, H, L, L) score tensor in HBM between the two matmuls and the softmax;
this kernel takes the fused QKV projection in its NATIVE (B, L, 3D) layout
(no transposes or head reshapes on the XLA side, so the projection matmul
fuses straight into the kernel's input) and keeps the fp32 score tile and
softmax entirely in VMEM per batch program:

    per head h (lane slice of the qkv block):
      S = (Q_h K_h^T) * scale   (MXU, fp32 accumulate)
      P = softmax(S)            (VPU, fp32, optional causal mask)
      O_h = P V_h               (MXU)

Replaces the cuDNN attention the reference leans on
(nn.MultiheadAttention, models/base/clip.py:116,127-129).

Differentiable via custom_vjp with a reference-math backward (the flagship
path runs under stop_gradient, so the backward is pruned anyway).

Scope note (measured on v5e): fusing MORE into this kernel loses. A variant
that also folded the LayerNorm + qkv projection + out-projection into the
per-batch program ran ~15% SLOWER than XLA's composition (2.15ms vs
1.89ms), because XLA lowers the projections as one large batched GEMM
(B*L x D x 3D) while the per-program kernel serializes 64 small
(197 x 768) matmuls. Keep the kernel at exactly the part XLA does badly —
the per-head S/P/V chain with its HBM-resident score tensor.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_attention_qkv(qkv, num_heads, causal=False):
    """jnp reference on the fused (B, L, 3D) projection; CPU fallback and
    VJP body."""
    b, l, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, num_heads, hd)
    k = k.reshape(b, l, num_heads, hd)
    v = v.reshape(b, l, num_heads, hd)
    scale = hd ** -0.5
    logits = jnp.einsum("blhd,bmhd->bhlm", q * scale, k,
                        preferred_element_type=jnp.float32)
    if causal:
        mask = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
        logits = logits + mask[None, None]
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhlm,bmhd->blhd", p, v)
    return o.reshape(b, l, d)


def _attn_kernel(qkv_ref, o_ref, *, causal, num_heads, d):
    l = qkv_ref.shape[1]
    hd = d // num_heads
    scale = hd ** -0.5
    for h in range(num_heads):
        q = qkv_ref[0, :, h * hd:(h + 1) * hd]
        k = qkv_ref[0, :, d + h * hd:d + (h + 1) * hd]
        v = qkv_ref[0, :, 2 * d + h * hd:2 * d + (h + 1) * hd]
        # fp32 matmul inputs measured FASTEST here (1.03ms vs 1.11ms bf16
        # inputs / 1.39ms post-scale): at these tiny matmul shapes the
        # kernel is softmax/VPU-bound, not MXU-mode-bound
        s = jax.lax.dot_general(
            q.astype(jnp.float32) * scale, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (L, L)
        if causal:
            rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(cols > rows, -jnp.inf, s)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(qkv_ref.dtype), v,
                    preferred_element_type=jnp.float32)
        o_ref[0, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)


def _pallas_attention_qkv(qkv, num_heads, causal=False, interpret=False):
    b, l, d3 = qkv.shape
    d = d3 // 3
    hd = d // num_heads
    kernel = functools.partial(_attn_kernel, causal=causal,
                               num_heads=num_heads, d=d)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, l, d3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * l * l * hd * 2 * b * num_heads,
            bytes_accessed=(d3 + d) * b * l * qkv.dtype.itemsize,
            transcendentals=b * num_heads * l * l,
        ),
    )(qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention_qkv(qkv, num_heads, causal=False):
    """O = multi-head softmax attention from the fused (B, L, 3D)
    projection. Pallas on TPU; jnp reference elsewhere."""
    if qkv.shape[1] > 1024 or jax.default_backend() not in ("tpu", "axon"):
        return _reference_attention_qkv(qkv, num_heads, causal)
    return _pallas_attention_qkv(qkv, num_heads, causal)


def _fwd(qkv, num_heads, causal):
    return fused_attention_qkv(qkv, num_heads, causal), (qkv,)


def _bwd(num_heads, causal, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(
        lambda t: _reference_attention_qkv(t, num_heads, causal), qkv)
    return vjp(g)


fused_attention_qkv.defvjp(_fwd, _bwd)
