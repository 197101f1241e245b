"""Shared transformer building blocks (flax.linen).

TPU-native counterparts of the reference's CLIP primitives
(``models/base/clip.py:112-215``):

- :class:`LayerNorm` — fp32 compute island under bf16 activations
  (reference ``models/base/clip.py:181-187``),
- :func:`quick_gelu` — ``x * sigmoid(1.702 x)`` (``clip.py:199-201``),
- :class:`MultiheadAttention` — fused-QKV projection (one MXU matmul,
  matching torch ``nn.MultiheadAttention``'s ``in_proj_weight`` math at
  ``clip.py:116,127-129``), with optional causal masking and
  cross-attention,
- :class:`ResidualAttentionBlock` — pre-LN attention + MLP residual block
  (``clip.py:112-135``).

Layout convention: activations are ``(batch, tokens, dim)`` (NLD). The
reference uses torch's LND; the batch-major layout maps better onto XLA's
batched matmul tiling and needs no permutes around the attention.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32 regardless of activation dtype.

    Mirrors the reference's fp16-safe LayerNorm (models/base/clip.py:181-187):
    cast up, normalize, cast back. Params are fp32.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(orig_dtype)


class MultiheadAttention(nn.Module):
    """Multi-head attention with a fused QKV projection.

    Parameter layout intentionally matches torch ``nn.MultiheadAttention``
    modulo transposition so the checkpoint converter is a pure reshape:

    - ``in_proj_weight``: (dim, 3*dim)  [torch: (3*dim, dim)]
    - ``in_proj_bias``:   (3*dim,)
    - ``out_proj``: Dense with kernel (dim, dim)

    Softmax runs in fp32 (TPU-safe under bf16 activations).
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    causal: bool = False
    fused: bool = True  # Pallas fused attention on TPU for self-attention

    @nn.compact
    def __call__(self, query, key_value=None, mask: Optional[jax.Array] = None):
        dim = query.shape[-1]
        head_dim = dim // self.num_heads
        assert head_dim * self.num_heads == dim

        w_in = self.param(
            "in_proj_weight",
            nn.initializers.normal(stddev=dim ** -0.5),
            (dim, 3 * dim), jnp.float32,
        ).astype(self.dtype)
        b_in = self.param(
            "in_proj_bias", nn.initializers.zeros, (3 * dim,), jnp.float32
        ).astype(self.dtype)

        if key_value is None:
            # self-attention: one fused (B, L, 3D) matmul for the MXU
            qkv = query @ w_in + b_in
            if self.fused and mask is None:
                # Pallas kernel consumes the fused projection directly
                from dist_tpu.ops.attention import fused_attention_qkv
                out = fused_attention_qkv(qkv, self.num_heads, self.causal)
                return nn.Dense(dim, dtype=self.dtype,
                                param_dtype=jnp.float32, name="out_proj")(out)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            wq, wk, wv = jnp.split(w_in, 3, axis=1)
            bq, bk, bv = jnp.split(b_in, 3, axis=0)
            q = query @ wq + bq
            k = key_value @ wk + bk
            v = key_value @ wv + bv

        def split_heads(t):
            b, l, _ = t.shape
            return t.reshape(b, l, self.num_heads, head_dim)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = head_dim ** -0.5
        logits = jnp.einsum(
            "blhd,bmhd->bhlm", q * scale, k,
            preferred_element_type=jnp.float32
        )
        if self.causal:
            l = query.shape[1]
            cmask = jnp.triu(jnp.full((l, l), -jnp.inf, jnp.float32), k=1)
            logits = logits + cmask[None, None]
        if mask is not None:
            logits = logits + mask
        weights = jax.nn.softmax(
            logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhlm,bmhd->blhd", weights, v)
        out = out.reshape(out.shape[0], out.shape[1], dim)
        out = nn.Dense(
            dim, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj"
        )(out)
        return out


class MLP(nn.Module):
    """CLIP-style MLP: c_fc -> QuickGELU -> c_proj (clip.py:118-122)."""

    hidden_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="c_fc")(x)
        x = quick_gelu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="c_proj")(x)
        return x


class ResidualAttentionBlock(nn.Module):
    """Pre-LN transformer block (clip.py:112-135).

    ``causal`` adds the text tower's upper-triangular -inf mask
    (clip.py:404-410) inside the block so no mask tensor is threaded.
    """

    num_heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x + MultiheadAttention(
            self.num_heads, dtype=self.dtype, causal=self.causal, name="attn"
        )(LayerNorm(name="ln_1")(x))
        dim = x.shape[-1]
        x = x + MLP(dim * 4, dim, dtype=self.dtype, name="mlp")(
            LayerNorm(name="ln_2")(x)
        )
        return x


class CrossAttentionBlock(nn.Module):
    """Cross-attention with a shared pre-LN on q/k/v
    (reference ``CrossAttentionBlockGenral``, clip.py:139-147)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key_value):
        ln = LayerNorm(name="ln_1")
        return MultiheadAttention(self.num_heads, dtype=self.dtype, name="attn")(
            ln(query), key_value=ln(key_value)
        )
