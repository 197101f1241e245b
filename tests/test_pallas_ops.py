"""Pallas kernel correctness (interpret mode on CPU; the same kernel code
compiles via Mosaic on TPU)."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_tpu.ops.attention import (
    _pallas_attention_qkv,
    _reference_attention_qkv,
)


@pytest.mark.parametrize("causal", [False, True])
def test_fused_attention_qkv_matches_reference(causal):
    rng = jax.random.PRNGKey(0)
    b, l, h, hd = 3, 29, 4, 16
    qkv = jax.random.normal(rng, (b, l, 3 * h * hd), jnp.float32)
    ref = _reference_attention_qkv(qkv, h, causal)
    pal = _pallas_attention_qkv(qkv, h, causal, interpret=True)
    np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=1e-5)


def test_fused_attention_backward_matches_reference():
    """custom_vjp backward equals the reference gradient."""
    from dist_tpu.ops.attention import fused_attention_qkv

    rng = jax.random.PRNGKey(1)
    qkv = jax.random.normal(rng, (2, 9, 3 * 2 * 8), jnp.float32)

    def loss_fused(x):
        return jnp.sum(fused_attention_qkv(x, 2) ** 2)

    def loss_ref(x):
        return jnp.sum(_reference_attention_qkv(x, 2) ** 2)

    g1 = jax.grad(loss_fused)(qkv)
    g2 = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
