"""Microbenchmark: int8 vs bf16 GEMM on the MXU (v5e int8 peak is 2x bf16).

Shapes are the frozen-tower GEMMs for DiST ViT-B/16 batch-8 eval
(M = 8 clips x 8 sparse frames x 197 tokens = 12608 rows).

Timing is in-jit repetition (the axon tunnel adds ~2.5ms per dispatch).
The scan carries the WEIGHT matrix (perturbed by one output row each
iteration) so XLA cannot hoist the GEMM, while the per-iteration extra
HBM traffic stays small (one (k,n) elementwise add).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

M = 12608
REPS = 30
SHAPES = [
    (M, 768, 2304),   # qkv proj
    (M, 768, 768),    # out proj
    (M, 768, 3072),   # c_fc
    (M, 3072, 768),   # c_proj
]


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best / REPS


def bench_bf16(m, k, n):
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)

    @jax.jit
    def run(x, w):
        def body(wc, _):
            y = x @ wc
            wc = wc + y[0] * jnp.bfloat16(1e-8)
            return wc, None
        wc, _ = jax.lax.scan(body, w, None, length=REPS)
        return wc

    return timed(run, x, w)


def bench_int8(m, k, n):
    x = jnp.ones((m, k), jnp.int8)
    w = jnp.ones((k, n), jnp.int8)

    @jax.jit
    def run(x, w):
        def body(wc, _):
            y = jax.lax.dot_general(
                x, wc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            wc = (wc.astype(jnp.int32) + y[0] // (1 << 30)).astype(jnp.int8)
            return wc, None
        wc, _ = jax.lax.scan(body, w, None, length=REPS)
        return wc

    return timed(run, x, w)


def bench_int8_dynamic(m, k, n):
    """W8A8 with per-iteration activation quantization (weights quantized
    once outside the loop, activations per-row inside)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)

    @jax.jit
    def run(x, w):
        wmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
        wscale = wmax / 127.0
        wq0 = jnp.round(w / wscale).astype(jnp.int8)

        def body(wq, _):
            xf = x.astype(jnp.float32)
            xmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
            xq = jnp.round(xf * (127.0 / xmax)).astype(jnp.int8)
            y32 = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y32.astype(jnp.float32) * (xmax / 127.0) * wscale
            wq = (wq.astype(jnp.int32)
                  + (y[0] // (1 << 30)).astype(jnp.int32)).astype(jnp.int8)
            return wq, y[0, 0]
        wq, ys = jax.lax.scan(body, wq0, None, length=REPS)
        return wq, ys

    return timed(run, x, w)


if __name__ == "__main__":
    for (m, k, n) in SHAPES:
        flops = 2 * m * k * n
        tb = bench_bf16(m, k, n)
        ti = bench_int8(m, k, n)
        td = bench_int8_dynamic(m, k, n)
        print(f"({m},{k},{n}): bf16 {tb*1e3:.3f}ms {flops/tb/1e12:.1f}TF/s | "
              f"int8 {ti*1e3:.3f}ms {flops/ti/1e12:.1f}TOP/s | "
              f"int8+dynq {td*1e3:.3f}ms {flops/td/1e12:.1f}TOP/s | "
              f"speedup {tb/ti:.2f}x (dynq {tb/td:.2f}x)")
