#!/usr/bin/env python3
"""Attention kernel variants, timed with in-jit repetition (a lax loop over
the op inside ONE jit) so the ~2.5ms axon per-dispatch floor doesn't
contaminate sub-millisecond measurements.

Shape under test: the B/16 tower attention, qkv (64, 197, 3*768), 12 heads.

Variants:
  current     the shipped per-head-loop kernel
  batched     in-kernel (H,L,hd) batched dot_general
  pack2/pack4 block-diagonal head packing (g heads per MXU dot, K=g*64 wide)
  xla         plain jnp reference (XLA lowering)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("REPS", "30"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dist_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    B, L, H, HD = 64, 197, 12, 64
    D = H * HD
    rng = jax.random.PRNGKey(0)
    qkv = jax.random.normal(rng, (B, L, 3 * D), jnp.bfloat16)

    from dist_tpu.ops.attention import (_pallas_attention_qkv,
                                        _reference_attention_qkv)

    def pack_kernel(qkv_ref, o_ref, *, g, num_heads, d):
        """g heads per dot via block-diagonal K^T / V packing: the MXU's
        128-wide K tile is half idle at hd=64; packing 2 heads fills it."""
        hd = d // num_heads
        scale = hd ** -0.5
        l = qkv_ref.shape[1]
        for base in range(0, num_heads, g):
            qs = [qkv_ref[0, :, (base + j) * hd:(base + j + 1) * hd]
                  for j in range(g)]
            ks = [qkv_ref[0, :, d + (base + j) * hd:d + (base + j + 1) * hd]
                  for j in range(g)]
            vs = [qkv_ref[0, :, 2 * d + (base + j) * hd:2 * d + (base + j + 1) * hd]
                  for j in range(g)]
            q2 = jnp.concatenate(qs, axis=1).astype(jnp.float32) * scale
            # K' block-diag: (g*hd, g*L); column block j is K_j^T
            kt_blocks = []
            for j in range(g):
                cols = []
                for jj in range(g):
                    blk = ks[j].astype(jnp.float32).T  # (hd, L)
                    cols.append(blk if j == jj else jnp.zeros_like(blk))
                kt_blocks.append(jnp.concatenate(cols, axis=1))
            kt = jnp.concatenate(kt_blocks, axis=0)  # (g*hd, g*L)
            s = jax.lax.dot_general(
                q2, kt, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (L, g*L)
            # per-head softmax on each (L, L) column block
            s = s.reshape(l, g, l)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).reshape(l, g * l)
            # V' block-diag: (g*L, g*hd)
            v_blocks = []
            for j in range(g):
                cols = []
                for jj in range(g):
                    blk = vs[j]
                    cols.append(blk if j == jj else jnp.zeros_like(blk))
                v_blocks.append(jnp.concatenate(cols, axis=1))
            vb = jnp.concatenate(v_blocks, axis=0)
            o = jnp.dot(p.astype(qkv_ref.dtype), vb,
                        preferred_element_type=jnp.float32)  # (L, g*hd)
            o_ref[0, :, base * hd:(base + g) * hd] = o.astype(o_ref.dtype)

    def batched_kernel(qkv_ref, o_ref, *, num_heads, d):
        hd = d // num_heads
        scale = hd ** -0.5
        l = qkv_ref.shape[1]
        q = qkv_ref[0, :, :d].reshape(l, num_heads, hd)
        k = qkv_ref[0, :, d:2 * d].reshape(l, num_heads, hd)
        v = qkv_ref[0, :, 2 * d:].reshape(l, num_heads, hd)
        q = jnp.transpose(q, (1, 0, 2)).astype(jnp.float32) * scale
        k = jnp.transpose(k, (1, 0, 2)).astype(jnp.float32)
        v = jnp.transpose(v, (1, 0, 2))
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (H, L, L)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(qkv_ref.dtype)
        o = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (H, L, hd)
        o = jnp.transpose(o, (1, 0, 2)).reshape(l, d)
        o_ref[0] = o.astype(o_ref.dtype)

    def make_pallas(kernel, **kw):
        def run(x):
            b, l, d3 = x.shape
            d = d3 // 3
            return pl.pallas_call(
                functools.partial(kernel, d=d, **kw),
                grid=(b,),
                in_specs=[pl.BlockSpec((1, l, d3), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((b, l, d), x.dtype),
            )(x)
        return run

    variants = {
        "current": lambda x: _pallas_attention_qkv(x, H, False),
        "batched": make_pallas(batched_kernel, num_heads=H),
        "pack2": make_pallas(pack_kernel, g=2, num_heads=H),
        "pack4": make_pallas(pack_kernel, g=4, num_heads=H),
        "xla": lambda x: _reference_attention_qkv(x, H, False),
    }

    ref = None
    want = sys.argv[1:] or list(variants)
    for name in want:
        f = variants[name]

        @jax.jit
        def reps(qkv, f=f):
            def body(i, carry):
                out = f(qkv + carry[0, 0, :1].astype(qkv.dtype) * 1e-12)
                return jnp.concatenate([out, out, out], axis=-1)
            return jax.lax.fori_loop(0, REPS, body, qkv)

        try:
            t0 = time.perf_counter()
            out = reps(qkv)
            np.asarray(jax.device_get(out[0, 0, :1]))
            compile_s = time.perf_counter() - t0
            # correctness vs reference
            single = jax.jit(f)(qkv)
            got = np.asarray(jax.device_get(single), np.float32)
            if ref is None and name == "current":
                ref = got
            rmax = None
            if ref is not None:
                rmax = float(np.max(np.abs(got - ref)))
            for _ in range(2):
                out = reps(qkv)
            np.asarray(jax.device_get(out[0, 0, :1]))
            t0 = time.perf_counter()
            n = 5
            for _ in range(n):
                out = reps(qkv)
            np.asarray(jax.device_get(out[0, 0, :1]))
            per = (time.perf_counter() - t0) / n / REPS
            print(json.dumps({"variant": name, "ms": round(per * 1e3, 3),
                              "compile_s": round(compile_s, 1),
                              "max_abs_diff": rmax}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
