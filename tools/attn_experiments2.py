#!/usr/bin/env python3
"""Round-2 kernel experiments (in-jit repetition timing).

1. stem_new vs stem_conv — TemporalPatchStem GEMM reformulation payoff
2. attention variants that avoid Mosaic's unsupported lane-split reshape:
   - bhl: (B,H,L,3hd) input layout (XLA-side rearrange included in the
     timing), batched in-kernel dot_general over the head dim
   - tsoftmax: current layout, S computed transposed so the softmax
     reduction runs along sublanes instead of lanes
   - bf16exp: current kernel but exp/softmax in bf16
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

    def sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

    def timeit(name, reps_fn, *args, ref_fn=None, one_fn=None):
        try:
            t0 = time.perf_counter()
            sync(reps_fn(*args))
            compile_s = time.perf_counter() - t0
            rmax = None
            if ref_fn is not None and one_fn is not None:
                got = np.asarray(jax.device_get(one_fn(*args)), np.float32)
                want = np.asarray(jax.device_get(ref_fn(*args)), np.float32)
                rmax = float(np.max(np.abs(got - want)))
            for _ in range(2):
                sync(reps_fn(*args))
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                out = reps_fn(*args)
            sync(out)
            per = (time.perf_counter() - t0) / n / REPS
            print(json.dumps({"variant": name, "ms": round(per * 1e3, 3),
                              "compile_s": round(compile_s, 1),
                              "max_abs_diff": rmax}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[-400:]}),
                  flush=True)

    def make_reps(f, x):
        @jax.jit
        def reps(x):
            def body(i, carry):
                # carry-dependent input defeats CSE; mean consumes the output
                out = f(x + carry * 1e-12)
                return jnp.mean(out, dtype=jnp.float32)
            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))
        return reps

    rng = jax.random.PRNGKey(0)

    # ---- stem ----
    import flax.linen as nn
    from dist_tpu.models.dist.dist_net import TemporalPatchStem
    video = jax.random.normal(rng, (8, 16, 224, 224, 3), jnp.float32)
    stem = TemporalPatchStem(channels=96, t_patch=5, s_patch=16,
                             dtype=jnp.bfloat16)
    sv = stem.init(rng, video)
    conv = nn.Conv(96, (5, 16, 16), strides=(1, 16, 16),
                   padding=((2, 2), (0, 0), (0, 0)), dtype=jnp.bfloat16,
                   param_dtype=jnp.float32)
    cv = {"params": {"kernel": sv["params"]["kernel"],
                     "bias": sv["params"]["bias"]}}
    timeit("stem_new", make_reps(lambda x: stem.apply(sv, x), video), video)
    timeit("stem_conv", make_reps(
        lambda x: conv.apply(cv, x.astype(jnp.bfloat16)), video), video)

    # ---- attention ----
    B, L, H, HD = 64, 197, 12, 64
    D = H * HD
    qkv = jax.random.normal(rng, (B, L, 3 * D), jnp.bfloat16)
    from dist_tpu.ops.attention import _pallas_attention_qkv

    cur = jax.jit(lambda x: _pallas_attention_qkv(x, H, False))

    def bhl_kernel(x_ref, o_ref, *, hd):
        # x_ref (1, H, L, 3hd)
        q = x_ref[0, :, :, :hd].astype(jnp.float32) * (hd ** -0.5)
        k = x_ref[0, :, :, hd:2 * hd].astype(jnp.float32)
        v = x_ref[0, :, :, 2 * hd:]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(x_ref.dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o_ref[0] = o.astype(o_ref.dtype)

    def bhl(qkv):
        x = qkv.reshape(B, L, 3, H, HD).transpose(0, 3, 1, 2, 4)
        x = x.reshape(B, H, L, 3 * HD)
        o = pl.pallas_call(
            functools.partial(bhl_kernel, hd=HD),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, H, L, 3 * HD), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, L, HD), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, L, HD), qkv.dtype),
        )(x)
        return o.transpose(0, 2, 1, 3).reshape(B, L, D)

    def tsoftmax_kernel(x_ref, o_ref, *, num_heads, d):
        hd = d // num_heads
        scale = hd ** -0.5
        for h in range(num_heads):
            q = x_ref[0, :, h * hd:(h + 1) * hd]
            k = x_ref[0, :, d + h * hd:d + (h + 1) * hd]
            v = x_ref[0, :, 2 * d + h * hd:2 * d + (h + 1) * hd]
            st = jax.lax.dot_general(
                k.astype(jnp.float32), q.astype(jnp.float32) * scale,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (Lk, Lq)
            st = st - jnp.max(st, axis=0, keepdims=True)
            p = jnp.exp(st)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(x_ref.dtype), v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (Lq, hd)
            o_ref[0, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)

    def bf16exp_kernel(x_ref, o_ref, *, num_heads, d):
        hd = d // num_heads
        scale = hd ** -0.5
        for h in range(num_heads):
            q = x_ref[0, :, h * hd:(h + 1) * hd]
            k = x_ref[0, :, d + h * hd:d + (h + 1) * hd]
            v = x_ref[0, :, 2 * d + h * hd:2 * d + (h + 1) * hd]
            s = jax.lax.dot_general(
                q.astype(jnp.float32) * scale, k.astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s.astype(jnp.bfloat16))
            denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
            p = (p.astype(jnp.float32) / denom).astype(x_ref.dtype)
            o = jnp.dot(p, v, preferred_element_type=jnp.float32)
            o_ref[0, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)

    def make_cur_layout(kernel):
        def run(x):
            return pl.pallas_call(
                functools.partial(kernel, num_heads=H, d=D),
                grid=(B,),
                in_specs=[pl.BlockSpec((1, L, 3 * D), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((1, L, D), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
            )(x)
        return run

    variants = {
        "attn_current": cur,
        "attn_bhl": jax.jit(bhl),
        "attn_tsoftmax": jax.jit(make_cur_layout(tsoftmax_kernel)),
        "attn_bf16exp": jax.jit(make_cur_layout(bf16exp_kernel)),
    }
    for name, f in variants.items():
        timeit(name, make_reps(f, qkv), qkv, ref_fn=cur, one_fn=jax.jit(f))


if __name__ == "__main__":
    main()
