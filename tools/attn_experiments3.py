#!/usr/bin/env python3
"""Round-3: (a) combined transposed-softmax + bf16-exp attention kernel,
(b) stem bottleneck isolation (what do 2.7ms actually pay for?)."""

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

    def make_reps(f, x):
        @jax.jit
        def reps(x):
            def body(i, carry):
                out = f(x + carry * 1e-12)
                return jnp.mean(out, dtype=jnp.float32)
            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))
        return reps

    def timeit(name, f, x, ref=None):
        try:
            reps_fn = make_reps(f, x)
            t0 = time.perf_counter()
            sync(reps_fn(x))
            compile_s = time.perf_counter() - t0
            rmax = None
            if ref is not None:
                got = np.asarray(jax.device_get(jax.jit(f)(x)), np.float32)
                want = np.asarray(jax.device_get(ref(x)), np.float32)
                rmax = float(np.max(np.abs(got - want)))
            for _ in range(2):
                sync(reps_fn(x))
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                out = reps_fn(x)
            sync(out)
            per = (time.perf_counter() - t0) / n / REPS
            print(json.dumps({"variant": name, "ms": round(per * 1e3, 3),
                              "compile_s": round(compile_s, 1),
                              "max_abs_diff": rmax}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[-400:]}),
                  flush=True)

    rng = jax.random.PRNGKey(0)
    B, L, H, HD = 64, 197, 12, 64
    D = H * HD
    qkv = jax.random.normal(rng, (B, L, 3 * D), jnp.bfloat16)
    from dist_tpu.ops.attention import _pallas_attention_qkv
    cur = jax.jit(lambda x: _pallas_attention_qkv(x, H, False))

    def combo_kernel(x_ref, o_ref, *, num_heads, d):
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
            p = jnp.exp(st.astype(jnp.bfloat16)).astype(jnp.float32)
            p = (p / jnp.sum(p, axis=0, keepdims=True)).astype(x_ref.dtype)
            o = jax.lax.dot_general(
                p, v, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[0, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)

    def run_combo(x):
        return pl.pallas_call(
            functools.partial(combo_kernel, num_heads=H, d=D),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, L, 3 * D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, L, D), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        )(x)

    timeit("attn_current", lambda x: _pallas_attention_qkv(x, H, False), qkv)
    timeit("attn_combo", run_combo, qkv, ref=cur)

    # ---- stem isolation ----
    video = jax.random.normal(rng, (8, 16, 224, 224, 3), jnp.float32)
    video_bf = video.astype(jnp.bfloat16)
    p, tp, C = 16, 5, 96
    w_all = jax.random.normal(rng, (p * p * 3, tp * C), jnp.bfloat16)

    def patchify(x):
        b, t, h, w, ci = x.shape
        hh, ww = h // p, w // p
        x = x.astype(jnp.bfloat16).reshape(b, t, hh, p, ww, p, ci)
        return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, hh * ww, p * p * ci)

    timeit("video_mean", lambda x: jnp.mean(x, dtype=jnp.float32)[None], video)
    timeit("patchify_only", lambda x: patchify(x).sum(axis=(2, 3)), video)
    xp = patchify(video)

    def gemm_only(x):
        y = x @ w_all
        return y.sum(axis=2)

    timeit("gemm_only", gemm_only, xp)

    def stem_full(x):
        y = patchify(x) @ w_all
        b, t = y.shape[0], y.shape[1]
        y = y.reshape(b, t, 196, tp, C)
        pad = tp // 2
        ypad = jnp.pad(y, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
        out = ypad[:, 0:t, :, 0, :]
        for d_ in range(1, tp):
            out = out + ypad[:, d_:d_ + t, :, d_, :]
        return out

    timeit("stem_gemm_full", stem_full, video)
    # uint8 input end-to-end (the real pipeline feeds uint8)
    vid_u8 = jax.random.randint(rng, (8, 16, 224, 224, 3), 0, 255,
                                jnp.int32).astype(jnp.uint8)
    timeit("stem_from_u8", lambda x: stem_full(
        (x.astype(jnp.float32) - 127.5) / 57.0), vid_u8)


if __name__ == "__main__":
    main()
