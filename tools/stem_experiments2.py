#!/usr/bin/env python3
"""Stem: isolate the patchify->GEMM fusion pathology."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPS = int(os.environ.get("REPS", "30"))

def main():
    import jax, jax.numpy as jnp, numpy as np
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
            t0 = time.perf_counter(); sync(reps_fn(x)); cs = time.perf_counter()-t0
            rmax = None
            if ref is not None:
                got = np.asarray(jax.device_get(jax.jit(f)(x)), np.float32)
                want = np.asarray(jax.device_get(ref(x)), np.float32)
                rmax = float(np.max(np.abs(got - want)))
            for _ in range(2): sync(reps_fn(x))
            n = 5; t0 = time.perf_counter()
            for _ in range(n): out = reps_fn(x)
            sync(out)
            per = (time.perf_counter()-t0)/n/REPS
            print(json.dumps({"variant": name, "ms": round(per*1e3,3),
                              "compile_s": round(cs,1), "max_abs_diff": rmax}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[-300:]}), flush=True)

    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (8, 16, 224, 224, 3), jnp.float32)
    p, tp, C, T = 16, 5, 96, 16
    kern = jax.random.normal(rng, (tp, p*p*3, C), jnp.bfloat16)
    w_all = jnp.transpose(kern, (1, 0, 2)).reshape(p*p*3, tp*C)

    def patchify(x):
        b, t, h, w_, ci = x.shape
        hh, ww = h // p, w_ // p
        x = x.astype(jnp.bfloat16).reshape(b, t, hh, p, ww, p, ci)
        return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, hh*ww, p*p*ci)

    def tail(y):
        pad = tp // 2
        yp = jnp.pad(y, ((0,0),(pad,pad),(0,0),(0,0)))
        out = yp[:, 0:T, :, 0:C]
        for d in range(1, tp):
            out = out + yp[:, d:d+T, :, d*C:(d+1)*C]
        return out

    def stem_fused(x):
        return tail(patchify(x) @ w_all)

    def stem_barrier(x):
        xp = jax.lax.optimization_barrier(patchify(x))
        return tail(xp @ w_all)

    def stem_gemm_barrier_after(x):
        y = jax.lax.optimization_barrier(patchify(x) @ w_all)
        return tail(y)

    def gemm_tail_only(xp):
        return tail(xp @ w_all)

    ref = jax.jit(stem_fused)
    timeit("stem_fused", stem_fused, video)
    timeit("stem_barrier", stem_barrier, video, ref=ref)
    timeit("stem_barrier_after", stem_gemm_barrier_after, video, ref=ref)
    xp = patchify(video)
    timeit("gemm_tail_only", gemm_tail_only, xp)
    timeit("tail_only", tail, xp @ w_all)

if __name__ == "__main__":
    main()
