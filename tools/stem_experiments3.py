#!/usr/bin/env python3
"""Stem: transpose-free 16-matmul decomposition + tower conv1 comparison."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPS = int(os.environ.get("REPS", "30"))

def main():
    import jax, jax.numpy as jnp, numpy as np
    import flax.linen as nn
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
    kern = jax.random.normal(rng, (tp, p, p, 3, C), jnp.bfloat16)

    # shipped formulation (patchify transpose + GEMM + lane-slice shifts)
    def patchify(x):
        b, t, h, w_, ci = x.shape
        hh, ww = h // p, w_ // p
        x = x.astype(jnp.bfloat16).reshape(b, t, hh, p, ww, p, ci)
        return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, hh*ww, p*p*ci)
    w_flat = kern.reshape(tp, p*p*3, C)
    w_all = jnp.transpose(w_flat, (1, 0, 2)).reshape(p*p*3, tp*C)
    def tail(y):
        pad = tp // 2
        yp = jnp.pad(y, ((0,0),(pad,pad),(0,0),(0,0)))
        out = yp[:, 0:T, :, 0:C]
        for d in range(1, tp):
            out = out + yp[:, d:d+T, :, d*C:(d+1)*C]
        return out
    def stem_transpose(x):
        return tail(patchify(x) @ w_all)

    # transpose-free: one matmul per within-patch row offset dh.
    # x (b,t,H,W,3) -> rows dh::16 -> (b,t,14,14,48) via FREE reshapes,
    # contracted against W[dh] (48, tp*C); accumulate over dh.
    wk = jnp.transpose(kern, (1, 2, 3, 0, 4))  # (p, p, 3, tp, C)
    w_dh = wk.reshape(p, p*3, tp*C)            # per-offset (48, tp*C)
    def stem_rows(x):
        b, t, H, W, ci = x.shape
        hh = H // p
        xb = x.astype(jnp.bfloat16).reshape(b, t, hh, p, W * ci)
        acc = None
        for dh in range(p):
            rows = xb[:, :, :, dh, :].reshape(b, t, hh, W // p, p * ci)
            y = jax.lax.dot_general(
                rows, w_dh[dh], (((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        y = acc.astype(jnp.bfloat16).reshape(b, t, hh * (W // p), tp * C)
        return tail(y)

    ref = jax.jit(stem_transpose)
    timeit("stem_transpose", stem_transpose, video)
    timeit("stem_rows", stem_rows, video, ref=ref)

    # tower conv1 geometry: 3 -> 768, (16,16)/16 over 128 frames
    conv1 = nn.Conv(768, (p, p), strides=(p, p), padding="VALID",
                    use_bias=False, dtype=jnp.bfloat16, param_dtype=jnp.float32)
    frames = video.reshape(128, 224, 224, 3)
    cv = conv1.init(rng, frames)
    timeit("tower_conv1", lambda x: conv1.apply(cv, x.astype(jnp.bfloat16)),
           frames)
    # conv1 on the 8 sparse frames only (half the work: sparse-before-conv)
    timeit("tower_conv1_sparse", lambda x: conv1.apply(
        cv, x.astype(jnp.bfloat16)), frames[::2])

if __name__ == "__main__":
    main()
