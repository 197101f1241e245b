#!/usr/bin/env python3
"""TemporalNet (1,3,3) conv: nn.Conv vs shift-concat matmul, fwd+bwd."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPS = int(os.environ.get("REPS", "20"))

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
    def tree_sum(t_):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(t_) if hasattr(l, "dtype"))

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(rng, (8, 16, 14, 14, 96), dt)
    C = 96
    kern = jax.random.normal(rng, (1, 3, 3, C, C), jnp.bfloat16) * 0.05
    bias = jnp.zeros((C,), jnp.float32)

    conv = nn.Conv(C, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                   dtype=dt, param_dtype=jnp.float32)
    cv = {"params": {"kernel": kern.astype(jnp.float32), "bias": bias}}

    def conv_fn(x):
        return conv.apply(cv, x)

    w_cat = kern.reshape(9, C, C).transpose(1, 0, 2).reshape(C, 9 * C)
    # matmul formulation: y = x @ W_cat (C -> 9C), out = sum of 9 spatially
    # shifted lane slices (exact shift-add dual of the 3x3 conv)
    def mm_fn(x):
        b, t, h, w_, c = x.shape
        y = x @ w_cat.astype(x.dtype)
        yp = jnp.pad(y, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        i = 0
        for dy in range(3):
            for dx in range(3):
                sl = yp[:, :, dy:dy + h, dx:dx + w_, i * C:(i + 1) * C]
                out = sl if out is None else out + sl
                i += 1
        return out + bias.astype(x.dtype)

    # correctness
    a = np.asarray(jax.device_get(jax.jit(conv_fn)(x)), np.float32)
    b = np.asarray(jax.device_get(jax.jit(mm_fn)(x)), np.float32)
    print(json.dumps({"check": "max_abs_diff", "v": float(np.max(np.abs(a - b)))}),
          flush=True)

    for name, f in (("conv33_bwd", conv_fn), ("mm33_bwd", mm_fn)):
        gfn = jax.grad(lambda xx: jnp.sum(f(xx).astype(jnp.float32)))

        @jax.jit
        def reps(x):
            def body(i, acc):
                return acc * 0.0 + tree_sum(gfn(x + (acc * 0).astype(x.dtype)))
            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))
        t0 = time.perf_counter(); sync(reps(x)); cs = time.perf_counter()-t0
        for _ in range(2): sync(reps(x))
        n = 3; t0 = time.perf_counter()
        for _ in range(n): out = reps(x)
        sync(out)
        per = (time.perf_counter()-t0)/n/REPS
        print(json.dumps({"variant": name, "ms": round(per*1e3, 3),
                          "compile_s": round(cs, 1)}), flush=True)

if __name__ == "__main__":
    main()
