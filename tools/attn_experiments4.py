#!/usr/bin/env python3
"""Attention: multi-batch-row grid blocks (amortize per-program overhead)."""
import functools, json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPS = int(os.environ.get("REPS", "30"))

def main():
    import jax, jax.numpy as jnp, numpy as np
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
    B, L, H, HD = 64, 197, 12, 64
    D = H * HD
    qkv = jax.random.normal(rng, (B, L, 3*D), jnp.bfloat16)
    from dist_tpu.ops.attention import _pallas_attention_qkv
    cur = jax.jit(lambda x: _pallas_attention_qkv(x, H, False))

    def kernel_nb(x_ref, o_ref, *, nb, num_heads, d):
        hd = d // num_heads
        scale = hd ** -0.5
        for bi in range(nb):
            for h in range(num_heads):
                q = x_ref[bi, :, h*hd:(h+1)*hd]
                k = x_ref[bi, :, d+h*hd:d+(h+1)*hd]
                v = x_ref[bi, :, 2*d+h*hd:2*d+(h+1)*hd]
                s = jax.lax.dot_general(
                    q.astype(jnp.float32) * scale, k.astype(jnp.float32),
                    (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o = jnp.dot(p.astype(x_ref.dtype), v,
                            preferred_element_type=jnp.float32)
                o_ref[bi, :, h*hd:(h+1)*hd] = o.astype(o_ref.dtype)

    def make_nb(nb):
        def run(x):
            return pl.pallas_call(
                functools.partial(kernel_nb, nb=nb, num_heads=H, d=D),
                grid=(B // nb,),
                in_specs=[pl.BlockSpec((nb, L, 3*D), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((nb, L, D), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
            )(x)
        return run

    timeit("attn_b1", cur, qkv)
    for nb in (2, 4, 8):
        timeit(f"attn_b{nb}", jax.jit(make_nb(nb)), qkv, ref=cur)

if __name__ == "__main__":
    main()
