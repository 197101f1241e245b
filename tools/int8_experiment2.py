"""int8 vs bf16 GEMM, timed with the repo's fori_loop scalar-carry pattern
(same as tools/conv33_experiment.py)."""
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

    M = 12608
    shapes = [(M, 768, 2304), (M, 768, 768), (M, 768, 3072), (M, 3072, 768)]

    def measure(f, x):
        @jax.jit
        def reps(x):
            def body(i, acc):
                y = f(x + (acc * 0).astype(x.dtype))
                return acc * 0.0 + y[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))
        sync(reps(x))
        sync(reps(x))
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            out = reps(x)
        sync(out)
        return (time.perf_counter() - t0) / n / REPS

    rng = jax.random.PRNGKey(0)
    for (m, k, n) in shapes:
        flops = 2 * m * k * n
        xb = jax.random.normal(rng, (m, k), jnp.bfloat16)
        wb = jax.random.normal(rng, (k, n), jnp.bfloat16)
        tb = measure(lambda x, w=wb: x @ w, xb)

        xi = jnp.ones((m, k), jnp.int8)
        wi = jnp.ones((k, n), jnp.int8)
        ti = measure(lambda x, w=wi: jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32), xi)

        wq = jnp.round(wb.astype(jnp.float32) * 10).astype(jnp.int8)
        wscale = jnp.full((1, n), 0.1, jnp.float32)

        def dynq(x, wq=wq, wscale=wscale):
            xf = x.astype(jnp.float32)
            xmax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
            xq = jnp.round(xf * (127.0 / xmax)).astype(jnp.int8)
            y32 = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return (y32.astype(jnp.float32) * (xmax / 127.0) * wscale
                    ).astype(jnp.bfloat16)
        td = measure(dynq, xb)

        print(json.dumps({
            "shape": [m, k, n],
            "bf16_ms": round(tb * 1e3, 3), "bf16_tfs": round(flops / tb / 1e12, 1),
            "int8_ms": round(ti * 1e3, 3), "int8_tops": round(flops / ti / 1e12, 1),
            "dynq_ms": round(td * 1e3, 3),
            "speedup": round(tb / ti, 2), "dynq_speedup": round(tb / td, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
