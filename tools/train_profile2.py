#!/usr/bin/env python3
"""Backward-pass component timing: dist_net and stem fwd+bwd in isolation."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPS = int(os.environ.get("REPS", "15"))
BATCH = int(os.environ.get("BENCH_BATCH", "8"))

def main():
    import jax, jax.numpy as jnp, numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dist_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    from dist_tpu.models.dist.dist_net import DiSTConfig, DiSTNetwork, TemporalPatchStem

    cfg = DiSTConfig(selected_layers=tuple(range(12)), num_frames=16, alpha=2)
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (BATCH, 16, 224, 224, 3), jnp.float32)
    taps = jax.random.normal(rng, (12, BATCH * 8, 197, 768), dt)

    def sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

    def tree_sum(t):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(t) if hasattr(l, "dtype"))

    def bench(name, reps_jit, *args):
        t0 = time.perf_counter(); sync(reps_jit(*args)); cs = time.perf_counter()-t0
        for _ in range(2): sync(reps_jit(*args))
        n = 3; t0 = time.perf_counter()
        for _ in range(n): out = reps_jit(*args)
        sync(out)
        per = (time.perf_counter()-t0)/n/REPS
        print(json.dumps({"component": name, "ms": round(per*1e3, 2),
                          "compile_s": round(cs, 1)}), flush=True)

    dist = DiSTNetwork(cfg=cfg, d_model=768, output_dim=512, dtype=dt)
    dvars = dist.init(rng, video, taps)
    gfn = jax.grad(lambda v, vid, tp: jnp.sum(
        dist.apply(v, vid, tp).astype(jnp.float32)))

    @jax.jit
    def dist_bwd_reps(v, vid, tp):
        def body(i, acc):
            return acc * 0.0 + tree_sum(
                gfn(v, vid + (acc * 0).astype(vid.dtype), tp))
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    bench("dist_fwd_bwd", dist_bwd_reps, dvars, video, taps)

    stem = TemporalPatchStem(channels=96, t_patch=5, s_patch=16, dtype=dt)
    svars = stem.init(rng, video)
    sgfn = jax.grad(lambda v, vid: jnp.sum(
        stem.apply(v, vid).astype(jnp.float32)))

    @jax.jit
    def stem_bwd_reps(v, vid):
        def body(i, acc):
            return acc * 0.0 + tree_sum(
                sgfn(v, vid + (acc * 0).astype(vid.dtype)))
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    bench("stem_fwd_bwd", stem_bwd_reps, svars, video)

if __name__ == "__main__":
    main()
