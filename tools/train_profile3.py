#!/usr/bin/env python3
"""Ladder backward: per-module fwd+bwd, and a remat-scan variant."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPS = int(os.environ.get("REPS", "20"))
B = int(os.environ.get("BENCH_BATCH", "8"))

def main():
    import jax, jax.numpy as jnp, numpy as np
    import flax.linen as nn
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dist_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    from dist_tpu.models.dist import dist_net as D

    cfg = D.DiSTConfig(selected_layers=tuple(range(12)), num_frames=16, alpha=2)
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    t = 8
    bt = B * t
    x_temporal = jax.random.normal(rng, (B, 16, 14, 14, 96), dt)
    mid = jax.random.normal(rng, (bt, 197, 384), dt)
    tap = jax.random.normal(rng, (bt, 197, 768), dt)
    video = jax.random.normal(rng, (B, 16, 224, 224, 3), jnp.float32)
    # ladder xs are the PROJECTED taps since StackedInputLinear hoisted
    # the 768->384 projections out of the scan (dist_net.py)
    taps = jax.random.normal(rng, (12, bt, 197, 384), dt)

    def sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

    def tree_sum(t_):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(t_) if hasattr(l, "dtype"))

    def bench_bwd(name, module, *args):
        try:
            variables = module.init(rng, *args)
            gfn = jax.grad(lambda v, a0, rest: jnp.sum(
                module.apply(v, a0, *rest).astype(jnp.float32)), argnums=(0, 1))

            @jax.jit
            def reps(v, a0, rest):
                def body(i, acc):
                    gv, gx = gfn(v, a0 + (acc * 0).astype(a0.dtype), rest)
                    return acc * 0.0 + tree_sum(gv) + tree_sum(gx)
                return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

            t0 = time.perf_counter(); sync(reps(variables, args[0], args[1:]))
            cs = time.perf_counter() - t0
            for _ in range(2): sync(reps(variables, args[0], args[1:]))
            n = 3; t0 = time.perf_counter()
            for _ in range(n): out = reps(variables, args[0], args[1:])
            sync(out)
            per = (time.perf_counter()-t0)/n/REPS
            print(json.dumps({"component": name, "ms": round(per*1e3, 3),
                              "compile_s": round(cs, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"component": name, "error": str(e)[-250:]}), flush=True)

    bench_bwd("temporal_net_bwd", D.TemporalNet(cfg, dt), x_temporal)
    bench_bwd("integration_bwd", D.IntegrationNetwork(cfg, dt), mid)
    bench_bwd("t2i_bwd", D.Temporal2Integration(cfg, dt), x_temporal)
    bench_bwd("i2t_bwd", D.Integration2Temporal(cfg, dt), mid)
    bench_bwd("input_linear_bwd",
              nn.Dense(384, dtype=dt, param_dtype=jnp.float32), tap)
    top_cls = jax.random.normal(rng, (B, 1, 384), dt)
    sp_cls = jax.random.normal(rng, (bt, 1, 384), dt)
    bench_bwd("adapool_bwd", D.AdaPooling(cfg, dt), mid, top_cls, sp_cls)

    # full dist bwd with a REMAT ladder
    class RematDist(D.DiSTNetwork):
        @nn.compact
        def __call__(self, video, taps_selected):
            c = self.cfg.integration_dim
            t_ = self.cfg.num_frames // self.cfg.alpha
            n_sel, bt_ = taps_selected.shape[0], taps_selected.shape[1]
            b = bt_ // t_
            x_temporal = D.TemporalPatchStem(
                channels=self.cfg.temporal_dim, t_patch=self.cfg.t_patch_size,
                s_patch=self.cfg.s_patch_size, dtype=self.dtype,
                name="temporal_stem")(video)
            Ladder = nn.scan(nn.remat(D._LadderStep),
                             variable_axes={"params": 0},
                             split_rngs={"params": True})
            zeros_mid = jnp.zeros((bt_, taps_selected.shape[2], c), self.dtype)
            (x_temporal, res_feat, upd_mid), _ = Ladder(
                self.cfg, self.d_model, self.dtype, name="ladder")(
                (x_temporal, jnp.zeros_like(zeros_mid), zeros_mid),
                taps_selected.astype(self.dtype))
            return (res_feat + upd_mid).astype(jnp.float32).mean()

    rd = RematDist(cfg=cfg, d_model=768, output_dim=512, dtype=dt)
    rv = rd.init(rng, video, taps)
    rgfn = jax.grad(lambda v, vid, tp: jnp.sum(rd.apply(v, vid, tp)))

    @jax.jit
    def remat_reps(v, vid, tp):
        def body(i, acc):
            return acc * 0.0 + tree_sum(
                rgfn(v, vid + (acc * 0).astype(vid.dtype), tp))
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    try:
        t0 = time.perf_counter(); sync(remat_reps(rv, video, taps))
        cs = time.perf_counter()-t0
        for _ in range(2): sync(remat_reps(rv, video, taps))
        n = 3; t0 = time.perf_counter()
        for _ in range(n): out = remat_reps(rv, video, taps)
        sync(out)
        per = (time.perf_counter()-t0)/n/REPS
        print(json.dumps({"component": "dist_ladder_remat_bwd",
                          "ms": round(per*1e3, 2), "compile_s": round(cs, 1)}),
              flush=True)
    except Exception as e:
        print(json.dumps({"component": "dist_ladder_remat_bwd",
                          "error": str(e)[-250:]}), flush=True)

if __name__ == "__main__":
    main()
