#!/usr/bin/env python3
"""DiST side-network sub-component timing with in-jit repetition (one jit
dispatch per measurement; the axon tunnel adds ~2.5ms per dispatch which
would swamp sub-millisecond ops).

Times, at the flagship B/16 8+16f batch-8 shapes:
  dist_full      the whole DiSTNetwork
  stem           the (5,16,16) temporal patch stem over 16 frames
  ladder         the 12-step scanned ladder (no stem / pooling / head)
  temporal_net   1x TemporalNet block (x12 in the ladder)
  integration    1x IntegrationNetwork (x12)
  input_linear   1x 768->384 tap projection (x12)
  t2i / i2t      1x lift / inject (x12)
  adapool        1x AdaPooling (x2)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("REPS", "30"))
BATCH = int(os.environ.get("BENCH_BATCH", "8"))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dist_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    from dist_tpu.models.dist.dist_net import (
        AdaPooling, DiSTConfig, DiSTNetwork, IntegrationNetwork,
        Integration2Temporal, Temporal2Integration, TemporalNet, _LadderStep)
    import flax.linen as nn

    cfg = DiSTConfig(selected_layers=tuple(range(12)), num_frames=16, alpha=2)
    dt = jnp.bfloat16
    B, T, L, DM = BATCH, 16, 197, 768
    t = T // cfg.alpha
    bt = B * t
    rng = jax.random.PRNGKey(0)

    video = jax.random.normal(rng, (B, T, 224, 224, 3), jnp.float32)
    taps = jax.random.normal(rng, (12, bt, L, DM), dt)
    x_temporal = jax.random.normal(rng, (B, T, 14, 14, cfg.temporal_dim), dt)
    mid = jax.random.normal(rng, (bt, L, cfg.integration_dim), dt)
    tap1 = taps[0]

    def sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

    def bench(name, module, args, method=None):
        try:
            variables = module.init(rng, *args) if method is None else \
                module.init(rng, *args, method=method)
            f = (lambda v, *a: module.apply(v, *a)) if method is None else \
                (lambda v, *a: module.apply(v, *a, method=method))

            @jax.jit
            def reps(v, args):
                def body(i, carry):
                    eps = carry.astype(args[0].dtype) * 1e-12
                    out = f(v, args[0] + eps, *args[1:])
                    return jnp.mean(out[0] if isinstance(out, tuple) else out,
                                    dtype=jnp.float32)
                return jax.lax.fori_loop(0, REPS, body,
                                         jnp.zeros((), jnp.float32))

            t0 = time.perf_counter()
            sync(reps(variables, args))
            compile_s = time.perf_counter() - t0
            for _ in range(2):
                sync(reps(variables, args))
            n = 5
            t0 = time.perf_counter()
            for _ in range(n):
                out = reps(variables, args)
            sync(out)
            per = (time.perf_counter() - t0) / n / REPS
            print(json.dumps({"component": name, "ms": round(per * 1e3, 3),
                              "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"component": name, "error": repr(e)[:200]}),
                  flush=True)

    want = set(sys.argv[1:]) or {
        "dist_full", "stem", "temporal_net", "integration", "input_linear",
        "t2i", "i2t", "adapool"}

    if "dist_full" in want:
        bench("dist_full", DiSTNetwork(cfg=cfg, d_model=DM, output_dim=512,
                                       dtype=dt), (video, taps))
    if "stem" in want:
        from dist_tpu.models.dist.dist_net import TemporalPatchStem
        stem = TemporalPatchStem(channels=cfg.temporal_dim,
                                 t_patch=cfg.t_patch_size, s_patch=16,
                                 dtype=dt)
        bench("stem", stem, (video,))
    if "temporal_net" in want:
        bench("temporal_net", TemporalNet(cfg, dt), (x_temporal,))
    if "integration" in want:
        bench("integration", IntegrationNetwork(cfg, dt), (mid,))
    if "input_linear" in want:
        bench("input_linear", nn.Dense(cfg.integration_dim, dtype=dt,
                                       param_dtype=jnp.float32), (tap1,))
    if "t2i" in want:
        bench("t2i", Temporal2Integration(cfg, dt), (x_temporal,))
    if "i2t" in want:
        bench("i2t", Integration2Temporal(cfg, dt), (mid,))
    if "adapool" in want:
        top_cls = jax.random.normal(rng, (B, 1, cfg.integration_dim), dt)
        sp_cls = jax.random.normal(rng, (bt, 1, cfg.integration_dim), dt)
        bench("adapool", AdaPooling(cfg, dt), (mid, top_cls, sp_cls))


if __name__ == "__main__":
    main()
