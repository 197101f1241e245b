#!/usr/bin/env python3
"""Train-step component timing (B/16 8+16f, batch 8): full step vs
forward-only vs dist-fwd+bwd vs optimizer-only, in-jit repetition."""
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
    from dist_tpu.config import load_config
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.tasks.state import create_train_state, make_train_step

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs/projects/dist/ssv2/vit-b16-8+16f.yaml"),
                      opts=["TRAIN.BATCH_SIZE", str(BATCH)], make_output_dir=False)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    video = jax.random.randint(rng, (BATCH, 16, 224, 224, 3), 0, 255,
                               jnp.int32).astype(jnp.uint8)
    variables = model.init(rng, {"video": video.astype(jnp.float32)})
    n_cls = int(cfg.VIDEO.HEAD.NUM_CLASSES)
    tf = jax.random.normal(rng, (n_cls, 512), jnp.float32)
    tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch=100)
    state = create_train_state(variables, tx)
    labels = jnp.zeros((BATCH,), jnp.int32)
    batch = {"video": video, "labels": labels, "text_features": tf}
    step_fn = make_train_step(model, cfg, tx, lr_fn)

    def sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

    def bench(name, reps_jit, arg):
        t0 = time.perf_counter(); sync(reps_jit(arg)); cs = time.perf_counter()-t0
        for _ in range(2): sync(reps_jit(arg))
        n = 3; t0 = time.perf_counter()
        for _ in range(n): out = reps_jit(arg)
        sync(out)
        per = (time.perf_counter()-t0)/n/REPS
        print(json.dumps({"component": name, "ms": round(per*1e3, 2),
                          "compile_s": round(cs, 1)}), flush=True)

    def tree_sum(t):
        import jax.numpy as jnp
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(t)
                   if hasattr(l, "dtype"))

    @jax.jit
    def full_reps(state):
        def body(i, st):
            st2, metrics = step_fn(st, batch, jax.random.PRNGKey(0))
            return st2
        final = jax.lax.fori_loop(0, REPS, body, state)
        # consume ALL of the state so no iteration's work can be DCE'd
        return tree_sum(final.variables) + final.step

    bench("train_step_full", full_reps, state)

    # loss fwd+bwd only (no optimizer/EMA)
    from dist_tpu.tasks.state import _prep_video
    from dist_tpu.optim.losses import calculate_loss

    def loss_fn(variables, v):
        preds, logits = model.apply(
            variables, {"video": _prep_video(cfg, v), "text_features": tf},
            train=True, rngs={"dropout": jax.random.PRNGKey(0)})
        loss, _ = calculate_loss(cfg, preds, logits,
                                 {"supervised": labels})
        return loss

    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def bwd_reps(variables):
        def body(i, acc):
            g = grad_fn(variables, video + (acc * 0).astype(video.dtype))
            return acc + tree_sum(g)
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    bench("fwd_bwd_only", bwd_reps, variables)

    @jax.jit
    def opt_reps(state):
        g = jax.tree_util.tree_map(jnp.zeros_like, state.variables)
        def body(i, st):
            import optax
            updates, opt_state = tx.update(g, st.opt_state, st.variables)
            variables = optax.apply_updates(st.variables, updates)
            return st.replace(variables=variables, opt_state=opt_state,
                              step=st.step + 1)
        final = jax.lax.fori_loop(0, REPS, body, state)
        return tree_sum(final.variables) + final.step

    bench("optimizer_only", opt_reps, state)

if __name__ == "__main__":
    main()
