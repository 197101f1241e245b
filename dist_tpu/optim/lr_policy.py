"""Learning-rate policies (reference models/utils/lr_policy.py:10-83).

Pure functions of a *fractional* epoch; the train loop evaluates them at
``cur_epoch + num_folds * iter / steps_per_epoch`` exactly like the
reference (runs/train.py:97-98). Everything works with python floats or
traced jnp scalars, so the schedule can live inside the jitted train step.
"""


import jax.numpy as jnp


def lr_func_cosine(cfg, cur_epoch):
    base = float(cfg.OPTIMIZER.BASE_LR)
    max_epoch = float(cfg.OPTIMIZER.MAX_EPOCH)
    return base * (jnp.cos(jnp.pi * cur_epoch / max_epoch) + 1.0) * 0.5


def lr_func_steps_with_relative_lrs(cfg, cur_epoch):
    steps = list(cfg.OPTIMIZER.get("STEPS", None) or cfg.OPTIMIZER.get("LR_MILESTONES", []))
    lrs = list(cfg.OPTIMIZER.LRS)
    bounds = steps + [float(cfg.OPTIMIZER.MAX_EPOCH)]
    # reference get_step_index: STEPS lists lead with 0 and the index is
    # (first bound > epoch) - 1, i.e. the count of crossed bounds minus the
    # leading zero (lr_policy.py:44-60); without the -1 a ported config
    # trains one LR stage ahead from the first step
    ind = sum(jnp.asarray(cur_epoch) >= jnp.asarray(b) for b in bounds)
    ind = jnp.clip(ind - 1, 0, len(lrs) - 1)
    return jnp.asarray(lrs)[ind] * float(cfg.OPTIMIZER.BASE_LR)


_POLICIES = {
    "cosine": lr_func_cosine,
    "steps_with_relative_lrs": lr_func_steps_with_relative_lrs,
}


def get_lr_at_epoch(cfg, cur_epoch):
    """Policy value with linear warmup blended in
    (reference lr_policy.py:10-27)."""
    policy = cfg.OPTIMIZER.LR_POLICY
    if policy not in _POLICIES:
        raise NotImplementedError(f"Unknown LR policy: {policy}")
    fn = _POLICIES[policy]
    lr = fn(cfg, cur_epoch)
    warmup = float(cfg.OPTIMIZER.WARMUP_EPOCHS)
    if warmup > 0:
        lr_start = float(cfg.OPTIMIZER.WARMUP_START_LR)
        lr_end = fn(cfg, warmup)
        alpha = (lr_end - lr_start) / warmup
        warm = cur_epoch * alpha + lr_start
        lr = jnp.where(jnp.asarray(cur_epoch) < warmup, warm, lr)
    return lr


def lr_schedule_by_step(cfg, steps_per_epoch, start_epoch=0, num_folds=None):
    """optax-style schedule: step count -> lr, with the reference's
    fractional-epoch semantics (runs/train.py:97-98)."""
    if num_folds is None:
        num_folds = int(cfg.TRAIN.get("NUM_FOLDS", 1))

    def schedule(count):
        cur_epoch = start_epoch + num_folds * count / float(steps_per_epoch)
        return get_lr_at_epoch(cfg, cur_epoch)

    return schedule
