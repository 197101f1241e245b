"""Optimizer factory (optax) with the reference's param-group semantics.

Rebuild of ``models/utils/optimizer.py:23-214``:

- SGD (momentum/nesterov/dampening), Adam, AdamW, LARS selectable via
  ``OPTIMIZER.OPTIM_METHOD``,
- DiST param groups (``construct_DiST_optimizer``, optimizer.py:138-186):
  only ``dist_net`` params train; cls-tokens/positional-embeddings get no
  weight decay; biases/1-D params get no weight decay; everything gets
  ``lr_mult = NEW_NET_LRMULT`` and ``weight_decay = NEW_NET_WEIGHT_DECAY``.
  (The reference's released code TypeErrors on invalid tuple-slice
  subscripts at optimizer.py:171-182; this implements the clear intent.)
- ``TRAIN.ONLY_LINEAR`` head-probe mode (optimizer.py:36-42),
- SimCLR ``ADJUST_LR`` linear batch-size scaling (optimizer.py:47-51),
- per-step LR from a schedule evaluated at the fractional epoch
  (``get_epoch_lr``/``set_lr``, optimizer.py:189-214) — in optax the
  schedule is part of the transformation, so "set_lr" disappears.

Frozen params are handled with ``optax.multi_transform`` + ``set_to_zero``:
no optimizer state is allocated for them (the functional analog of torch's
``requires_grad=False`` filtering).
"""

import jax
import jax.numpy as jnp
import optax

from dist_tpu.optim.lr_policy import lr_schedule_by_step

TRAINABLE = "trainable"
NO_WD = "trainable_no_wd"   # cls tokens / positional embeddings / 1-D params
FROZEN = "frozen"
BODY = "body_reduced"       # non-head params under TRAIN.LR_REDUCE+FINE_TUNE
BN = "bn_group"             # bn/norm params (BN.WEIGHT_DECAY, lr_reduce,
                            # OPTIMIZER.BN_LARS_EXCLUDE)


def _path_str(path):
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def _is_bn_param(name):
    return any(seg.startswith("bn") or "norm" in seg
               for seg in name.split("/"))


def param_labels(cfg, params):
    """Label each param leaf with its optimizer group.

    DiST/CLIP configs use the ``construct_DiST_optimizer`` grouping
    (reference optimizer.py:138-186): dist_net(+head) trainable, no-WD for
    cls-tokens/pos-embeds/1-D params, everything else frozen.

    Standard configs mirror ``construct_standard_optimizer``
    (optimizer.py:95-135): "embd"/"cls_token" params get no WD; bn/norm
    params form their own group (``BN.WEIGHT_DECAY``, lr_reduce,
    ``OPTIMIZER.BN_LARS_EXCLUDE``); head params keep full LR; remaining
    body params are reduced 10x when ``TRAIN.LR_REDUCE`` + ``FINE_TUNE``
    (set_lr, optimizer.py:200-214); ``TRAIN.FIXED_WEIGHTS`` name segments
    are skipped from the optimizer entirely (optimizer.py:102-108).
    """
    dist_enabled = bool(cfg.VIDEO.BACKBONE.get("DIST")
                        and cfg.VIDEO.BACKBONE.DIST.ENABLE)
    only_linear = bool(cfg.TRAIN.get("ONLY_LINEAR", False))
    freeze_visual = bool(cfg.VIDEO.BACKBONE.get("FREEZE_VISUAL", False))
    freeze_text = bool(cfg.VIDEO.BACKBONE.get("FREEZE_TEXT", False))

    wb_lock = bool(cfg.BN.get("WB_LOCK", False))
    lr_reduce = bool(cfg.TRAIN.get("LR_REDUCE", False)
                     and cfg.TRAIN.get("FINE_TUNE", False))
    fixed = tuple(cfg.TRAIN.get("FIXED_WEIGHTS", ()) or ())
    standard = not dist_enabled and not only_linear

    def label(path, leaf):
        name = _path_str(path)
        if name.startswith("batch_stats") or name.startswith("head_stats"):
            # BN running stats (backbone or head) update through the forward
            # pass, never the optimizer
            return FROZEN
        if name.startswith("params/"):
            # labels run over the FULL variables dict; module paths start
            # after the collection segment (without the strip the
            # freeze_visual/freeze_text startswith checks can never match
            # and "frozen" towers keep decaying via add_decayed_weights)
            name = name[len("params/"):]
        if fixed and any(seg in fixed for seg in name.split("/")):
            return FROZEN
        if wb_lock and _is_bn_param(name):
            # BN scale/bias locked (reference construct_standard_optimizer,
            # optimizer.py:125-128 "Model bn/ln locked")
            return FROZEN
        if only_linear:
            trainable = "head" in name
        elif dist_enabled:
            # reference trains only dist_net.* (+ head) in DiST configs
            trainable = ("dist_net" in name) or ("head" in name)
        else:
            trainable = True
            if freeze_visual and name.startswith("visual/"):
                trainable = False
            if freeze_text and (name.startswith("text/") or name == "logit_scale"):
                trainable = False
        if not trainable:
            return FROZEN
        no_wd = (
            name.endswith("cls_token")
            or name.endswith("positional_embedding")
            or ("embd" in name or "embed" in name)
        )
        if not standard:
            # DiST grouping also exempts biases / 1-D params from decay
            no_wd = no_wd or name.endswith("bias") or jnp.ndim(leaf) <= 1
        if no_wd:
            return NO_WD
        if standard and _is_bn_param(name):
            return BN
        if standard and lr_reduce and "head" not in name:
            return BODY
        return TRAINABLE

    return jax.tree_util.tree_map_with_path(label, params)


def _torch_sgd_trace(momentum, dampening):
    """torch.optim.SGD momentum with dampening: the buffer is initialized
    to the raw gradient on the first step, then
    ``buf = momentum*buf + (1-dampening)*grad``."""

    def init(params):
        return {
            "trace": jax.tree_util.tree_map(jnp.zeros_like, params),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(updates, state, params=None):
        del params
        first = state["count"] == 0
        scale = jnp.where(first, 1.0, 1.0 - dampening)

        def buf(m, g):
            return momentum * m + scale.astype(g.dtype) * g

        new_trace = jax.tree_util.tree_map(buf, state["trace"], updates)
        return new_trace, {"trace": new_trace, "count": state["count"] + 1}

    return optax.GradientTransformation(init, update)


def _core_transform(cfg, weight_decay, lars_exclude=False):
    method = cfg.OPTIMIZER.OPTIM_METHOD
    if lars_exclude and method == "lars":
        # reference group flag ``lars_exclude`` (optimizer.py:124,
        # lars.py:210-322): the group skips the layer-wise trust-ratio
        # adaptation and updates with plain SGD momentum
        method = "sgd"
    betas = tuple(cfg.OPTIMIZER.get("BETAS", [0.9, 0.999]))
    chain = []
    if method == "sgd":
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        dampening = float(cfg.OPTIMIZER.get("DAMPENING", 0.0) or 0.0)
        if dampening:
            # torch SGD buffer: first step buf = d_p, then
            # buf = momentum*buf + (1-dampening)*d_p (torch.optim.SGD)
            assert not cfg.OPTIMIZER.NESTEROV, (
                "nesterov is incompatible with dampening (torch.optim.SGD)")
            chain.append(_torch_sgd_trace(
                float(cfg.OPTIMIZER.MOMENTUM), dampening))
        else:
            chain.append(optax.trace(
                decay=float(cfg.OPTIMIZER.MOMENTUM),
                nesterov=bool(cfg.OPTIMIZER.NESTEROV),
            ))
    elif method in ("adam", "adamw"):
        chain.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
        if weight_decay:
            # decoupled decay (AdamW); plain adam in the reference passes
            # weight_decay through torch.optim.Adam which is L2-coupled,
            # but every shipped config uses adamw for non-zero decay.
            chain.append(optax.add_decayed_weights(weight_decay))
    elif method == "lars":
        chain.append(optax.lars(
            learning_rate=1.0,  # lr applied by the outer scale
            weight_decay=weight_decay,
            momentum=float(cfg.OPTIMIZER.MOMENTUM),
            nesterov=bool(cfg.OPTIMIZER.NESTEROV),
        ))
        return optax.chain(*chain)
    else:
        raise NotImplementedError(f"Unsupported optimizer {method}")
    return optax.chain(*chain)


def base_lr(cfg):
    lr = float(cfg.OPTIMIZER.BASE_LR)
    if cfg.OPTIMIZER.get("ADJUST_LR", False):
        # SimCLR linear scaling by the GLOBAL batch (reference scales by
        # NUM_GPUS*NUM_SHARDS, optimizer.py:47-51). NUM_GPUS is pinned to 1
        # in this port — the real multiplier is the mesh data-axis size
        # (TRAIN.BATCH_SIZE is per data shard, data/builder.py).
        from dist_tpu.parallel.mesh import config_data_axis_size
        n_clips = (cfg.PRETRAIN.get("NUM_CLIPS_PER_VIDEO", 1)
                   if cfg.PRETRAIN.ENABLE else 1)
        lr = (lr * config_data_axis_size(cfg) * cfg.TRAIN.BATCH_SIZE
              * n_clips / 256.0)
    return lr


def construct_optimizer(cfg, params, steps_per_epoch, start_epoch=0):
    """Build the optax transformation + the step->lr schedule (for logging).

    Returns (tx, schedule_fn). ``tx.init(params)`` allocates state only for
    trainable leaves.
    """
    dist_enabled = bool(cfg.VIDEO.BACKBONE.get("DIST")
                        and cfg.VIDEO.BACKBONE.DIST.ENABLE)
    lr_mult = float(cfg.OPTIMIZER.get("NEW_NET_LRMULT", 1.0)) if dist_enabled else 1.0
    wd = float(cfg.OPTIMIZER.get("NEW_NET_WEIGHT_DECAY", cfg.OPTIMIZER.WEIGHT_DECAY)
               if dist_enabled else cfg.OPTIMIZER.WEIGHT_DECAY)

    schedule = lr_schedule_by_step(cfg, steps_per_epoch, start_epoch)
    lr0 = base_lr(cfg)
    scale_base = float(cfg.OPTIMIZER.BASE_LR)

    def lr_for_step(count):
        s = schedule(count)
        # schedule is built on BASE_LR; rescale if ADJUST_LR changed it
        return s * (lr0 / scale_base) if scale_base else s

    def branch(weight_decay, lr_scale=1.0, lars_exclude=False):
        return optax.chain(
            _core_transform(cfg, weight_decay, lars_exclude=lars_exclude),
            optax.scale(lr_mult * lr_scale),
            optax.scale_by_schedule(lambda c: -lr_for_step(c)),
        )

    # lr_reduce: /10 for reduced groups when fine-tuning (reference set_lr,
    # optimizer.py:200-214); bn/norm group carries BN.WEIGHT_DECAY and the
    # LARS exclusion flag (optimizer.py:124)
    reduce_scale = 0.1
    bn_wd = float(cfg.BN.get("WEIGHT_DECAY", 0.0) or 0.0)
    bn_lars_exclude = bool(cfg.OPTIMIZER.get("BN_LARS_EXCLUDE", False))

    labels = param_labels(cfg, params)
    tx = optax.multi_transform(
        {
            TRAINABLE: branch(wd),
            NO_WD: branch(0.0),
            BODY: branch(wd, lr_scale=reduce_scale),
            BN: branch(bn_wd, lr_scale=reduce_scale if (
                cfg.TRAIN.get("LR_REDUCE", False)
                and cfg.TRAIN.get("FINE_TUNE", False)) else 1.0,
                lars_exclude=bn_lars_exclude),
            FROZEN: optax.set_to_zero(),
        },
        labels,
    )
    return tx, lr_for_step
