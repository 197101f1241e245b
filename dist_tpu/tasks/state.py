"""Train state + jitted train/eval steps.

The TPU-native counterpart of the reference's per-iteration loop body
(``runs/train.py:81-167``): everything between "batch arrives" and
"optimizer step done" — mixup, LR, forward, loss, backward, update, EMA,
and the step metrics — is ONE jitted, mesh-sharded function. The
reference's NaN check, ``.item()`` syncs, and DDP all-reduces become XLA
collectives inside the step; metrics come back as a small dict.
"""

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from dist_tpu.data.mixup import MixupConfig, mixup_batch
from dist_tpu.data.transforms import normalize_device
from dist_tpu.ops.augment_device import DeviceAugConfig, device_augment
from dist_tpu.optim.losses import calculate_loss
from dist_tpu.utils.metrics import joint_topks_correct, topks_correct


def _epic_errors(preds, verb_labels, noun_labels, normalized, weights=None):
    """Joint verb/noun/action top-1/5 errors for dict predictions
    (reference eval_epoch, runs/train.py:268-296): the action (joint) error
    is the headline top1/top5; per-head errors ride as custom stats.
    ``weights``: optional per-sample validity (loader pad mask)."""
    counts = joint_topks_correct(preds["verb_class"], preds["noun_class"],
                                 verb_labels, noun_labels, (1, 5),
                                 normalized=normalized, weights=weights)
    if weights is not None:
        n = jnp.maximum(weights.astype(jnp.float32).sum(), 1.0)
    else:
        n = preds["verb_class"].shape[0]
    err = {k: (1.0 - v / n) * 100.0 for k, v in counts.items()}
    return (err.pop("action_top1"), err.pop("action_top5"),
            {f"{k.rsplit('_', 1)[1]}_err_{k.rsplit('_', 1)[0]}": v
             for k, v in err.items()})


def init_variables(cfg, model, sample_video_shape):
    """Init model variables and load pretrained CLIP weights when a local
    path is configured (reference: clip.load at model build,
    models/base/clip.py:614-629). Shared by the train/test/submission
    tasks and tools/classify.py — the weight-path priority lives HERE."""
    import os

    rng = jax.random.PRNGKey(int(cfg.RANDOM_SEED))
    variables = model.init(rng, {"video": jnp.zeros(
        (2,) + tuple(sample_video_shape), jnp.float32)})
    w = (cfg.VIDEO.BACKBONE.get("LOCAL_PRETRAIN_WEIGHT_PATH")
         or cfg.VIDEO.BACKBONE.get("PRETRAIN_WEIGHT_PATH"))
    if w and os.path.exists(w):
        from dist_tpu.utils import checkpoint as cu
        variables = cu.load_torch_variables(cfg, w, variables)
    return variables


def compute_text_features(model, variables, text_tokens, mesh=None):
    """Encode the label texts ONCE host-side (the reference's cache_text,
    models/base/clip.py:437-452) and commit them replicated on the mesh so
    the per-step jit never re-uploads them. Returns None without tokens."""
    if text_tokens is None:
        return None
    feats = jax.jit(lambda v, t: model.encode_text(v, t))(
        variables, jnp.asarray(text_tokens))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.device_put(feats, NamedSharding(mesh, P()))
    return jax.device_get(feats)


def _prep_video(cfg, video):
    """uint8 host batches are normalized on-device inside the jit
    (the TPU analog of AUGMENTATION.USE_GPU, base_dataset.py:390-392)."""
    if video.dtype == jnp.uint8:
        return normalize_device(video, list(cfg.DATA.MEAN), list(cfg.DATA.STD))
    return video


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    variables: Any                      # {"params": ..., "head": ...}
    opt_state: Any
    ema_variables: Any = None           # optional EMA copy of variables


def create_train_state(variables, tx, ema_decay=None):
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        variables=variables,
        opt_state=tx.init(variables),
        # a REAL copy: aliasing the same buffers would make the donated
        # train-step state contain each buffer twice
        ema_variables=(jax.tree_util.tree_map(jnp.array, variables)
                       if ema_decay else None),
    )


def make_train_step(model, cfg, tx, lr_fn, mesh=None):
    """Build the jitted train step.

    step(state, batch, rng) -> (new_state, metrics)
    batch = {"video": (B,T,H,W,3), "labels": (B,), "text_features": opt}

    ``mesh``: when given, per-sample batch tensors are pinned to the data
    axis with with_sharding_constraint so XLA's SPMD propagation can't
    silently replicate activations under dp x tp meshes.
    """
    mixup_on = bool(cfg.AUGMENTATION.MIXUP.ENABLE or cfg.AUGMENTATION.CUTMIX.ENABLE)
    mc = MixupConfig.from_cfg(cfg) if mixup_on else None
    ema_decay = (float(cfg.MODEL.EMA.DECAY)
                 if cfg.MODEL.get("EMA") and cfg.MODEL.EMA.ENABLE else None)

    pretrain = bool(cfg.PRETRAIN.ENABLE)

    use_device_aug = bool(cfg.AUGMENTATION.get("USE_GPU", False))

    def _pin_data_axis(x):
        if mesh is None or not hasattr(x, "ndim") or x.ndim == 0:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P
        from dist_tpu.parallel.mesh import DATA_AXIS
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P(DATA_AXIS)))

    def step(state: TrainState, batch, rng):
        video = _pin_data_axis(batch["video"])
        if video.ndim == 6:
            # SSL multi-view (B, n_views, T, H, W, C): flatten BEFORE the
            # device augmentation so flips/jitter act on the (T,H,W) axes,
            # not on the view axis; the model flattens identically
            video = video.reshape((-1,) + video.shape[2:])
        batch = dict(batch)
        for k in ("labels", "label_verb", "label_noun", "contrastive"):
            if k in batch and batch[k] is not None:
                batch[k] = _pin_data_axis(batch[k])
        if use_device_aug and video.dtype == jnp.uint8:
            # on-device augmentation (the reference's USE_GPU mode,
            # base_dataset.py:390-392) fused into the step jit
            k_aug, rng = jax.random.split(jax.random.fold_in(rng, state.step))
            v01 = video.astype(jnp.float32) / 255.0
            v01 = device_augment(k_aug, v01, DeviceAugConfig.from_cfg(cfg))
            mean = jnp.asarray(list(cfg.DATA.MEAN), jnp.float32)
            std = jnp.asarray(list(cfg.DATA.STD), jnp.float32)
            video = (v01 - mean) / std
        else:
            video = _prep_video(cfg, video)
        labels = {"supervised": batch["labels"]}
        if "label_verb" in batch:
            # EPIC dual verb/noun labels (dict-valued supervised target,
            # reference losses.py:110-118)
            labels["supervised"] = {"verb_class": batch["label_verb"],
                                    "noun_class": batch["label_noun"]}
        if pretrain and "contrastive" in batch:
            labels["self-supervised"] = {"contrastive": batch["contrastive"]}
        rng = jax.random.fold_in(rng, state.step)

        if ((not pretrain) and mc is not None and mc.enabled
                and not isinstance(labels["supervised"], dict)):
            k_mix, rng = jax.random.split(rng)
            video, labels["supervised_mixup"] = mixup_batch(
                k_mix, video, batch["labels"], mc)

        inputs = {"video": video,
                  "text_features": batch.get("text_features")}

        def loss_fn(variables):
            rng_d, rng_m = jax.random.split(rng)
            preds, logits, new_stats = model.apply(
                variables, inputs, train=True,
                # "mask": the VideoMAE encoder's tube-masking stream
                # (backbones/vit_video.py make_rng("mask")); unused streams
                # are ignored by flax
                rngs={"dropout": rng_d, "mask": rng_m},
                return_new_state=True)
            # step-dependent cur_epoch: the localization losses fold it
            # into their sampling PRNG (fresh masks every iteration)
            loss, parts = calculate_loss(cfg, preds, logits, labels,
                                         cur_epoch=state.step)
            return loss, (preds, parts, new_stats)

        (loss, (preds, parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.variables)

        updates, opt_state = tx.update(grads, state.opt_state, state.variables)
        variables = optax.apply_updates(state.variables, updates)
        if new_stats is not None:
            # updated running-stat collections (backbone batch_stats and/or
            # head_stats) replace their slots wholesale
            variables = dict(variables)
            variables.update(new_stats)

        ema_variables = state.ema_variables
        if ema_decay is not None and ema_variables is not None:
            ema_variables = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema_variables, variables)

        head_errs = {}
        if isinstance(preds, dict) and "label_verb" in batch:
            # EPIC: joint action error as the headline metric
            # (reference train_epoch joint_topks path)
            top1_err, top5_err, head_errs = _epic_errors(
                preds, batch["label_verb"], batch["label_noun"],
                normalized=False)
        elif pretrain or isinstance(preds, dict):
            top1_err = top5_err = jnp.float32(0.0)
        else:
            c1, c5 = topks_correct(preds, batch["labels"], (1, 5))
            n = preds.shape[0]
            top1_err = (1.0 - c1 / n) * 100.0
            top5_err = (1.0 - c5 / n) * 100.0
        metrics = {
            "loss": loss,
            "top1_err": top1_err,
            "top5_err": top5_err,
            "lr": lr_fn(state.step),
            **head_errs,
            **parts,
        }
        new_state = TrainState(step=state.step + 1, variables=variables,
                               opt_state=opt_state, ema_variables=ema_variables)
        return new_state, metrics

    return step


def make_eval_step(model, cfg, use_ema=False):
    """eval step: (state, batch) -> metrics (+ softmax preds for meters)."""
    # heads emit softmax scores at eval only with the softmax activation
    # (heads/transformer_head.py); the joint metric must not re-softmax
    # those but must normalize anything else (the static analog of the
    # reference's runtime pred.sum(-1) != 1 check, utils/metrics.py:54)
    head_normalized = str(
        cfg.VIDEO.HEAD.get("ACTIVATION", "softmax") or "") == "softmax"

    def step(state: TrainState, batch):
        variables = state.ema_variables if use_ema else state.variables
        inputs = {"video": _prep_video(cfg, batch["video"]),
                  "text_features": batch.get("text_features")}
        preds, _ = model.apply(variables, inputs, train=False)
        # loader pad mask: 0.0 rows are host-shard / final-batch duplicates
        # (data/builder.py). Excluding them here makes the in-train val mean
        # EXACT when len(val) % global_batch != 0 — the reference's ragged
        # last batch has no duplicates to begin with.
        mask = batch.get("mask")
        extra = ({} if mask is None
                 else {"num_valid": mask.astype(jnp.float32).sum()})
        if isinstance(preds, dict):
            if "label_verb" in batch:
                # in-train EPIC eval: joint action error + per-head stats
                # (the multi-view TestMeter path computes its own ensembled
                # metrics from the raw preds)
                top1, top5, head_errs = _epic_errors(
                    preds, batch["label_verb"], batch["label_noun"],
                    normalized=head_normalized, weights=mask)
                return {"preds": preds, "top1_err": top1, "top5_err": top5,
                        **head_errs, **extra}
            return {"preds": preds,
                    "top1_err": jnp.float32(0.0),
                    "top5_err": jnp.float32(0.0), **extra}
        c1, c5 = topks_correct(preds, batch["labels"], (1, 5), weights=mask)
        if mask is not None:
            n = jnp.maximum(mask.astype(jnp.float32).sum(), 1.0)
        else:
            n = preds.shape[0]
        return {
            "preds": preds,
            "top1_err": (1.0 - c1 / n) * 100.0,
            "top5_err": (1.0 - c5 / n) * 100.0,
            **extra,
        }

    return step
