"""Supervised losses + the central loss dispatch.

Rebuild of ``models/utils/losses.py:20-119`` (supervised path) and
``dataset/utils/mixup.py``'s label smoothing: cross-entropy, soft-target CE
(used whenever mixup/cutmix is on), BCE, MSE; dict-valued labels (EPIC
verb/noun) sum per-key losses.

SSL / localization losses live in ``dist_tpu/optim/contrastive.py`` and
``dist_tpu/optim/localization.py`` and register into ``SSL_LOSSES`` /
``LOCALIZATION_LOSSES``.
"""

import jax
import jax.numpy as jnp
import optax

from dist_tpu.utils.registry import Registry

SSL_LOSSES = Registry("SSL_Losses")
LOCALIZATION_LOSSES = Registry("Localization_Losses")


def soft_target_cross_entropy(logits, target):
    """sum(-target * log_softmax(x)).mean() (losses.py:20-30)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-target * logp, axis=-1))


def cross_entropy(logits, labels):
    """Plain CE on integer labels."""
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels))


def bce(probs, target):
    eps = 1e-7
    p = jnp.clip(probs.astype(jnp.float32), eps, 1 - eps)
    return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))


def bce_logit(logits, target):
    return jnp.mean(optax.sigmoid_binary_cross_entropy(
        logits.astype(jnp.float32), target))


def mse(pred, target):
    return jnp.mean((pred.astype(jnp.float32) - target) ** 2)


_LOSSES = {
    "cross_entropy": cross_entropy,
    "soft_target": soft_target_cross_entropy,
    "bce": bce,
    "bce_logit": bce_logit,
    "mse": mse,
}


def get_loss_func(name):
    if name not in _LOSSES:
        raise NotImplementedError(f"Loss {name} is not supported")
    return _LOSSES[name]


def label_smoothing(labels, num_classes, smoothing):
    """int labels -> smoothed one-hot (dataset/utils/mixup.py semantics):
    on-value 1 - s + s/C, off-value s/C."""
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return one_hot * (on - off) + off


def calculate_loss(cfg, preds, logits, labels, cur_epoch=0.0):
    """Central dispatch (losses.py:52-119). ``labels`` is the dataset
    contract dict: {"supervised": ..., "supervised_mixup": ...,
    "self-supervised": {...}}. Returns (loss, loss_in_parts)."""
    loss_in_parts = {}

    if cfg.PRETRAIN.ENABLE:
        loss = 0.0
        loss_parts = cfg.PRETRAIN.LOSS.split("+")
        loss_weights = list(cfg.PRETRAIN.LOSS_WEIGHTS)
        for loss_idx, loss_item in enumerate(loss_parts):
            fn = SSL_LOSSES.get_strict("Loss_" + loss_item)
            loss_cur, _ = fn(cfg, preds, logits, labels.get("self-supervised", {}),
                             cur_epoch)
            if isinstance(loss_cur, dict):
                for k, v in loss_cur.items():
                    loss_in_parts[k] = v
                    if "debug" not in k and hasattr(v, "dtype"):
                        loss = loss + loss_weights[loss_idx] * v
            else:
                loss_in_parts[loss_item] = loss_cur
                loss = loss + loss_weights[loss_idx] * loss_cur
        return loss, loss_in_parts

    if cfg.LOCALIZATION.ENABLE:
        loss = 0.0
        loss_parts = cfg.LOCALIZATION.LOSS.split("+")
        loss_weights = list(cfg.LOCALIZATION.LOSS_WEIGHTS)
        for loss_idx, loss_item in enumerate(loss_parts):
            fn = LOCALIZATION_LOSSES.get_strict("Loss_" + loss_item)
            loss_cur, _ = fn(cfg, preds, logits, labels, cur_epoch)
            if isinstance(loss_cur, dict):
                for k, v in loss_cur.items():
                    loss_in_parts[k] = v
                    if "debug" not in k:
                        loss = loss + loss_weights[loss_idx] * v
            else:
                loss_in_parts[loss_item] = loss_cur
                loss = loss + loss_weights[loss_idx] * loss_cur
        return loss, loss_in_parts

    loss_fun = get_loss_func(cfg.TRAIN.get("LOSS_FUNC", "cross_entropy"))

    if "supervised_mixup" in labels:
        # mixup targets are soft; the reference forces the soft_target loss
        # whenever mixup/cutmix is enabled (runs/train.py:386-396)
        target = labels["supervised_mixup"]
        if isinstance(target, dict):
            loss = 0.0
            for k, v in target.items():
                loss_in_parts["loss_" + k] = soft_target_cross_entropy(preds[k], v)
                loss = loss + loss_in_parts["loss_" + k]
        else:
            loss = soft_target_cross_entropy(preds, target)
        return loss, loss_in_parts

    target = labels["supervised"]
    smoothing = float(cfg.AUGMENTATION.get("LABEL_SMOOTHING", 0.0))
    if smoothing > 0.0:
        # smoothed one-hot targets (dict targets smooth per head —
        # dataset/utils/mixup.py label_smoothing)
        if isinstance(target, dict):
            loss = 0.0
            for k, v in target.items():
                t = label_smoothing(v, preds[k].shape[-1], smoothing)
                loss_in_parts["loss_" + k] = soft_target_cross_entropy(preds[k], t)
                loss = loss + loss_in_parts["loss_" + k]
            return loss, loss_in_parts
        target = label_smoothing(target, preds.shape[-1], smoothing)
        loss = soft_target_cross_entropy(preds, target)
        return loss, loss_in_parts
    if isinstance(target, dict):
        loss = 0.0
        for k, v in target.items():
            loss_in_parts["loss_" + k] = loss_fun(preds[k], v)
            loss = loss + loss_in_parts["loss_" + k]
    else:
        loss = loss_fun(preds, target)
    return loss, loss_in_parts
