"""Temporal-action-localization (BMN-style) losses
(reference models/utils/localization_losses.py:17-154).

jnp rebuilds with static shapes; the PEM-Reg balanced sampling masks use an
explicit PRNG key threaded through cfg-free randomness (the reference uses
unseeded np.random on CUDA tensors, localization_losses.py:107-114).
"""

import jax
import jax.numpy as jnp

from dist_tpu.optim.losses import LOCALIZATION_LOSSES

_EPS = 1e-6


def _balanced_binary_log_loss(pred, gt, mask=None):
    """Positive/negative re-weighted BCE (localization_losses.py:29-44)."""
    pred = pred.reshape(-1).astype(jnp.float32)
    gt = gt.reshape(-1).astype(jnp.float32)
    if mask is None:
        mask = jnp.ones_like(pred)
    else:
        mask = mask.reshape(-1).astype(jnp.float32)
    pmask = (gt > 0.5).astype(jnp.float32) * mask
    num_entries = mask.sum()
    num_positive = jnp.maximum(pmask.sum(), 1.0)
    ratio = num_entries / num_positive
    coef_0 = 0.5 * ratio / jnp.maximum(ratio - 1.0, _EPS)
    coef_1 = 0.5 * ratio
    loss_pos = coef_1 * jnp.log(pred + _EPS) * pmask * mask
    loss_neg = coef_0 * jnp.log(1.0 - pred + _EPS) * (1.0 - pmask) * mask
    return -jnp.mean(loss_pos + loss_neg)


@LOCALIZATION_LOSSES.register()
def Loss_Tem(cfg, preds, logits, labels, cur_epoch=0):
    """Start/end boundary loss (localization_losses.py:17-49)."""
    gt = labels["supervised"]
    loss = (_balanced_binary_log_loss(preds["start"], gt["start_map"])
            + _balanced_binary_log_loss(preds["end"], gt["end_map"]))
    return {"tem": loss}, None


@LOCALIZATION_LOSSES.register()
def Loss_PemReg(cfg, preds, logits, labels, cur_epoch=0):
    """Proposal confidence regression with balanced sampling
    (localization_losses.py:79-119)."""
    pred = preds["confidence_map"][:, 0].astype(jnp.float32)
    gt = labels["supervised"]["iou_map"].astype(jnp.float32)
    mask = labels["supervised"]["mask"].astype(jnp.float32)
    gt = gt * mask
    pos_t = float(cfg.LOCALIZATION.get("POS_REG_THRES", 0.7))
    neg_t = float(cfg.LOCALIZATION.get("NEG_REG_THRES", 0.3))

    u_h = (gt > pos_t).astype(jnp.float32)
    u_m = ((gt <= pos_t) & (gt > neg_t)).astype(jnp.float32)
    u_l = ((gt <= neg_t) & (gt > 0.0)).astype(jnp.float32) * mask

    num_h = u_h.sum()
    r_m = num_h / jnp.maximum(u_m.sum(), 1.0)
    r_l = num_h / jnp.maximum(u_l.sum(), 1.0)
    # key from the (traced) step/epoch so each iteration draws FRESH
    # sampling masks; PRNGKey(constant) would reuse one fixed mask all run
    key = jax.random.PRNGKey(0)
    key = jax.random.fold_in(key, jnp.asarray(cur_epoch * 1000, jnp.int32))
    k1, k2 = jax.random.split(key)
    # sample only within the candidate sets: the reference's
    # ``(rand * u) > 1-r`` lets EVERY cell (background included) pass when
    # r > 1 (mid/low cells scarcer than high) — ``u * (rand > 1-r)`` keeps
    # the balanced-sampling intent in that regime (reference defect)
    u_sm = u_m * (jax.random.uniform(k1, gt.shape) > (1.0 - r_m)).astype(jnp.float32)
    u_sl = u_l * (jax.random.uniform(k2, gt.shape) > (1.0 - r_l)).astype(jnp.float32)
    weights = u_h + u_sm + u_sl

    se = (pred * weights - gt * weights) ** 2
    loss = 0.5 * se.sum() / jnp.maximum(weights.sum(), 1.0)
    return {"pem_reg": loss}, None


@LOCALIZATION_LOSSES.register()
def Loss_PemCls(cfg, preds, logits, labels, cur_epoch=0):
    """Proposal binary classification (localization_losses.py:121-154)."""
    pred = preds["confidence_map"][:, 1].astype(jnp.float32)
    gt = labels["supervised"]["iou_map"].astype(jnp.float32)
    mask = labels["supervised"]["mask"].astype(jnp.float32)
    gt = gt * mask
    pos_t = float(cfg.LOCALIZATION.get("POS_CLS_THRES", 0.9))

    pmask = (gt > pos_t).astype(jnp.float32)
    nmask = (gt <= pos_t).astype(jnp.float32) * mask
    num_positive = jnp.maximum(pmask.sum(), 1.0)
    num_entries = num_positive + nmask.sum()
    ratio = num_entries / num_positive
    coef_0 = 0.5 * ratio / jnp.maximum(ratio - 1.0, _EPS)
    coef_1 = 0.5 * ratio
    loss_pos = coef_1 * jnp.log(pred + _EPS) * pmask
    loss_neg = coef_0 * jnp.log(1.0 - pred + _EPS) * nmask
    loss = -(loss_pos + loss_neg).sum() / num_entries
    return {"pem_cls": loss}, None


@LOCALIZATION_LOSSES.register()
def Loss_BmnActionCls(cfg, preds, logits, labels, cur_epoch=0):
    """Per-proposal verb/noun CE on high-IoU proposals
    (localization_losses.py:52-77). The reference's dynamic boolean select
    becomes a weighted CE (same gradient, static shapes)."""
    import optax

    gt_label = labels["supervised"]["label_map"]          # (B, 2, D, T)
    iou = (labels["supervised"]["iou_map"]
           * labels["supervised"]["mask"])                # (B, D, T)
    sel = (iou >= 0.75).reshape(-1).astype(jnp.float32)
    n_sel = jnp.maximum(sel.sum(), 1.0)

    def head_loss(pred_map, gt_idx):
        c = pred_map.shape[1]
        p = pred_map.reshape(pred_map.shape[0], c, -1)
        p = jnp.moveaxis(p, 1, 2).reshape(-1, c)
        g = gt_idx.reshape(-1)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            p.astype(jnp.float32), g)
        return (ce * sel).sum() / n_sel

    verb_loss = head_loss(preds["verb_map"], gt_label[:, 0])
    noun_loss = head_loss(preds["noun_map"], gt_label[:, 1])
    return {"verb_loss": verb_loss, "noun_loss": noun_loss}, None
