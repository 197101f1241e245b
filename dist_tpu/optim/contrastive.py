"""Contrastive / HiCo SSL losses, TPU-native.

Rebuild of ``models/utils/contrastive_losses.py:7-230`` and the SSL loss
wrappers in ``models/utils/losses.py:122-232``.

Key design change vs. the reference: the reference all-gathers embeddings
across GPUs and splices the local shard back in to keep gradients
(``construct_logits_with_gradient``, losses.py:213-226), then multiplies by
``world_size`` to undo DDP's gradient averaging. Under pjit the loss is
computed on the GLOBAL batch inside one compiled program — XLA inserts the
collectives and differentiates through them — so there is no gather hack,
no splice, and no world-size factor.

All pair selections use static-shape mask algebra (no boolean indexing):
the (B, s, B, s) view of the similarity matrix gives same-instance blocks
by diagonal extraction.
"""

import jax
import jax.numpy as jnp

from dist_tpu.optim.losses import SSL_LOSSES


# ------------------------- similarity functions -------------------------


def sim_func_linear(sim, temperature, optim_target=None):
    if optim_target is not None:
        sim = jnp.clip(sim, -1.0, optim_target)
    return jnp.exp(sim / temperature)


def sim_func_parabola_pos(sim, temperature, optim_target=1.0):
    return jnp.exp((1 - (sim - optim_target) ** 2) / temperature)


def sim_func_parabola_neg(sim, temperature, optim_target=None):
    return jnp.exp((sim + 1) ** 2 / temperature)


_SIM_FUNCS = {
    ("linear", "pos"): sim_func_linear,
    ("linear", "neg"): sim_func_linear,
    ("parabola", "pos"): sim_func_parabola_pos,
    ("parabola", "neg"): sim_func_parabola_neg,
}


def get_sim_func(name, pair):
    key = (name, pair)
    if key not in _SIM_FUNCS:
        raise NotImplementedError(f"Unknown similarity function: {name}")
    return _SIM_FUNCS[key]


# ------------------------- mask helpers -------------------------


def _same_instance_mask(batch_size, samples):
    """(B*s, B*s) bool: same video, any view."""
    eye = jnp.eye(batch_size, dtype=bool)
    return jnp.repeat(jnp.repeat(eye, samples, axis=0), samples, axis=1)


def _pos_pairs(mtx, batch_size, samples):
    """Extract same-instance off-diagonal entries -> (B*s, s-1), row-ordered
    like the reference's boolean indexing (contrastive_losses.py:54-57)."""
    blocks = mtx.reshape(batch_size, samples, batch_size, samples)
    diag = blocks[jnp.arange(batch_size), :, jnp.arange(batch_size), :]  # (B,s,s)
    # drop the view diagonal
    s = samples
    keep = ~jnp.eye(s, dtype=bool)
    flat = diag.reshape(batch_size, s * s)
    idx = jnp.nonzero(keep.reshape(-1), size=s * (s - 1))[0]
    return flat[:, idx].reshape(batch_size * s, s - 1)


def contrastive_instance_discrimination(cfg, logits, batch_size, samples):
    """NT-Xent instance discrimination (contrastive_losses.py:38-65)."""
    c = cfg.PRETRAIN.CONTRASTIVE
    sim = logits @ logits.T
    pos_mtx = get_sim_func(c.SIM_FUNC_POS, "pos")(
        sim, c.TEMPERATURE, c.get("POS_OPTIM_TARGET", None))
    neg_mtx = get_sim_func(c.SIM_FUNC_NEG, "neg")(sim, c.TEMPERATURE)

    mask_ins = _same_instance_mask(batch_size, samples)
    pos = _pos_pairs(pos_mtx, batch_size, samples)          # (B*s, s-1)
    if c.get("INS_MIL", False):
        pos = pos.sum(axis=1, keepdims=True)
    neg = ((~mask_ins) * neg_mtx).sum(axis=0)[:, None]       # (B*s, 1)

    n = pos.shape[1]
    if c.get("WITH_ONE", True):
        loss = -((1.0 / n) * jnp.log(pos / (pos + neg)).sum()) / (batch_size * samples)
    else:
        loss = -((1.0 / n) * jnp.log(pos / neg).sum()) / (batch_size * samples)
    return loss, pos.mean(), neg.mean()


def _tcl_focal(preds, samples_per_group, gama):
    """Topic-consistency focal BCE over the pairwise prediction map
    (contrastive_losses.py:124-140). preds (N, N, ...) raw logits."""
    p = jax.nn.sigmoid(preds.astype(jnp.float32))
    n_tok = p.shape[0]
    groups = n_tok // samples_per_group
    mask_ins = _same_instance_mask(groups, samples_per_group)
    pos_mask = mask_ins & ~jnp.eye(n_tok, dtype=bool)
    neg_mask = ~mask_ins
    while pos_mask.ndim < p.ndim:
        pos_mask = pos_mask[..., None]
        neg_mask = neg_mask[..., None]
    log_eps = 1e-5
    pos_terms = jnp.where(pos_mask, ((1 - p) ** gama) * jnp.log(p + log_eps), 0.0)
    neg_terms = jnp.where(neg_mask, (p ** gama) * jnp.log(1 - p + log_eps), 0.0)
    pos_cnt = jnp.maximum(pos_mask.sum(), 1)
    neg_cnt = jnp.maximum(neg_mask.sum(), 1)
    return -(pos_terms.sum() / pos_cnt) - (neg_terms.sum() / neg_cnt)


def contrastive_hico(cfg, preds, logits, batch_size, samples):
    """HiCo hierarchical loss (contrastive_losses.py:103-142): VCL over the
    first two views per video + TCL focal BCE over the topical map."""
    c = cfg.PRETRAIN.CONTRASTIVE
    sim = logits @ logits.T
    pos_mtx = get_sim_func(c.SIM_FUNC_POS, "pos")(
        sim, c.TEMPERATURE, c.get("POS_OPTIM_TARGET", None))
    neg_mtx = get_sim_func(c.SIM_FUNC_NEG, "neg")(sim, c.TEMPERATURE)

    mask_ins = _same_instance_mask(batch_size, samples)
    pos_all = _pos_pairs(pos_mtx, batch_size, samples)       # (B*s, s-1)
    neg_all = ((~mask_ins) * neg_mtx).sum(axis=0)[:, None]

    # vcl: first-2-views rows only, first positive column
    view_idx = jnp.tile(jnp.arange(samples), batch_size)
    vcl_mask = view_idx < 2
    vcl_pos = pos_all[:, :1]
    ratio = jnp.log(vcl_pos / (vcl_pos + neg_all))[:, 0]
    vcl_loss = -(jnp.where(vcl_mask, ratio, 0.0).sum()) / jnp.maximum(vcl_mask.sum(), 1)

    tcl_loss = _tcl_focal(preds, samples, float(cfg.HICO.LOSS.GAMA))
    loss = (vcl_loss * float(cfg.HICO.LOSS.VCL_WEIGHT)
            + tcl_loss * float(cfg.HICO.LOSS.TCL_WEIGHT))
    return loss, vcl_pos.mean(), neg_all.mean(), vcl_loss, tcl_loss


def contrastive_hico_plus_plus(cfg, preds, logits, batch_size, samples,
                               vit_scale=False):
    """HiCo++ (contrastive_losses.py:145-186): VCL over adjacent view pairs,
    TCL over half-sample groups."""
    c = cfg.PRETRAIN.CONTRASTIVE
    n_tok = batch_size * samples
    sim = logits @ logits.T
    pos_mtx = get_sim_func(c.SIM_FUNC_POS, "pos")(
        sim, c.TEMPERATURE, c.get("POS_OPTIM_TARGET", None))
    neg_mtx = get_sim_func(c.SIM_FUNC_NEG, "neg")(sim, c.TEMPERATURE)

    pos = _pos_pairs(pos_mtx, n_tok // 2, 2)                 # pair blocks
    mask_ins_neg = _same_instance_mask(batch_size, samples)
    neg = ((~mask_ins_neg) * neg_mtx).sum(axis=0)[:, None]

    vcl_loss = -jnp.log(pos / (pos + neg)).mean()
    if vit_scale:
        vcl_loss = vcl_loss * c.TEMPERATURE * 2

    tcl_loss = _tcl_focal(preds, max(samples // 2, 1),
                          float(cfg.HICO.LOSS.GAMA))
    loss = (vcl_loss * float(cfg.HICO.LOSS.VCL_WEIGHT)
            + tcl_loss * float(cfg.HICO.LOSS.TCL_WEIGHT))
    return loss, pos.mean(), neg.mean(), vcl_loss, tcl_loss


# ------------------------- registered SSL losses -------------------------


def _get_embeddings(logits):
    if isinstance(logits, (list, tuple)):
        return logits[0]
    return logits


@SSL_LOSSES.register()
def Loss_Contrastive(cfg, preds, logits, labels, cur_epoch=0):
    bsz, samples = labels["contrastive"].shape
    emb = _get_embeddings(logits)
    batch_size = emb.shape[0] // samples
    loss, pos, neg = contrastive_instance_discrimination(cfg, emb, batch_size, samples)
    return {"loss_contrastive": loss, "pos_debug": pos, "neg_debug": neg}, None


@SSL_LOSSES.register()
def Loss_HiCo(cfg, preds, logits, labels, cur_epoch=0):
    bsz, samples = labels["contrastive"].shape
    emb = _get_embeddings(logits)
    batch_size = emb.shape[0] // samples
    total, pos, neg, vcl, tcl = contrastive_hico(cfg, preds, emb, batch_size, samples)
    return {"total_loss": total, "pos_debug": pos, "neg_debug": neg,
            "vcl_loss_debug": vcl, "tcl_loss_debug": tcl}, None


@SSL_LOSSES.register()
def Loss_HiCoPlusPlus(cfg, preds, logits, labels, cur_epoch=0):
    bsz, samples = labels["contrastive"].shape
    emb = _get_embeddings(logits)
    batch_size = emb.shape[0] // samples
    total, pos, neg, vcl, tcl = contrastive_hico_plus_plus(
        cfg, preds, emb, batch_size, samples)
    return {"total_loss": total, "pos_debug": pos, "neg_debug": neg,
            "vcl_loss_debug": vcl, "tcl_loss_debug": tcl}, None


@SSL_LOSSES.register()
def Loss_HiCoPlusPlusVit(cfg, preds, logits, labels, cur_epoch=0):
    bsz, samples = labels["contrastive"].shape
    emb = _get_embeddings(logits)
    batch_size = emb.shape[0] // samples
    total, pos, neg, vcl, tcl = contrastive_hico_plus_plus(
        cfg, preds, emb, batch_size, samples, vit_scale=True)
    return {"total_loss": total, "pos_debug": pos, "neg_debug": neg,
            "vcl_loss_debug": vcl, "tcl_loss_debug": tcl}, None
