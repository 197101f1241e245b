"""Classification metrics (reference utils/metrics.py).

``topks_correct`` and friends as jnp functions usable inside jit; the EPIC
joint verb-noun top-k follows the reference's outer-product formulation
(utils/metrics.py:12-99).
"""

import jax
import jax.numpy as jnp


def topks_correct(preds, labels, ks, weights=None):
    """Number of top-k correct predictions for each k
    (utils/metrics.py:102-135). preds (N, C), labels (N,).

    ``weights`` (N,) optional per-sample weights — used by eval-in-train to
    zero out loader pad duplicates so the epoch mean matches the unpadded
    dataset exactly."""
    # clamp k to the class count (tiny smoke heads can have < 5 classes)
    c = preds.shape[-1]
    max_k = min(max(ks), c)
    _, top_idx = jax.lax.top_k(preds, max_k)          # (N, max_k)
    correct = (top_idx == labels[:, None]).astype(jnp.float32)  # (N, max_k)
    if weights is not None:
        correct = correct * weights.astype(jnp.float32)[:, None]
    return [jnp.sum(correct[:, :min(k, c)]) for k in ks]


def topk_errors(preds, labels, ks):
    """(1 - #correct/N) * 100 per k (utils/metrics.py:138-146)."""
    n = preds.shape[0]
    return [(1.0 - c / n) * 100.0 for c in topks_correct(preds, labels, ks)]


def topk_accuracies(preds, labels, ks):
    n = preds.shape[0]
    return [(c / n) * 100.0 for c in topks_correct(preds, labels, ks)]


def joint_topks_correct(verb_preds, noun_preds, verb_labels, noun_labels, ks,
                        normalized=False, weights=None):
    """EPIC joint action top-k: outer product of verb/noun scores
    (utils/metrics.py:12-99). Returns dict of correct counts per k.

    ``normalized=True`` skips the softmax (eval-mode heads already emit
    softmax scores — the reference's runtime ``pred.sum(-1) != 1`` check
    becomes a static flag under jit)."""
    n = verb_preds.shape[0]
    if normalized:
        vp = verb_preds.astype(jnp.float32)
        np_ = noun_preds.astype(jnp.float32)
    else:
        vp = jax.nn.softmax(verb_preds.astype(jnp.float32), axis=-1)
        np_ = jax.nn.softmax(noun_preds.astype(jnp.float32), axis=-1)
    joint = vp[:, :, None] * np_[:, None, :]          # (N, V, Nn)
    flat = joint.reshape(n, -1)
    labels_flat = verb_labels * noun_preds.shape[-1] + noun_labels
    out = {}
    for name, p, l in (("verb", verb_preds, verb_labels),
                       ("noun", noun_preds, noun_labels)):
        cs = topks_correct(p, l, ks, weights=weights)
        for k, c in zip(ks, cs):
            out[f"{name}_top{k}"] = c
    cs = topks_correct(flat, labels_flat, ks, weights=weights)
    for k, c in zip(ks, cs):
        out[f"action_top{k}"] = c
    return out
