"""Temporal-action-localization proposal post-processing
(reference utils/tal_tools.py).

Array-based (no pandas dependency): proposals are dicts of numpy arrays
{"xmin", "xmax", "score", ...}.
"""

import numpy as np

from dist_tpu.tal.bboxes_1d import iou_with_anchors


def soft_nms(xmin, xmax, score, alpha, t1, t2, prop_num, iou_power=2.0):
    """Gaussian soft-NMS over 1-D proposals (utils/tal_tools.py:249-295):
    iteratively pick the max-score proposal and decay overlapping scores by
    exp(-iou^p / alpha) when iou exceeds a width-adaptive threshold.

    Returns (xmin, xmax, score, kept_indices) of the selected proposals.
    """
    xmin = np.asarray(xmin, np.float64).copy()
    xmax = np.asarray(xmax, np.float64).copy()
    score = np.asarray(score, np.float64).copy()
    index = np.arange(len(score))

    rs, re, rsc, ri = [], [], [], []
    alive = np.ones(len(score), bool)
    while alive.sum() > 1 and len(rsc) < prop_num:
        cand = np.where(alive)[0]
        best = cand[np.argmax(score[cand])]
        ious = iou_with_anchors(xmin, xmax, xmin[best], xmax[best])
        width = xmax[best] - xmin[best]
        decay_mask = alive & (ious > t1 + (t2 - t1) * width)
        decay_mask[best] = False
        score[decay_mask] *= np.exp(-np.power(ious[decay_mask], iou_power) / alpha)

        rs.append(xmin[best])
        re.append(xmax[best])
        rsc.append(score[best])
        ri.append(index[best])
        alive[best] = False
    return (np.asarray(rs), np.asarray(re), np.asarray(rsc),
            np.asarray(ri, np.int64))


def fuse_verb_noun_scores(verb_scores, noun_scores, top_k=5):
    """Outer-product fusion of verb/noun proposal classifications into
    action (verb, noun) pairs (utils/tal_tools.py:139-168). Returns the
    top_k (verb_idx, noun_idx, score) triples per proposal."""
    joint = verb_scores[:, :, None] * noun_scores[:, None, :]
    n, v, c = joint.shape
    flat = joint.reshape(n, -1)
    top = np.argsort(-flat, axis=1)[:, :top_k]
    verb_idx = top // c
    noun_idx = top % c
    scores = np.take_along_axis(flat, top, axis=1)
    return verb_idx, noun_idx, scores
