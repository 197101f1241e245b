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


def _boundary_peaks(scores):
    """Boundary candidate mask: local maxima or > 0.5*max
    (utils/tal_tools.py:93-111)."""
    scores = np.asarray(scores, np.float64)
    n = len(scores)
    bins = np.zeros(n)
    mx = scores.max() if n else 0.0
    for i in range(1, n - 1):
        if scores[i] > scores[i + 1] and scores[i] > scores[i - 1]:
            bins[i] = 1
        elif scores[i] > 0.5 * mx:
            bins[i] = 1
    return bins


def parse_bmn_proposals(start_scores, end_scores, confidence_map):
    """Decode BMN maps into a scored proposal list
    (reference parse_epic_bmn_proposals, utils/tal_tools.py:67-139).

    start/end_scores: (T,) boundary probabilities;
    confidence_map: (2, D, T) [regression, classification] confidences.
    Returns dict of arrays: xmin, xmax, score (+ component scores), with
    score = start * end * cls_conf * reg_conf and boundaries restricted to
    peak/0.5-max candidates. Start bin 0 / end bin T-1 always included.
    """
    start_scores = np.asarray(start_scores, np.float64)
    end_scores = np.asarray(end_scores, np.float64)
    reg_conf = np.asarray(confidence_map[0], np.float64)
    clr_conf = np.asarray(confidence_map[1], np.float64)
    dscale, tscale = clr_conf.shape

    start_bins = _boundary_peaks(start_scores)
    start_bins[0] = 1
    end_bins = _boundary_peaks(end_scores)
    end_bins[-1] = 1

    out = {k: [] for k in ("xmin", "xmax", "xmin_score", "xmax_score",
                           "clr_score", "reg_score", "score")}
    for d in range(dscale):
        for s in range(tscale):
            e = s + d + 1
            if e < tscale and start_bins[s] == 1 and end_bins[e] == 1:
                out["xmin"].append(s / tscale)
                out["xmax"].append(e / tscale)
                out["xmin_score"].append(start_scores[s])
                out["xmax_score"].append(end_scores[e])
                out["clr_score"].append(clr_conf[d, s])
                out["reg_score"].append(reg_conf[d, s])
                out["score"].append(start_scores[s] * end_scores[e]
                                    * clr_conf[d, s] * reg_conf[d, s])
    return {k: np.asarray(v) for k, v in out.items()}
