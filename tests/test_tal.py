"""TAL utilities: IoU math, soft-NMS behavior, detection mAP."""

import numpy as np

from dist_tpu.tal.bboxes_1d import ioa_with_anchors, iou_with_anchors
from dist_tpu.tal.eval import evaluate_detection
from dist_tpu.tal.tools import fuse_verb_noun_scores, soft_nms


def test_iou_math():
    np.testing.assert_allclose(
        iou_with_anchors(np.array([0.0]), np.array([1.0]), 0.5, 1.5),
        [1.0 / 3.0], atol=1e-6)
    np.testing.assert_allclose(
        ioa_with_anchors(np.array([0.0]), np.array([1.0]), 0.5, 1.5),
        [0.5], atol=1e-6)


def test_soft_nms_suppresses_overlaps():
    # two near-identical proposals and one disjoint; keep order by score,
    # decay the duplicate
    xmin = [0.0, 0.01, 5.0]
    xmax = [1.0, 1.01, 6.0]
    score = [0.9, 0.85, 0.5]
    rs, re, rsc, ri = soft_nms(xmin, xmax, score, alpha=0.4, t1=0.0, t2=0.0,
                               prop_num=3)
    # the loop stops when one proposal remains (reference semantics,
    # tal_tools.py:268): 2 of 3 selected, best first
    assert len(ri) == 2 and ri[0] == 0
    # the overlapping duplicate was decayed below the disjoint proposal,
    # so the disjoint one is picked second
    assert ri[1] == 2


def test_fuse_verb_noun():
    v = np.array([[0.9, 0.1]])
    n = np.array([[0.2, 0.8]])
    vi, ni, s = fuse_verb_noun_scores(v, n, top_k=2)
    assert vi[0, 0] == 0 and ni[0, 0] == 1
    np.testing.assert_allclose(s[0, 0], 0.72, atol=1e-6)


def test_detection_map_perfect_and_empty():
    gt = {"v1": [{"t_start": 0.0, "t_end": 1.0, "label": "a"}],
          "v2": [{"t_start": 2.0, "t_end": 3.0, "label": "a"}]}
    pred_perfect = {"v1": [{"t_start": 0.0, "t_end": 1.0, "label": "a", "score": 0.9}],
                    "v2": [{"t_start": 2.0, "t_end": 3.0, "label": "a", "score": 0.8}]}
    res = evaluate_detection(gt, pred_perfect, tiou_thresholds=[0.5])
    assert res["mAP"] == 1.0
    res = evaluate_detection(gt, {}, tiou_thresholds=[0.5])
    assert res["mAP"] == 0.0


def test_detection_file_api(tmp_path):
    import json
    from dist_tpu.tal.eval import evaluate_detection_files

    anno = {"database": {"v1": {"annotations": [
        {"segment": [0.0, 1.0], "label": "a"}]}}}
    res = {"results": {"v1": [
        {"segment": [0.0, 1.0], "label": "a", "score": 0.9}]}}
    ap = str(tmp_path / "anno.json")
    rp = str(tmp_path / "res.json")
    json.dump(anno, open(ap, "w"))
    json.dump(res, open(rp, "w"))
    out = evaluate_detection_files(ap, rp, tiou_thresholds=[0.5])
    assert out["mAP"] == 1.0


def test_parse_bmn_proposals():
    from dist_tpu.tal.tools import parse_bmn_proposals

    T, D = 8, 4
    start = np.zeros(T); start[2] = 0.9
    end = np.zeros(T); end[5] = 0.8
    conf = np.full((2, D, T), 0.5)
    props = parse_bmn_proposals(start, end, conf)
    assert len(props["score"]) > 0
    # the true (2, 5) proposal exists with score 0.9*0.8*0.25
    match = [(a, b) for a, b in zip(props["xmin"], props["xmax"])
             if abs(a - 2 / 8) < 1e-9 and abs(b - 5 / 8) < 1e-9]
    assert match
    best = np.argmax(props["score"])
    np.testing.assert_allclose(props["score"][best], 0.9 * 0.8 * 0.25, atol=1e-9)


def test_detection_matching_falls_through_to_unmatched_gt():
    """ActivityNet protocol: a prediction whose argmax-IoU GT is already
    matched still counts TP on the next overlapping unmatched GT above the
    threshold."""
    from dist_tpu.tal.eval import evaluate_detection

    gt = {"v": [
        {"t_start": 0.0, "t_end": 10.0, "label": 0},
        {"t_start": 2.0, "t_end": 12.0, "label": 0},
    ]}
    # both predictions overlap GT A most; the second must match GT B
    pred = {"v": [
        {"t_start": 0.0, "t_end": 10.0, "label": 0, "score": 0.9},
        {"t_start": 1.0, "t_end": 10.5, "label": 0, "score": 0.8},
    ]}
    out = evaluate_detection(gt, pred, tiou_thresholds=[0.5])
    # with fall-through both predictions are TPs -> AP = 1.0
    assert abs(out["mAP"] - 1.0) < 1e-6
