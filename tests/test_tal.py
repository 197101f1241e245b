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


def test_fuse_verb_noun_map_matches_bruteforce():
    """Top-k fused (verb, noun) pairs equal the brute-force outer-product
    ranking (reference fuse_verb_noun_map, utils/tal_tools.py:139-168)."""
    from dist_tpu.tal.tools import fuse_verb_noun_map

    rng = np.random.default_rng(0)
    verb = rng.uniform(size=20)
    noun = rng.uniform(size=40)
    idx, score = fuse_verb_noun_map(verb, noun, verb_topk=10, noun_topk=30,
                                    top_k=5)
    assert idx.shape == (5, 2) and score.shape == (5, 3)
    # brute force over the full outer product: the top pairs restricted to
    # top-10 verbs x top-30 nouns
    vi = np.argsort(-verb)[:10]
    ni = np.argsort(-noun)[:30]
    full = [(v, n, verb[v] * noun[n]) for v in vi for n in ni]
    full.sort(key=lambda x: -x[2])
    for k in range(5):
        assert score[k, 2] == np.float64(full[k][2])
        np.testing.assert_allclose(score[k, 0], verb[idx[k, 0]])
        np.testing.assert_allclose(score[k, 1], noun[idx[k, 1]])
        np.testing.assert_allclose(score[k, 2], verb[idx[k, 0]] * noun[idx[k, 1]])


def test_recompute_scores_variants():
    from dist_tpu.tal.tools import recompute_scores

    props = {"xmin_score": np.array([0.5]), "xmax_score": np.array([0.4]),
             "clr_score": np.array([0.9]), "reg_score": np.array([0.8]),
             "score": np.array([0.0])}
    np.testing.assert_allclose(
        recompute_scores(props, "cr", 2.0, 1.0)["score"], [0.81 * 0.8])
    np.testing.assert_allclose(recompute_scores(props, "se")["score"], [0.2])
    np.testing.assert_allclose(
        recompute_scores(props, "secr")["score"], [0.9 * 0.8 * 0.2])
    import pytest
    with pytest.raises(ValueError):
        recompute_scores(props, "bogus")


def test_save_load_props_roundtrip(tmp_path):
    from dist_tpu.tal.tools import load_props, save_props

    props = {"xmin": np.array([0.1, 0.5]), "xmax": np.array([0.4, 0.9]),
             "score": np.array([0.8, 0.6]),
             "vn_index": np.zeros((2, 20, 2), np.int64),
             "vn_score": np.ones((2, 20, 3))}
    p = str(tmp_path / "props" / "video_1.npz")
    save_props(p, props)
    back = load_props(p)
    for k in props:
        np.testing.assert_array_equal(back[k], props[k])


def _mk_props(segments, scores, verb_noun):
    """Proposal dict where proposal j covers segments[j] (normalized) with
    component scores sqrt-split so score products reconstruct scores[j]."""
    n = len(segments)
    r = np.sqrt(np.asarray(scores, np.float64))
    vn_index = np.zeros((n, 20, 2), np.int64)
    vn_score = np.full((n, 20, 3), 1e-6)
    for j, (v, nn_) in enumerate(verb_noun):
        vn_index[j, 0] = (v, nn_)
        vn_score[j, 0] = (0.9, 0.9, 1.0)  # fused score 1 -> keeps ranking
    return {
        "xmin": np.asarray([s for s, _ in segments], np.float64),
        "xmax": np.asarray([e for _, e in segments], np.float64),
        "xmin_score": np.ones(n), "xmax_score": np.ones(n),
        "clr_score": r, "reg_score": r,
        "score": np.asarray(scores, np.float64),
        "vn_index": vn_index, "vn_score": vn_score,
    }


def test_video_post_process_to_detections():
    """Score recompute -> filter -> soft-NMS -> top-k action expansion
    (reference epic_video_post_process, utils/tal_tools.py:298-372)."""
    from dist_tpu.tal.tools import video_post_process

    # 3 proposals: soft-NMS keeps parity with the reference loop, which
    # stops once a single proposal remains alive (utils/tal_tools.py:268)
    props = _mk_props([(0.0, 0.25), (0.5, 0.75), (0.3, 0.45)],
                      [0.9, 0.8, 0.7], [(3, 7), (1, 2), (5, 5)])
    dets = video_post_process(props, duration=10.0, action_topk=1,
                              select_score=0.01)
    assert len(dets) == 2
    top = max(dets, key=lambda d: d["score"])
    assert (top["verb"], top["noun"]) == (3, 7)
    assert top["label"] == "3,7"
    np.testing.assert_allclose(top["segment"], [0.0, 2.5])


def test_epic_detection_grouped_map(tmp_path):
    """EpicDetection: perfect detections give action/verb/noun mAP 1.0; a
    wrong-noun detection still scores under the verb grouping (reference
    Epicdetection.evaluate, eval_epic_detection.py:231-242)."""
    import json

    from dist_tpu.tal.eval import EpicDetection

    gt = {"database": {
        "v1": {"subset": "validation", "annotations": [
            {"segment": [0.0, 2.5], "label": "3,7"},
            {"segment": [5.0, 7.5], "label": "1,2"}]},
        "v2": {"subset": "validation", "annotations": [
            {"segment": [1.0, 4.0], "label": "3,7"}]},
        "v3": {"subset": "training", "annotations": [
            {"segment": [0.0, 1.0], "label": "9,9"}]},  # excluded subset
    }}
    pred = {"results": {
        "v1": [{"segment": [0.0, 2.5], "label": "3,7", "verb": 3, "noun": 7,
                "score": 0.9},
               {"segment": [5.0, 7.5], "label": "1,2", "verb": 1, "noun": 2,
                "score": 0.8}],
        "v2": [{"segment": [1.0, 4.0], "label": "3,7", "verb": 3, "noun": 7,
                "score": 0.7},
               {"segment": [1.0, 4.0], "label": "9,9", "verb": 9, "noun": 9,
                "score": 0.6}],  # unseen class -> dropped like the reference
    }}
    gt_file = str(tmp_path / "gt.json")
    pred_file = str(tmp_path / "pred.json")
    json.dump(gt, open(gt_file, "w"))
    json.dump(pred, open(pred_file, "w"))

    res = EpicDetection(gt_file, pred_file).evaluate()
    assert res["action"]["mAP"] == 1.0
    assert res["verb"]["mAP"] == 1.0
    assert res["noun"]["mAP"] == 1.0

    # wrong noun: action/noun grouping miss, verb grouping still matches
    pred["results"]["v2"][0]["label"] = "3,8"
    pred["results"]["v2"][0]["noun"] = 8
    json.dump(pred, open(pred_file, "w"))
    # label "3,8" never appears in GT -> dropped entirely: action AP for
    # class "3,7" loses the v2 instance
    res2 = EpicDetection(gt_file, pred_file).evaluate()
    assert res2["action"]["mAP"] < 1.0
    assert res2["verb"]["mAP"] < 1.0  # the v2 verb-3 instance is unmatched

    # assign_class restricts the evaluation to one action label
    res3 = EpicDetection(gt_file, pred_file, assign_class="1,2").evaluate()
    assert set(res3) == {"action"}
    assert res3["action"]["mAP"] == 1.0


def test_localization_post_processing_driver(tmp_path):
    """The multiprocess driver analog: parallel per-video post-processing
    assembled into the EPIC detection JSON (reference
    proposals_post_processing + epic_localization_post_processing,
    utils/tal_tools.py:170-246), then scored by EpicDetection."""
    import json

    from dist_tpu.tal.eval import EpicDetection
    from dist_tpu.tal.tools import localization_post_processing

    # v1 gets a third junk proposal (unseen class "5,5"): soft-NMS parity
    # stops with one proposal left alive, and EpicDetection drops the
    # unseen-class detection anyway
    video_props = {
        "v1": (_mk_props([(0.0, 0.25), (0.5, 0.75), (0.3, 0.45)],
                         [0.9, 0.8, 0.7], [(3, 7), (1, 2), (5, 5)]), 10.0),
        "v2": (_mk_props([(0.1, 0.4)], [0.85], [(3, 7)]), 10.0),
    }
    out_path = str(tmp_path / "detections.json")
    output, path = localization_post_processing(None, video_props,
                                                out_path=out_path)
    assert path == out_path
    assert output["challenge"] == "action_detection"
    assert set(output["results"]) == {"v1", "v2"}

    gt = {"database": {
        "v1": {"subset": "validation", "annotations": [
            {"segment": [0.0, 2.5], "label": "3,7"},
            {"segment": [5.0, 7.5], "label": "1,2"}]},
        "v2": {"subset": "validation", "annotations": [
            {"segment": [1.0, 4.0], "label": "3,7"}]},
    }}
    gt_file = str(tmp_path / "gt.json")
    json.dump(gt, open(gt_file, "w"))
    res = EpicDetection(gt_file, out_path).evaluate()
    assert res["action"]["mAP"] == 1.0
