"""TAL path end-to-end: SimpleLocalizationConv + BMNHead + BMN losses."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_tpu.config import load_config
from dist_tpu.config.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _loc_cfg():
    cfg = load_config(os.path.join(REPO, "configs/pool/base.yaml"),
                      make_output_dir=False)
    cfg.LOCALIZATION = Config({
        "ENABLE": True,
        "LOSS": "Tem+PemReg+PemCls",
        "LOSS_WEIGHTS": [1.0, 10.0, 1.0],
        "POS_REG_THRES": 0.7,
        "NEG_REG_THRES": 0.3,
        "POS_CLS_THRES": 0.9,
        "DSCALE": 8,
    })
    cfg.VIDEO.DIM1D = 16
    cfg.VIDEO.BACKBONE_LAYER = 2
    cfg.VIDEO.BACKBONE_GROUPS_NUM = 1
    cfg.VIDEO.BACKBONE.META_ARCH = "SimpleLocalizationConv"
    cfg.VIDEO.HEAD.NAME = "BMNHead"
    cfg.DATA.NUM_INPUT_CHANNELS = 12
    return cfg


def test_window_means():
    from dist_tpu.models.heads.bmn import proposal_window_means

    x = jnp.arange(6, dtype=jnp.float32).reshape(1, 6, 1)
    m = proposal_window_means(x, 3)
    # d=0: identity
    np.testing.assert_allclose(np.asarray(m[0, 0, :, 0]), np.arange(6), atol=1e-6)
    # d=1: mean of pairs; last slot invalid -> 0
    np.testing.assert_allclose(np.asarray(m[0, 1, :, 0]),
                               [0.5, 1.5, 2.5, 3.5, 4.5, 0.0], atol=1e-6)
    # d=2: triples
    np.testing.assert_allclose(np.asarray(m[0, 2, :4, 0]), [1, 2, 3, 4], atol=1e-6)


@pytest.mark.slow  # heavy compile (fast-lane budget, README: Tests)
def test_bmn_head_and_losses():
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.losses import calculate_loss

    cfg = _loc_cfg()
    model = build_model(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12))
    variables = model.init(jax.random.PRNGKey(1), {"video": feats})
    preds, logits = model.apply(variables, {"video": feats}, train=True)
    assert preds["start"].shape == (2, 16)
    assert preds["confidence_map"].shape == (2, 2, 8, 16)

    rng = np.random.default_rng(0)
    labels = {"supervised": {
        "start_map": rng.uniform(size=(2, 16)).astype(np.float32),
        "end_map": rng.uniform(size=(2, 16)).astype(np.float32),
        "iou_map": rng.uniform(size=(2, 8, 16)).astype(np.float32),
        "mask": np.ones((2, 8, 16), np.float32),
    }}
    loss, parts = calculate_loss(cfg, preds, logits, labels)
    assert np.isfinite(float(loss))
    assert set(parts) == {"tem", "pem_reg", "pem_cls"}


@pytest.mark.slow  # heavy compile (fast-lane budget, README: Tests)
def test_bmn_losses_differentiable():
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.losses import calculate_loss

    cfg = _loc_cfg()
    model = build_model(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 12))
    variables = model.init(jax.random.PRNGKey(1), {"video": feats})
    rng = np.random.default_rng(0)
    labels = {"supervised": {
        "start_map": (rng.uniform(size=(1, 16)) > 0.5).astype(np.float32),
        "end_map": (rng.uniform(size=(1, 16)) > 0.5).astype(np.float32),
        "iou_map": rng.uniform(size=(1, 8, 16)).astype(np.float32),
        "mask": np.ones((1, 8, 16), np.float32),
    }}

    def loss_fn(v):
        preds, logits = model.apply(v, {"video": feats}, train=True)
        loss, _ = calculate_loss(cfg, preds, logits, labels)
        return loss

    g = jax.grad(loss_fn)(variables)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.slow  # heavy compile (fast-lane budget, README: Tests)
def test_bmn_forward_to_detection_map(tmp_path):
    """Full TAL chain on synthetic features: BMNHead forward (with EPIC
    verb/noun maps) -> parse_bmn_proposals -> localization_post_processing
    -> detection JSON -> EpicDetection grouped mAP. Covers the
    reference's missing-driver gap end-to-end (utils/tal_tools.py:170-298,
    eval_epic_detection.py:17-374)."""
    import json

    from dist_tpu.models.base.models import build_model
    from dist_tpu.tal.eval import EpicDetection
    from dist_tpu.tal.tools import (localization_post_processing,
                                    parse_bmn_proposals)

    cfg = _loc_cfg()
    cfg.VIDEO.HEAD.NUM_CLASSES = [6, 9]  # verb/noun -> head emits maps
    model = build_model(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 12))
    variables = model.init(jax.random.PRNGKey(1), {"video": feats})
    preds, _ = model.apply(variables, {"video": feats}, train=False)
    assert preds["verb_map"].shape == (2, 6, 8, 16)
    assert preds["noun_map"].shape == (2, 9, 8, 16)

    video_props = {}
    durations = [12.0, 20.0]
    for b, name in enumerate(["v1", "v2"]):
        props = parse_bmn_proposals(
            np.asarray(preds["start"][b]), np.asarray(preds["end"][b]),
            np.asarray(preds["confidence_map"][b]),
            verb_map=np.asarray(preds["verb_map"][b]),
            noun_map=np.asarray(preds["noun_map"][b]), top_k=5)
        assert len(props["score"]) > 0
        assert props["vn_index"].shape[1:] == (5, 2)
        video_props[name] = (props, durations[b])

    out_path = str(tmp_path / "detections.json")
    output, _ = localization_post_processing(cfg, video_props,
                                             out_path=out_path)
    assert set(output["results"]) == {"v1", "v2"}
    assert all(len(v) > 0 for v in output["results"].values())

    # GT built from each video's top detection: the pipeline must then
    # score a positive grouped mAP on its own output
    gt = {"database": {}}
    for name, dets in output["results"].items():
        top = max(dets, key=lambda d: d["score"])
        gt["database"][name] = {"subset": "validation", "annotations": [
            {"segment": top["segment"], "label": top["label"]}]}
    gt_file = str(tmp_path / "gt.json")
    json.dump(gt, open(gt_file, "w"))
    res = EpicDetection(gt_file, out_path).evaluate()
    for group in ("action", "verb", "noun"):
        assert 0.0 < res[group]["mAP"] <= 1.0
