"""EPIC-KITCHENS dual verb/noun end-to-end: dataset -> train step -> joint
metrics."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_video(path):
    import cv2
    os.makedirs(os.path.dirname(path), exist_ok=True)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (40, 40))
    for i in range(30):
        w.write(np.full((40, 40, 3), i * 8 % 255, np.uint8))
    w.release()


@pytest.fixture(scope="module")
def epic_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("epic"))
    lines = []
    for i in range(4):
        _write_video(os.path.join(root, f"clip{i}.mp4"))
        lines.append(f"clip{i}.mp4 {i % 3} {i % 5}")
    for split in ("train", "test"):
        with open(os.path.join(root, f"epickitchen100_{split}_list.txt"), "w") as f:
            f.write("\n".join(lines))
    return root


def _epic_cfg(epic_root):
    cfg = load_config(os.path.join(REPO, "configs/projects/tada/csn_ek100.yaml"),
                      make_output_dir=False)
    cfg.DATA.DATA_ROOT_DIR = epic_root
    cfg.DATA.ANNO_DIR = epic_root
    cfg.DATA.NUM_INPUT_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_SCALE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.VIDEO.BACKBONE.DEPTH = 50
    cfg.VIDEO.BACKBONE.NUM_FILTERS = [8, 16, 16, 32, 32]
    cfg.VIDEO.BACKBONE.NUM_OUT_FEATURES = 32
    cfg.VIDEO.HEAD.NUM_CLASSES = [3, 5]
    cfg.TRAIN.BATCH_SIZE = 1  # x8 devices = global 8... but only 4 samples
    return cfg


def test_epic_dataset_labels(epic_root):
    from dist_tpu.data.datasets import Epickitchen100

    cfg = _epic_cfg(epic_root)
    ds = Epickitchen100(cfg, "train")
    item = ds[2]
    assert item["label_verb"] == 2 and item["label_noun"] == 2
    assert item["video"].shape == (4, 32, 32, 3)


@pytest.mark.slow  # heavy compile (fast-lane budget, README: Tests)
def test_epic_train_step_dict_labels(epic_root):
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.tasks.state import create_train_state, make_train_step

    cfg = _epic_cfg(epic_root)
    cfg.AUGMENTATION.LABEL_SMOOTHING = 0.1
    model = build_model(cfg)
    video = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), {"video": video})
    tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch=5)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, cfg, tx, lr_fn))
    batch = {"video": video,
             "labels": jnp.zeros((2,), jnp.int32),
             "label_verb": jnp.asarray([0, 1]),
             "label_noun": jnp.asarray([2, 3])}
    _, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert "loss_verb_class" in metrics and "loss_noun_class" in metrics
    # joint action error is the headline metric (reference train_epoch
    # joint_topks path); per-head errors ride as custom stats
    assert 0.0 <= float(metrics["top1_err"]) <= 100.0
    assert "top1_err_verb" in metrics and "top5_err_noun" in metrics


def test_epic_submission_json_format(epic_root, tmp_path):
    """Submission writer emits the EPIC test-server shape: version/sls
    fields, per-video verb/noun score maps keyed by video name, and the
    top-100 'verb,noun' action ensemble (reference
    runs/submission_test.py:131-164)."""
    import json
    from dist_tpu.tasks.submission import submission_test

    cfg = _epic_cfg(epic_root)
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TEST.DATASET = "epickitchen100"
    cfg.TEST.BATCH_SIZE = 1
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.SUBMISSION.SAVE_RESULTS_PATH = "submission.json"
    out_path = submission_test(cfg)
    with open(out_path) as f:
        blob = json.load(f)
    assert blob["version"] == "0.2"
    assert blob["challenge"] == "action_recognition"
    assert (blob["sls_pt"], blob["sls_tl"], blob["sls_td"]) == (2, 3, 3)
    assert set(blob["results"]) == {f"clip{i}" for i in range(4)}
    one = blob["results"]["clip0"]
    assert len(one["verb"]) == 3 and len(one["noun"]) == 5
    # action keys are 'verb,noun' pairs; <=100 entries, consistent scores
    assert 0 < len(one["action"]) <= 100
    for key, score in one["action"].items():
        v, n = map(int, key.split(","))
        assert 0 <= v < 3 and 0 <= n < 5
        expected = one["verb"][str(v)] * one["noun"][str(n)]
        assert abs(score - expected) < 1e-6


def test_epic_decode_retry_falls_back_with_consistent_labels(tmp_path):
    """Decode failure falls back to the neighbor index AND takes the
    neighbor's verb/noun labels (labels come from the same sample_info the
    successful decode used — reference base_dataset.py:373-388 retries with
    index+1; a label/video mismatch here would silently corrupt training)."""
    from dist_tpu.data.datasets import Epickitchen100

    root = str(tmp_path)
    # index 0 -> corrupt file; index 1 -> valid, distinct labels
    with open(os.path.join(root, "corrupt.mp4"), "wb") as f:
        f.write(b"not a video")
    _write_video(os.path.join(root, "good.mp4"))
    with open(os.path.join(root, "epickitchen100_train_list.txt"), "w") as f:
        f.write("corrupt.mp4 0 0\ngood.mp4 2 4\n")

    cfg = _epic_cfg(root)
    cfg.DATA.DATA_ROOT_DIR = root
    cfg.DATA.ANNO_DIR = root
    ds = Epickitchen100(cfg, "train")
    item = ds[0]  # decode of corrupt.mp4 fails -> falls back to index 1
    assert item["label_verb"] == 2 and item["label_noun"] == 4
    assert item["index"] == 1
    assert item["video"].shape == (4, 32, 32, 3)


def test_epic_eval_step_joint_metrics(epic_root):
    """make_eval_step on dict preds with verb/noun labels reports the joint
    action top-1/5 error (reference eval_epoch, runs/train.py:268-296)."""
    from dist_tpu.models.base.models import build_model
    from dist_tpu.tasks.state import TrainState, make_eval_step

    cfg = _epic_cfg(epic_root)
    model = build_model(cfg)
    video = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), {"video": video})
    state = TrainState(step=jnp.zeros((), jnp.int32), variables=variables,
                       opt_state=(), ema_variables=None)
    step = jax.jit(make_eval_step(model, cfg))
    batch = {"video": video, "labels": jnp.zeros((2,), jnp.int32),
             "label_verb": jnp.asarray([0, 1]),
             "label_noun": jnp.asarray([2, 3])}
    metrics = step(state, batch)
    assert isinstance(metrics["preds"], dict)
    assert 0.0 <= float(metrics["top1_err"]) <= 100.0
    assert float(metrics["top1_err"]) >= float(metrics["top5_err"]) - 1e-5
    assert "top1_err_verb" in metrics and "top1_err_noun" in metrics
