"""Regression tests for two silent-corruption bugs found in round-1 review:

1. the SSV2 flip label remap must apply ONLY to SSV2 (the shipped K400
   configs inherit ``AUGMENTATION.SSV2_FLIP: true``; the reference guards on
   ``"ssv2" in cfg.TRAIN.DATASET``, base_dataset.py:416-431),
2. non-SSV2 supervised training gets the reference's unconditional p=0.5
   horizontal flip (kinetics400.py:86-89),
3. the LR schedule must advance by NUM_FOLDS per FULL fold-epoch loader
   pass, not per 1/NUM_FOLDS of it (reference runs/train.py:97).
"""

import os

import numpy as np

from dist_tpu.config import load_config
from dist_tpu.data.builder import build_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml")


def _flip_cfg(dataset_name, tmp):
    return load_config(CFG, opts=[
        "OUTPUT_DIR", str(tmp),
        "TRAIN.DATASET", dataset_name,
        "AUGMENTATION.SSV2_FLIP", "true",
        "VIDEO.HEAD.NUM_CLASSES", "174",
        "TRAIN.NUM_SAMPLES_LIMIT", "100",
    ])


def _labels_seen(ds, index, tries=30):
    return {int(ds[index]["label"]) for _ in range(tries)}


def test_ssv2_flip_remap_only_for_ssv2(tmp_path):
    # label 86 <-> 87 under flip for SSV2; K400 must NEVER remap even with
    # SSV2_FLIP inherited as true
    ds_ssv2 = build_dataset(_flip_cfg("ssv2", tmp_path), "train")
    assert _labels_seen(ds_ssv2, 86) == {86, 87}

    ds_k400 = build_dataset(_flip_cfg("kinetics400", tmp_path), "train")
    assert _labels_seen(ds_k400, 86) == {86}


def test_train_random_flip_dataset_flags():
    from dist_tpu.data.datasets import Kinetics400, Ssv2, Ucf101, Hmdb51

    assert Kinetics400.TRAIN_RANDOM_FLIP
    assert Ucf101.TRAIN_RANDOM_FLIP and Hmdb51.TRAIN_RANDOM_FLIP
    assert not Ssv2.TRAIN_RANDOM_FLIP


def test_transform_applies_horizontal_flip(tmp_path):
    """With an identity crop, the train transform flips ~half the time when
    TRAIN_RANDOM_FLIP is set and never when it isn't."""
    cfg = load_config(CFG, opts=[
        "OUTPUT_DIR", str(tmp_path),
        "DATA.TRAIN_JITTER_SCALES", "[1.0, 1.0]",
        "AUGMENTATION.RATIO", "[1.0, 1.0]",
        "AUGMENTATION.AUTOAUGMENT.ENABLE", "false",
        "AUGMENTATION.COLOR_AUG", "false",
        "AUGMENTATION.RANDOM_ERASING.ENABLE", "false",
    ])
    ds = build_dataset(cfg, "train")
    frames = np.zeros((4, 64, 64, 3), np.uint8)
    frames[:, :, :32] = 255  # left-right asymmetric
    flipped = frames[:, :, ::-1]

    ds.TRAIN_RANDOM_FLIP = True
    outcomes = set()
    for k in range(20):
        out = ds._transform(frames, -1, np.random.default_rng(k))
        outcomes.add("flip" if np.array_equal(out, flipped) else
                     "same" if np.array_equal(out, frames) else "other")
    assert outcomes == {"flip", "same"}

    ds.TRAIN_RANDOM_FLIP = False
    for k in range(10):
        out = ds._transform(frames, -1, np.random.default_rng(k))
        assert np.array_equal(out, frames)


def test_lr_schedule_num_folds_fold_epoch_semantics(tmp_path):
    """The train loop passes the FULL fold-epoch loader length as
    steps_per_epoch; lr_schedule_by_step itself multiplies by NUM_FOLDS
    (reference formula: epoch + num_folds * iter / len(loader))."""
    from dist_tpu.optim.lr_policy import lr_schedule_by_step

    cfg = load_config(CFG, opts=[
        "OUTPUT_DIR", str(tmp_path),
        "TRAIN.NUM_FOLDS", "4",
        "OPTIMIZER.BASE_LR", "1.0",
        "OPTIMIZER.LR_POLICY", "cosine",
        "OPTIMIZER.MAX_EPOCH", "8",
        "OPTIMIZER.WARMUP_EPOCHS", "2",
        "OPTIMIZER.WARMUP_START_LR", "0.01",
    ])
    fold_epoch_len = 40  # 4 folds x 10 steps
    sched = lr_schedule_by_step(cfg, steps_per_epoch=fold_epoch_len)
    # the loop runs MAX_EPOCH / NUM_FOLDS fold-epochs
    total_steps = (8 // 4) * fold_epoch_len

    # cosine must END (lr -> 0) exactly at the last step, not at
    # MAX_EPOCH/NUM_FOLDS and then oscillate back up
    assert float(sched(total_steps)) < 1e-6
    # warmup spans epochs [0, 2) -> the first 2/4 * 40 = 20 steps
    warm = [float(sched(c)) for c in range(0, 21)]
    assert all(b > a for a, b in zip(warm, warm[1:]))
    # after warmup the cosine is non-increasing through end of training
    post = [float(sched(c)) for c in range(20, total_steps + 1)]
    assert all(b <= a + 1e-9 for a, b in zip(post, post[1:]))
