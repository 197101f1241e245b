"""Longvideo dataset: real mp4 decode + HiCo clip placement."""

import os

import numpy as np
import pytest

from dist_tpu.config import load_config
from dist_tpu.config.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_video(path, n_frames=60, fps=30, size=48):
    import cv2
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    w = cv2.VideoWriter(path, fourcc, fps, (size, size))
    assert w.isOpened()
    for i in range(n_frames):
        frame = np.full((size, size, 3), i % 255, np.uint8)
        w.write(frame)
    w.release()


@pytest.fixture(scope="module")
def long_video_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("lv"))
    # one untrimmed "video" made of two 2s sub-clips
    for s, e in ((0, 2000), (2000, 4000)):
        _write_video(os.path.join(root, "training", f"v_vid1_{s}_{e}.mp4"))
    with open(os.path.join(root, "training.txt"), "w") as f:
        f.write("vid1,0,2000\nvid1,2000,4000\n")
    return root


def test_longvideo_hico_sampling(long_video_root):
    from dist_tpu.data.long_video import Longvideo

    cfg = load_config(os.path.join(REPO, "configs/pool/base.yaml"),
                      make_output_dir=False)
    cfg.DATA.DATA_ROOT_DIR = long_video_root
    cfg.DATA.ANNO_DIR = long_video_root
    cfg.DATA.NUM_INPUT_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.TRAIN.DATASET = "longvideo"
    cfg.PRETRAIN = Config({
        "ENABLE": True, "GENERATOR": "ContrastiveGenerator",
        "NUM_CLIPS_PER_VIDEO": 2})
    cfg.HICO = Config({"VCL": {"ENABLE": True, "MAX_DIS": 1.0},
                       "TCL": {"ENABLE": False},
                       "GRAUDAL_SAMPLING": {"ENABLE": False}})

    ds = Longvideo(cfg, "train")
    assert len(ds) == 1
    item = ds[0]
    assert item["video"].shape == (2, 4, 32, 32, 3)  # 2 views
    assert item["video"].dtype == np.uint8
    assert list(item["contrastive"]) == [0, 1]


def test_longvideo_gradual_epoch_rate(long_video_root):
    from dist_tpu.data.long_video import Longvideo

    cfg = load_config(os.path.join(REPO, "configs/pool/base.yaml"),
                      make_output_dir=False)
    cfg.DATA.DATA_ROOT_DIR = long_video_root
    cfg.DATA.ANNO_DIR = long_video_root
    cfg.DATA.NUM_INPUT_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 4
    cfg.TRAIN.DATASET = "longvideo"
    cfg.PRETRAIN = Config({"ENABLE": False, "NUM_CLIPS_PER_VIDEO": 2})
    cfg.HICO = Config({"VCL": {"ENABLE": False},
                       "TCL": {"ENABLE": False},
                       "GRAUDAL_SAMPLING": {"ENABLE": True,
                                            "MAX_DIS": [0.5, 3.0]}})
    ds = Longvideo(cfg, "train")
    rng = np.random.default_rng(0)

    def spread(rate, draws=64):
        ds.set_epoch_rate(rate)
        return np.mean([np.ptp(ds._clip_centers(4.0, rng)[0])
                        for _ in range(draws)])

    s0, s1 = spread(0.0), spread(1.0)
    ds.set_epoch_rate(0.0)
    assert len(ds._clip_centers(4.0, rng)[0]) == 2
    # MAX_DIS widens 0.5 -> 3.0 with the epoch rate: clips drawn at rate
    # 1.0 must be substantially farther apart on average (a no-op
    # set_epoch_rate would make the spreads equal)
    assert s1 > s0 * 1.5, (s0, s1)
