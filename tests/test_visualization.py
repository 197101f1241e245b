"""Feature-map visualization (reference base_blocks.py:36-61 hooks →
utils/visualization.py + the cfg.VISUALIZATION.* test-task gate)."""

import os

import numpy as np
import pytest

from dist_tpu.utils.visualization import (
    _iter_feature_maps,
    feature_map_image,
    visualization_enabled,
)


def test_feature_map_image_math():
    """Channel-axis normalization + (C*H, T*W) tiling, per the reference's
    rendering (base_blocks.py:45-48)."""
    x = np.zeros((1, 2, 2, 3, 4), np.float32)  # (B,T,H,W,C)
    x[0, :, :, :, 0] = 0.0
    x[0, :, :, :, 1] = 1.0
    x[0, :, :, :, 2] = 2.0
    x[0, :, :, :, 3] = 4.0
    img = feature_map_image(x)
    assert img.shape == (1, 4 * 2, 2 * 3)  # (B, C*H, T*W)
    # channel c normalized to (v - min)/(max - min) = v/4 across channels
    assert img[0, 0, 0] == 0          # channel 0 rows
    assert img[0, 2, 0] == 63         # channel 1: 1/4 * 255
    assert img[0, 4, 0] == 127        # channel 2: 2/4 * 255
    assert img[0, 6, 0] == 255        # channel 3: max
    # rows 0-1 are channel 0 (H=2), columns tile T frames side by side
    assert img.dtype == np.uint8


def test_iter_feature_maps_selects_5d():
    tree = {"conv1": {"__call__": (np.zeros((1, 2, 4, 4, 8)),)},
            "head": {"__call__": (np.zeros((1, 10)),)},
            "stage": {"blk": {"__call__": (np.zeros((1, 2, 4, 4, 3)),
                                           np.zeros((3,)))}}}
    got = dict(_iter_feature_maps(tree))
    assert set(got) == {"conv1", "stage.blk.0"}


def test_visualization_enabled_gate():
    from dist_tpu.config import load_config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(repo, "configs/pool/base.yaml"),
                      make_output_dir=False)
    assert not visualization_enabled(cfg)
    cfg.VISUALIZATION.ENABLE = True
    assert not visualization_enabled(cfg)  # FEATURE_MAPS still off
    cfg.VISUALIZATION.FEATURE_MAPS.ENABLE = True
    assert visualization_enabled(cfg)


@pytest.mark.slow
def test_dump_first_batch_writes_artifacts(tmp_path):
    """End to end on the tiny synthetic model: enabling cfg.VISUALIZATION.*
    produces im_<i>/<module>_feature.jpg files like the reference hooks."""
    from dist_tpu.config import load_config
    from dist_tpu.data.builder import build_loader
    from dist_tpu.models.base.models import build_model
    from dist_tpu.tasks.state import init_variables
    from dist_tpu.utils.visualization import maybe_dump_first_batch

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=["TEST.BATCH_SIZE", "2", "TEST.NUM_SAMPLES_LIMIT", "2",
              "TEST.NUM_ENSEMBLE_VIEWS", "1", "DATA_LOADER.NUM_WORKERS", "0",
              "VISUALIZATION.ENABLE", "true",
              "VISUALIZATION.FEATURE_MAPS.ENABLE", "true",
              "VISUALIZATION.NAME", "t",
              "OUTPUT_DIR", str(tmp_path)],
        make_output_dir=False)
    cfg.VISUALIZATION.FEATURE_MAPS.BASE_OUTPUT_DIR = str(tmp_path)
    model = build_model(cfg)
    batch = next(iter(build_loader(cfg, "test")))
    variables = init_variables(cfg, model, batch["video"].shape[1:])

    tokens = getattr(build_loader(cfg, "test").dataset, "text_tokens", None)
    tf = None
    if tokens is not None and getattr(model, "_is_clip", False):
        from dist_tpu.tasks.state import compute_text_features
        tf = compute_text_features(model, variables, tokens)

    n = maybe_dump_first_batch(cfg, model, variables,
                               {"video": batch["video"],
                                "text_features": tf})
    assert n > 0
    root = os.path.join(str(tmp_path), "t")
    files = []
    for d, _, fs in os.walk(root):
        files += [os.path.join(d, f) for f in fs]
    assert n == len(files)
    assert any(f.endswith("_feature.jpg") for f in files)
    assert os.path.isdir(os.path.join(root, "im_0"))
