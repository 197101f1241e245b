#!/usr/bin/env python3
"""Dump per-module feature-map images for a video (or synthetic data).

The one-command front end for ``cfg.VISUALIZATION.*`` (reference
models/base/base_blocks.py:36-61): runs one forward with every submodule
output captured and writes channel-normalized tile images per sample per
module under ``FEATURE_MAPS.BASE_OUTPUT_DIR/VISUALIZATION.NAME/im_<i>/``.

Usage:
    PYTHONPATH=. python tools/visualize_features.py \
        --cfg configs/projects/tada/tada2d_k400.yaml \
        [--videos clip.mp4 ...] [KEY VALUE ...]

Without --videos the configured test dataset supplies the first batch
(``DATA.SYNTHETIC true`` works with no data on disk). A checkpoint loads
by the test-time priority (TEST.CHECKPOINT_FILE_PATH > last > TRAIN's).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--videos", nargs="*", default=None)
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()

    import numpy as np

    from dist_tpu.config import load_config
    from dist_tpu.models.base.models import build_model
    from dist_tpu.tasks.test import _init_test_state
    from dist_tpu.utils import checkpoint as cu
    from dist_tpu.utils.misc import enable_compile_cache
    from dist_tpu.utils.visualization import (
        maybe_dump_first_batch, visualization_enabled)

    enable_compile_cache()
    cfg = load_config(args.cfg, opts=list(args.opts))
    cfg.VISUALIZATION.ENABLE = True
    cfg.VISUALIZATION.FEATURE_MAPS.ENABLE = True
    assert visualization_enabled(cfg)

    model = build_model(cfg)

    if args.videos:
        # ad-hoc files: center-view decode, the classify.py serving path
        from dist_tpu.data import sampling, transforms
        from dist_tpu.data.base_dataset import probe_video, read_video
        clips = []
        for path in args.videos:
            # shared probe (native decoder w/ duration fallbacks, cv2
            # otherwise) — keeps probe and decode on the same backend
            total, fps = probe_video(path)
            fps = fps or 30.0
            idx = sampling.get_frame_indices(
                cfg, total, fps, 0, 1, rng=np.random.default_rng(0),
                random_sample=False)
            frames = read_video(path, idx)
            clips.append(transforms.kinetics_resized_crop_controlled(
                frames, cfg.DATA.TEST_SCALE, cfg.DATA.TEST_CROP_SIZE, 1, 0))
        video = np.ascontiguousarray(np.stack(clips))
    else:
        from dist_tpu.data.builder import build_loader
        video = next(iter(build_loader(cfg, "test")))["video"]

    state = _init_test_state(cfg, model, {"video": video})
    state = cu.load_test_checkpoint(cfg, state)

    text_features = None
    if getattr(model, "_is_clip", False):
        from dist_tpu.data.tokenizer import tokenize
        from dist_tpu.tasks.state import compute_text_features
        n = int(cfg.VIDEO.HEAD.NUM_CLASSES or 10)
        tokens = tokenize([f"a video of class {i}" for i in range(n)])
        text_features = compute_text_features(model, state.variables, tokens)

    n = maybe_dump_first_batch(cfg, model, state.variables,
                               {"video": video,
                                "text_features": text_features})
    print(f"wrote {n} feature maps")


if __name__ == "__main__":
    main()
