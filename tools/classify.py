#!/usr/bin/env python3
"""Classify video files with a trained checkpoint — the minimal serving
entry (multi-view score-sum ensemble, the reference's test protocol
``runs/test.py:24-178`` applied to ad-hoc files instead of a dataset).

Usage:
  PYTHONPATH=. python tools/classify.py --cfg configs/projects/dist/k400/vit-b16-8+16f-eval.yaml \
      --videos clip1.mp4 clip2.mp4 [--topk 5] [KEY VALUE ...]

Checkpoint resolution follows the test-task priority (TEST.CHECKPOINT_FILE_PATH
> last train checkpoint > TRAIN.CHECKPOINT_FILE_PATH); torch ``.pyth``/``.pt``
checkpoints convert at load. ``TPU.SHARD_FRAMES true`` spreads a single
video's frames across the device mesh.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--videos", nargs="+", required=True)
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dist_tpu.config import load_config
    from dist_tpu.data import sampling, transforms
    from dist_tpu.data.base_dataset import read_video
    from dist_tpu.models.base.models import build_model
    from dist_tpu.parallel.mesh import build_mesh, shard_batch
    from dist_tpu.tasks.state import make_eval_step
    from dist_tpu.tasks.test import _init_test_state
    from dist_tpu.utils import checkpoint as cu

    cfg = load_config(args.cfg, opts=list(args.opts), make_output_dir=False)
    assert not isinstance(cfg.VIDEO.HEAD.NUM_CLASSES, (list, tuple)), (
        "classify.py handles single-label heads; for EPIC verb/noun use "
        "runs/run.py with SUBMISSION.ENABLE true")
    model = build_model(cfg)
    mesh = build_mesh(cfg)
    num_frames = int(cfg.DATA.NUM_INPUT_FRAMES)
    views = int(cfg.TEST.NUM_ENSEMBLE_VIEWS)
    crops = int(cfg.TEST.NUM_SPATIAL_CROPS)

    # same init + checkpoint priority chain as the test task
    state = _init_test_state(cfg, model, {"video": np.zeros(
        (1, num_frames, cfg.DATA.TEST_CROP_SIZE, cfg.DATA.TEST_CROP_SIZE, 3),
        np.float32)})
    state = cu.load_test_checkpoint(cfg, state)

    # label names + text features for the cosine-similarity classifier —
    # the gate and fallbacks shared with the serving engine
    # (data/base_dataset.py::resolve_label_texts)
    from dist_tpu.data.base_dataset import resolve_label_texts
    text_features = None
    # NUM_CLASSES is guaranteed scalar by the dual-head assert above
    label_names, tokens = resolve_label_texts(
        cfg, int(cfg.VIDEO.HEAD.NUM_CLASSES))
    if tokens is not None:
        from dist_tpu.tasks.state import compute_text_features
        text_features = compute_text_features(model, state.variables, tokens)

    eval_step = jax.jit(make_eval_step(model, cfg))
    shard_frames = bool(cfg.get("TPU") and cfg.TPU.get("SHARD_FRAMES"))

    with mesh:
        for path in args.videos:
            from dist_tpu.data.base_dataset import probe_video
            # shared probe (native decoder w/ duration fallbacks, cv2
            # otherwise) — keeps probe and decode on the same backend
            total, fps = probe_video(path)
            fps = fps or 30.0
            clips = []
            for v in range(views):
                idx = sampling.get_frame_indices(
                    cfg, total, fps, v, views,
                    rng=np.random.default_rng(0), random_sample=False)
                frames = read_video(path, idx)
                for s in range(crops):
                    clips.append(transforms.kinetics_resized_crop_controlled(
                        frames, cfg.DATA.TEST_SCALE, cfg.DATA.TEST_CROP_SIZE,
                        crops, s))
            video = np.ascontiguousarray(np.stack(clips))  # (views*crops, T, S, S, 3)
            batch = {"video": video,
                     "labels": np.zeros((video.shape[0],), np.int64)}
            batch = shard_batch(mesh, batch, shard_frames=shard_frames) \
                if video.shape[0] % mesh.devices.size == 0 or shard_frames \
                else batch
            if text_features is not None:
                batch["text_features"] = text_features
            preds = np.asarray(eval_step(state, batch)["preds"])
            scores = preds.sum(axis=0)  # score-sum ensemble (meters.py:102-107)
            top = np.argsort(scores)[::-1][:args.topk]
            print(f"\n{path}:")
            for rank, cls in enumerate(top, 1):
                name = label_names[cls] if label_names else f"class {cls}"
                print(f"  {rank}. {name}  (score {scores[cls]:.4f})")


if __name__ == "__main__":
    main()
