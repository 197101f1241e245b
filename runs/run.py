#!/usr/bin/env python3
"""CLI entry: train / test / multi-view test / submission run list.

API-compatible with the reference's ``runs/run.py`` contract:

    python runs/run.py --cfg configs/projects/dist/ssv2/vit-b16-8+16f.yaml \
        [KEY VALUE ...]

Builds the run list exactly like ``_prepare_data`` (runs/run.py:20-79):
train -> single-view test -> automatic multi-view test (per-dataset view
policy, overridable via TEST.OVERRIDE_MULTI_SCALE_TEST) -> optional
submission. On TPU there is no process spawning (``launch_task`` /
torch.multiprocessing, utils/launcher.py) — each entry runs in this
single-controller process over the device mesh.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dist_tpu.config.config import load_from_args  # noqa: E402


def _prepare_data(cfg):
    from dist_tpu.tasks.test import test
    from dist_tpu.tasks.train import train
    from dist_tpu.tasks.submission import submission_test

    if cfg.TASK_TYPE in ("classification",):
        train_func, test_func = train, test
    elif cfg.TASK_TYPE in ("submission",):
        cfg.TRAIN.ENABLE = False
        cfg.TEST.ENABLE = False
        train_func, test_func = None, None
    else:
        raise ValueError(f"unknown TASK_TYPE {cfg.TASK_TYPE}")

    run_list = []
    if cfg.TRAIN.ENABLE:
        run_list.append([cfg.deep_copy(), train_func])
    if cfg.TEST.ENABLE:
        run_list.append([cfg.deep_copy(), test_func])
        if cfg.TEST.AUTOMATIC_MULTI_SCALE_TEST:
            cfg.LOG_MODEL_INFO = False
            cfg.LOG_CONFIG_INFO = False
            cfg.TEST.NUM_ENSEMBLE_VIEWS = 10
            cfg.TEST.NUM_SPATIAL_CROPS = 1
            ds = str(cfg.TEST.DATASET)
            if "kinetics" in ds or "epickitchen" in ds:
                cfg.TEST.NUM_SPATIAL_CROPS = 3
            if "imagenet" in ds and not cfg.PRETRAIN.ENABLE:
                cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
                cfg.TEST.NUM_SPATIAL_CROPS = 3
            if "ssv2" in ds:
                cfg.TEST.NUM_ENSEMBLE_VIEWS = 3
                cfg.TEST.NUM_SPATIAL_CROPS = 1
            if cfg.TEST.OVERRIDE_MULTI_SCALE_TEST.ENABLE:
                cfg.TEST.NUM_ENSEMBLE_VIEWS = (
                    cfg.TEST.OVERRIDE_MULTI_SCALE_TEST.NUM_ENSEMBLE_VIEWS)
                cfg.TEST.NUM_SPATIAL_CROPS = (
                    cfg.TEST.OVERRIDE_MULTI_SCALE_TEST.NUM_SPATIAL_CROPS)
            cfg.TEST.LOG_FILE = "val_{}clipsx{}crops.log".format(
                cfg.TEST.NUM_ENSEMBLE_VIEWS, cfg.TEST.NUM_SPATIAL_CROPS)
            run_list.append([cfg.deep_copy(), test_func])
    if cfg.SUBMISSION.ENABLE:
        cfg.LOG_MODEL_INFO = False
        cfg.TEST.NUM_ENSEMBLE_VIEWS = 10
        cfg.TEST.NUM_SPATIAL_CROPS = 3
        cfg.TEST.LOG_FILE = "test_{}clipsx{}crops.log".format(
            cfg.TEST.NUM_ENSEMBLE_VIEWS, cfg.TEST.NUM_SPATIAL_CROPS)
        run_list.append([cfg.deep_copy(), submission_test])
    return run_list


def main():
    from dist_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    cfg = load_from_args()
    run_list = _prepare_data(cfg)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    for run_cfg, func in run_list:
        func(run_cfg)
    print(f"Finish running with config: {cfg.args.cfg_file}")


if __name__ == "__main__":
    main()
