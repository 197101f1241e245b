#!/usr/bin/env python3
"""End-to-end input-pipeline benchmark on REAL disk video.

Generates N small mp4s (once, cached in /tmp), then measures:
  1. loader-only clips/s (decode -> sample -> crop -> batch),
  2. loader + device overlapped eval clips/s (the production loop shape).

Prints one JSON line per measurement. The bench host matters: this
container has ONE CPU core (nproc=1), so decode throughput here is a
floor, not a ceiling — the loader's thread pool and cross-batch prefetch
scale with DATA_LOADER.NUM_WORKERS on real hosts.

Usage: PYTHONPATH=/root/repo python tools/bench_pipeline.py [n_videos]

Worker-scaling sweep (publishes the measured clips/s vs workers curve):
  BENCH_SWEEP=1,2,4,8 BENCH_WORKER_TYPE=both BENCH_DEVICE=0 \
      python tools/bench_pipeline.py 48
BENCH_AUG=1 adds RandAugment (numpy-heavy, GIL-BOUND) to the sample work —
the case where `DATA_LOADER.WORKER_TYPE: process` beats the thread pool on
multi-core hosts.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_VIDEOS = int(sys.argv[1]) if len(sys.argv) > 1 else 48
VID_DIR = "/tmp/dist_tpu_bench_videos"
RES = (256, 256)
N_FRAMES = 48
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
DEVICE_EVAL = os.environ.get("BENCH_DEVICE", "1") == "1"


def make_videos():
    import cv2
    import numpy as np

    os.makedirs(VID_DIR, exist_ok=True)
    lines = []
    for i in range(N_VIDEOS):
        path = os.path.join(VID_DIR, f"v{i:04d}.mp4")
        lines.append(f"v{i:04d}.mp4 {i % 10}")
        if os.path.exists(path):
            continue
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, RES)
        rng = np.random.default_rng(i)
        base = rng.integers(0, 256, (RES[1], RES[0], 3), np.uint8)
        for t in range(N_FRAMES):
            frame = np.roll(base, t * 3, axis=1)
            wr.write(frame)
        wr.release()
    # both splits: the BENCH_AUG sweep measures the TRAIN pipeline (only
    # the train split runs RandAugment/AutoAugment)
    for name in ("kinetics400_test_list.txt", "kinetics400_train_list.txt"):
        with open(os.path.join(VID_DIR, name), "w") as f:
            f.write("\n".join(lines))


def _load_cfg(workers=None, worker_type=None):
    from dist_tpu.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opts = [
        "TEST.DATASET", "kinetics400",
        "TRAIN.DATASET", "kinetics400",
        "TEST.BATCH_SIZE", str(BATCH),
        "TRAIN.BATCH_SIZE", str(BATCH),
        "TEST.NUM_ENSEMBLE_VIEWS", "1",
        "TEST.NUM_SPATIAL_CROPS", "1",
        "DATA.DATA_ROOT_DIR", VID_DIR,
        "DATA.ANNO_DIR", VID_DIR,
        "DATA.DATASET_LABEL_TEXT.ENABLE", "false",
    ]
    if workers is not None:
        opts += ["DATA_LOADER.NUM_WORKERS", str(workers)]
    if worker_type is not None:
        opts += ["DATA_LOADER.WORKER_TYPE", worker_type]
    if os.environ.get("BENCH_AUG", "0") == "1":
        opts += ["AUGMENTATION.AUTOAUGMENT.ENABLE", "true"]
    return load_config(
        os.path.join(repo, "configs/projects/dist/ssv2/vit-b16-8+16f.yaml"),
        opts=opts, make_output_dir=False)


def _measure_loader(cfg, worker_type):
    from dist_tpu.data.builder import build_loader

    aug = os.environ.get("BENCH_AUG", "0") == "1"
    # augmentation only runs on the TRAIN split (base_dataset._transform),
    # so the aug sweep must measure the train pipeline
    split = "train" if aug else "test"
    loader = build_loader(cfg, split)
    n = 0
    if worker_type == "process":
        next(iter(loader))  # exclude worker spawn + dataset rebuild
    t0 = time.perf_counter()
    for batch in loader:
        n += batch["video"].shape[0]
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "loader_clips_per_sec",
                      "value": round(n / dt, 2),
                      "videos": N_VIDEOS, "workers": loader.num_workers,
                      "worker_type": worker_type, "split": split,
                      "aug": aug,
                      "host_cores": os.cpu_count()}), flush=True)
    return loader


def main():
    make_videos()

    sweep = os.environ.get("BENCH_SWEEP")
    if sweep:
        kinds = {"both": ("thread", "process")}.get(
            os.environ.get("BENCH_WORKER_TYPE", "thread"),
            (os.environ.get("BENCH_WORKER_TYPE", "thread"),))
        for kind in kinds:
            for w in [int(s) for s in sweep.split(",")]:
                _measure_loader(_load_cfg(w, kind), kind)
        return

    cfg = _load_cfg()
    loader = _measure_loader(cfg, "thread")

    if not DEVICE_EVAL:
        return

    # 2. overlapped loader -> device eval
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dist_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    from dist_tpu.models.base.models import build_model
    from dist_tpu.tasks.state import _prep_video

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    sample = next(iter(loader))
    variables = model.init(rng, {"video": jnp.zeros(
        (2,) + tuple(sample["video"].shape[1:]), jnp.float32)})
    tf = jax.random.normal(rng, (int(cfg.VIDEO.HEAD.NUM_CLASSES), 512),
                           jnp.float32)

    @jax.jit
    def forward(variables, video, tf):
        preds, _ = model.apply(
            variables, {"video": _prep_video(cfg, video),
                        "text_features": tf}, train=False)
        return preds

    out = forward(variables, jnp.asarray(sample["video"]), tf)  # compile
    np.asarray(jax.device_get(out[0, :1]))

    n = 0
    t0 = time.perf_counter()
    out = None
    for batch in loader:
        out = forward(variables, jnp.asarray(batch["video"]), tf)
        n += batch["video"].shape[0]
    np.asarray(jax.device_get(out[0, :1]))
    dt = time.perf_counter() - t0
    print(json.dumps({"metric": "e2e_clips_per_sec",
                      "value": round(n / dt, 2),
                      "videos": N_VIDEOS, "batch": BATCH}), flush=True)


if __name__ == "__main__":
    main()
