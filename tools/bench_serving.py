#!/usr/bin/env python3
"""Measure the serving path on the real chip (latency + throughput).

Drives ``dist_tpu.serving`` exactly as production would — the
InferenceEngine's bucketed jit through the MicroBatcher — and reports:

- batch-1 request latency (p50 / p99) through the engine,
- the same through the MicroBatcher at low occupancy (adds the batching
  delay budget),
- sustained clips/s under saturating offered load (MicroBatcher fed by
  concurrent client threads),
- bucketed vs padded-to-max device cost for small requests (the win of
  ``InferenceEngine._buckets``).

Prints one JSON object; intended for the README serving table.

Usage:
  PYTHONPATH=/root/.axon_site:. python tools/bench_serving.py \
      [--cfg configs/projects/dist/ssv2/vit-b16-8+16f.yaml] [--batch 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _percentiles(samples_ms):
    import numpy as np
    a = np.asarray(samples_ms)
    return {"p50_ms": round(float(np.percentile(a, 50)), 2),
            "p99_ms": round(float(np.percentile(a, 99)), 2),
            "mean_ms": round(float(a.mean()), 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/projects/dist/ssv2/vit-b16-8+16f.yaml")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--load-seconds", type=float, default=10.0)
    ap.add_argument("--max-delay-ms", type=float, default=10.0)
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()

    import numpy as np

    from dist_tpu.config import load_config
    from dist_tpu.serving.batcher import MicroBatcher
    from dist_tpu.serving.engine import InferenceEngine
    from dist_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = args.cfg if os.path.isabs(args.cfg) else os.path.join(repo, args.cfg)
    cfg = load_config(cfg_path, opts=list(args.opts), make_output_dir=False)

    engine = InferenceEngine(cfg, batch_size=args.batch)
    t0 = time.perf_counter()
    engine.warmup()
    warmup_s = time.perf_counter() - t0

    shape = (engine.num_frames, engine.crop, engine.crop, 3)
    clip1 = np.random.default_rng(0).integers(
        0, 255, (1,) + shape, np.uint8)
    clip_full = np.broadcast_to(clip1, (args.batch,) + shape).copy()

    # --- batch-1 engine latency (bucket 1) ---
    lat1 = []
    for _ in range(args.iters):
        t = time.perf_counter()
        engine.predict(clip1)
        lat1.append((time.perf_counter() - t) * 1e3)

    # --- padded-to-max comparison: same single clip at the full bucket ---
    lat_pad = []
    for _ in range(args.iters):
        t = time.perf_counter()
        engine.predict(clip_full)
        lat_pad.append((time.perf_counter() - t) * 1e3)

    # --- MicroBatcher: batch-1 at low occupancy (adds the delay budget) ---
    batcher = MicroBatcher(engine.predict, max_batch=args.batch,
                           max_delay_ms=args.max_delay_ms)
    lat_mb = []
    for _ in range(args.iters):
        t = time.perf_counter()
        batcher.submit(clip1[0]).result()
        lat_mb.append((time.perf_counter() - t) * 1e3)

    # --- saturating load: concurrent clients through the MicroBatcher ---
    import threading
    stop = threading.Event()
    done = [0]
    lock = threading.Lock()

    def client():
        while not stop.is_set():
            futs = [batcher.submit(clip1[0]) for _ in range(4)]
            for f in futs:
                f.result()
            with lock:
                done[0] += len(futs)

    clients = [threading.Thread(target=client) for _ in range(2 * args.batch)]
    t0 = time.perf_counter()
    for c in clients:
        c.start()
    time.sleep(args.load_seconds)
    stop.set()
    for c in clients:
        c.join()
    dt = time.perf_counter() - t0
    sustained = done[0] / dt
    batcher.close()

    result = {
        "config": os.path.relpath(cfg_path, repo),
        "batch_size": args.batch,
        "buckets": engine._buckets(),
        "warmup_s": round(warmup_s, 1),
        "engine_batch1": _percentiles(lat1),
        "engine_full_batch": dict(_percentiles(lat_pad),
                                  clips_per_sec=round(
                                      args.batch * 1e3 /
                                      float(np.mean(lat_pad)), 1)),
        "batch1_bucketed_vs_padded_speedup": round(
            float(np.mean(lat_pad)) / float(np.mean(lat1)), 2),
        "microbatcher_batch1": _percentiles(lat_mb),
        "sustained_load": {
            "clients": 2 * args.batch,
            "clips_per_sec": round(sustained, 1),
            "seconds": round(dt, 1),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
