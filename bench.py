#!/usr/bin/env python3
"""Benchmark: DiST CLIP ViT-B/16 8-frame throughput (clips/sec/chip).

The BASELINE.json north-star metric: multi-view eval throughput of the
flagship config on one chip, plus the train-step throughput of the same
config so round-over-round train perf is tracked like eval perf. Prints one
JSON line per metric (eval first — the primary metric):
  {"metric": "clips_per_sec_per_chip", "value": N, "unit": "clips/s", "vs_baseline": N}
  {"metric": "train_clips_per_sec_per_chip", ...}

``vs_baseline``: the reference never published throughput (SURVEY.md
section 6); we normalize against a fixed reference budget of 32 clips/s/chip
(8xV100 wall-clock-equivalent share for ViT-B/16 8f eval) so the number is
comparable across rounds.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_CLIPS_PER_SEC = 32.0

# benchmark knobs (overridable via env for experimentation).
# Batch 16 is the measured single-chip throughput sweet spot for the
# flagship eval (8: 319, 16: 325, 32: 293 clips/s on v5e).
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
ITERS = int(os.environ.get("BENCH_ITERS", "40"))
WARMUP = int(os.environ.get("BENCH_WARMUP", "2"))
# eval | train | both (default: both — BENCH_r{N}.json carries both metrics)
MODE = os.environ.get("BENCH_MODE", "both")
CFG = os.environ.get("BENCH_CFG",
                     "configs/projects/dist/ssv2/vit-b16-8+16f.yaml")
# extra dotted-key overrides, e.g. BENCH_OPTS="TRAIN.MIXED_PRECISION true"
OPTS = os.environ.get("BENCH_OPTS", "").split()


def _build(cfg):
    import jax
    import jax.numpy as jnp

    from dist_tpu.models.base.models import build_model

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    frames = int(cfg.DATA.NUM_INPUT_FRAMES)
    crop = int(cfg.DATA.TEST_CROP_SIZE or 224)
    n_cls_cfg = cfg.VIDEO.HEAD.NUM_CLASSES
    # EPIC dual-head configs carry [verb, noun] class counts; the text
    # features are unused there but still need a concrete shape.
    n_cls = (int(n_cls_cfg[0]) if isinstance(n_cls_cfg, (list, tuple))
             else int(n_cls_cfg))
    from dist_tpu.models.clip.model import ARCHITECTURES
    arch = ARCHITECTURES.get(cfg.VIDEO.BACKBONE.META_ARCH_NAME)
    embed = arch.embed_dim if arch else 512
    video_u8 = jax.random.randint(
        rng, (BATCH, frames, crop, crop, 3), 0, 255, jnp.int32).astype(jnp.uint8)
    variables = model.init(rng, {"video": video_u8.astype(jnp.float32)})
    text_features = jax.random.normal(rng, (n_cls, embed), jnp.float32)
    return model, variables, video_u8, text_features, n_cls_cfg, rng


def _measure(forward, variables, video_u8, text_features):
    import jax
    import numpy as np

    def sync(x):
        # block_until_ready is a no-op through the axon tunnel; a
        # device->host transfer is the reliable sync point
        if isinstance(x, dict):  # e.g. EPIC dual-head {verb, noun} preds
            x = next(iter(x.values()))
        return np.asarray(jax.device_get(x[0, :1]))

    out = forward(variables, video_u8, text_features)
    sync(out)
    for _ in range(WARMUP):
        sync(forward(variables, video_u8, text_features))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(variables, video_u8, text_features)
    sync(out)
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def run(mode, cfg, built):
    import jax
    import jax.numpy as jnp

    model, variables, video_u8, text_features, n_cls_cfg, rng = built
    from dist_tpu.tasks.state import _prep_video

    if mode == "train":
        from dist_tpu.optim.optimizer import construct_optimizer
        from dist_tpu.tasks.state import create_train_state, make_train_step

        tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch=100)
        state = create_train_state(variables, tx)
        # donate the state like the real train loop (tasks/train.py) —
        # without donation the step double-buffers params+moments (~2 GiB
        # at ViT-L/14), which both misstates throughput and shrinks the
        # measurable HBM fit boundary
        donate = (0,) if cfg.TPU.get("DONATE_STATE", True) else ()
        step = jax.jit(make_train_step(model, cfg, tx, lr_fn),
                       donate_argnums=donate)
        batch = {"video": video_u8,
                 "labels": jnp.zeros((BATCH,), jnp.int32),
                 "text_features": text_features}
        if isinstance(n_cls_cfg, (list, tuple)):
            # EPIC dual-head: the step reads batch["labels"] plus the
            # verb/noun keys (tasks/state.py make_train_step)
            batch["label_verb"] = jnp.zeros((BATCH,), jnp.int32)
            batch["label_noun"] = jnp.zeros((BATCH,), jnp.int32)

        def forward(variables, video, text_features):
            nonlocal state
            state, metrics = step(state, batch, rng)
            return metrics["loss"][None, None]
    else:
        @jax.jit
        def forward(variables, video, text_features):
            preds, _ = model.apply(
                variables,
                {"video": _prep_video(cfg, video),
                 "text_features": text_features},
                train=False)
            return preds

    clips_per_sec = _measure(forward, variables, video_u8, text_features)
    metric = ("train_clips_per_sec_per_chip" if mode == "train"
              else "clips_per_sec_per_chip")
    out = {
        "metric": metric,
        "value": round(clips_per_sec, 2),
        "unit": "clips/s",
        "vs_baseline": round(clips_per_sec / REFERENCE_CLIPS_PER_SEC, 3),
    }
    if os.environ.get("BENCH_MEMSTATS"):
        # HBM accounting for recipe documentation (peak/in-use bytes);
        # not every PJRT backend exposes memory_stats
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
            for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit"):
                if k in ms:
                    out[k] = int(ms[k])
        except Exception:
            pass
    return out


def main():
    from dist_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    from dist_tpu.config import load_config

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = load_config(os.path.join(repo, CFG),
                      opts=["TRAIN.BATCH_SIZE", str(BATCH)] + OPTS,
                      make_output_dir=False)
    built = _build(cfg)
    modes = ("eval", "train") if MODE == "both" else (MODE,)
    for mode in modes:
        print(json.dumps(run(mode, cfg, built)), flush=True)


if __name__ == "__main__":
    main()
