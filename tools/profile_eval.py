#!/usr/bin/env python3
"""Component-level timing of the flagship DiST B/16 8+16f eval step on the
real chip. Times each piece with the device_get sync (block_until_ready does
not synchronize through the axon tunnel) and prints one JSON line per
component, so the perf work can attack the real top sinks instead of guesses.

Components:
  matmul_peak   8192^3 bf16 matmul chain  (speed-of-light calibration)
  full_eval     the bench.py forward (uint8 prep + tower + dist + cosine)
  tower_taps    VisionTransformer WITH per-layer taps (the DiST input path)
  tower_notaps  VisionTransformer without taps (tap-write overhead)
  dist_net      DiSTNetwork alone on dummy taps + video
  attn_kernel   fused attention at the tower shape (64, 197, 12*64*3)
  ln_gelu       LayerNorm+QuickGELU micro at tower activation shapes

Usage: PYTHONPATH=/root/repo python tools/profile_eval.py [components...]
BENCH_CFG selects the config (default: the flagship B/16 8+16f); shapes
(tokens/width/heads/taps) derive from its architecture, so the same tool
profiles the L/14 32+64f path.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
ITERS = int(os.environ.get("BENCH_ITERS", "40"))
CFG = os.environ.get("BENCH_CFG",
                     "configs/projects/dist/ssv2/vit-b16-8+16f.yaml")


def main():
    import jax

    from dist_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from dist_tpu.config import load_config
    from dist_tpu.models.base.models import build_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, CFG),
        opts=["TRAIN.BATCH_SIZE", str(BATCH)], make_output_dir=False)

    from dist_tpu.models.clip.model import ARCHITECTURES
    arch = ARCHITECTURES[cfg.VIDEO.BACKBONE.META_ARCH_NAME]
    tokens = arch.grid_size ** 2 + 1
    width, heads = arch.vision_width, arch.vision_heads
    # analytic per-sparse-frame tower FLOPs (mul-add = 2 FLOPs):
    # per layer: qkv 6T*d^2 + out 2T*d^2 + mlp 16T*d^2 + attn 4T^2*d
    #            == 24*T*d^2 + 4*T^2*d
    frame_flops = arch.vision_layers * (
        24 * tokens * width ** 2 + 4 * tokens ** 2 * width)

    want = set(sys.argv[1:]) or {
        "matmul_peak", "full_eval", "tower_taps", "tower_notaps",
        "dist_net", "attn_kernel", "ln_gelu"}

    def sync(x):
        return np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))

    def bench(name, fn, *args, flops=None, iters=ITERS):
        t_c0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        compile_s = time.perf_counter() - t_c0
        for _ in range(3):
            sync(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        rec = {"component": name, "ms": round(dt * 1e3, 3),
               "compile_s": round(compile_s, 1)}
        if flops:
            rec["tflops"] = round(flops / dt / 1e12, 1)
        print(json.dumps(rec), flush=True)
        return dt

    rng = jax.random.PRNGKey(0)

    if "matmul_peak" in want:
        n = 8192
        a = jax.random.normal(rng, (n, n), jnp.bfloat16)

        @jax.jit
        def chain(a):
            x = a
            for _ in range(8):
                x = x @ a
            return x

        bench("matmul_peak", chain, a, flops=8 * 2 * n ** 3, iters=10)

    model = build_model(cfg)
    frames = int(cfg.DATA.NUM_INPUT_FRAMES)
    alpha = int(cfg.DATA.SPARSE_SAMPLE_ALPHA or 1)
    res = arch.image_resolution
    video_u8 = jax.random.randint(
        rng, (BATCH, frames, res, res, 3), 0, 255, jnp.int32).astype(jnp.uint8)
    variables = model.init(rng, {"video": video_u8.astype(jnp.float32)})
    n_cls = int(cfg.VIDEO.HEAD.NUM_CLASSES)
    text_features = jax.random.normal(rng, (n_cls, arch.embed_dim), jnp.float32)

    from dist_tpu.tasks.state import _prep_video

    if "full_eval" in want:
        @jax.jit
        def full(variables, video, tf):
            preds, _ = model.apply(
                variables, {"video": _prep_video(cfg, video),
                            "text_features": tf}, train=False)
            return preds

        bench("full_eval", full, variables, video_u8, text_features,
              flops=frame_flops * BATCH * (frames // alpha))

    clip = model.module  # CLIPDiSTModel
    clip_vars = {"params": variables["params"]}
    video_f = jnp.asarray(_prep_video(cfg, video_u8), jnp.float32)

    if "tower_taps" in want:
        @jax.jit
        def tower_t(v, video):
            return clip.apply(v, video, collect_taps=True,
                              method=lambda m, vid, collect_taps:
                              m.visual(vid, collect_taps=collect_taps))

        bench("tower_taps", tower_t, clip_vars, video_f,
              flops=frame_flops * BATCH * (frames // alpha))

    if "tower_notaps" in want:
        @jax.jit
        def tower_n(v, video):
            return clip.apply(v, video, collect_taps=False,
                              method=lambda m, vid, collect_taps:
                              m.visual(vid, collect_taps=collect_taps))

        bench("tower_notaps", tower_n, clip_vars, video_f,
              flops=frame_flops * BATCH * (frames // alpha))

    if "dist_net" in want:
        t = frames // alpha
        n_sel = len(cfg.VIDEO.BACKBONE.DIST.SELECTED_LAYERS)
        taps = jax.random.normal(
            rng, (n_sel, BATCH * t, tokens, width), jnp.bfloat16)

        @jax.jit
        def dnet(v, video, taps):
            return clip.apply(
                v, video, taps,
                method=lambda m, vid, tp: m.dist_net(vid, tp))

        bench("dist_net", dnet, clip_vars, video_f, taps)

    if "attn_kernel" in want:
        from dist_tpu.ops.attention import fused_attention_qkv
        bt = BATCH * frames // alpha
        qkv = jax.random.normal(rng, (bt, tokens, 3 * width), jnp.bfloat16)
        f = jax.jit(lambda q: fused_attention_qkv(q, heads, False))
        bench("attn_kernel_x1", f, qkv,
              flops=4 * tokens * tokens * width * bt)

    if "ln_gelu" in want:
        from dist_tpu.models.base.blocks import LayerNorm, quick_gelu
        import flax.linen as nn
        bt = BATCH * frames // alpha
        x = jax.random.normal(rng, (bt, tokens, width), jnp.bfloat16)
        ln = LayerNorm()
        lv = ln.init(rng, x)
        f = jax.jit(lambda v, x: quick_gelu(ln.apply(v, x)))
        bench("ln_gelu_x1", f, lv, x)


if __name__ == "__main__":
    main()
