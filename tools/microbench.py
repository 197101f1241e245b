#!/usr/bin/env python3
"""Microbenchmark harness for the hot-path kernels (one JSON line per
measurement). Consolidates the round-1/2 numbered experiment scripts whose
conclusions live in README ("Eval-path floor analysis" / "Train path")
into one parameterized tool.

Usage:  PYTHONPATH=. python tools/microbench.py <subcommand> [names...]

  attn     shipped Pallas fused-QKV attention vs XLA lowering vs
           multi-batch-row grid variants (B/16 tower shape 64x197x768)
  stem     TemporalPatchStem formulations: patchify-transpose GEMM vs
           transpose-free per-row decomposition; CLIP tower conv1
           dense vs sparse-first
  conv33   TemporalNet (1,3,3) conv vs shift-add matmul dual, fwd+bwd
  int8     int8 vs bf16 GEMM at the tower's four GEMM shapes
  dist     DiST side-network sub-component forward timing
           (names: dist_full dist_full_fused stem temporal_net integration
            input_linear t2i i2t adapool)
  bwd      DiSTNetwork / stem fwd+bwd in isolation (names filter the
           variants; the fused-vs-unfused parity probe — two extra ladder
           compiles — runs only with no names or the name `parity`)
  bwd_parts  per-module fwd+bwd of every ladder component (is any module
           off its bandwidth/matmul floor? names as for `dist`)
  train    train-step component breakdown: full step vs loss fwd+bwd vs
           optimizer-only (BENCH_CFG selects the config; default the
           flagship B/16 8+16f, also works for conv backbones + BENCH_OPTS)

All timings use in-jit repetition (a lax.fori_loop over the op with a
carry-dependent input so CSE can't collapse the reps, consuming a
reduction of every output so nothing is DCE'd): the axon tunnel adds
~2.5 ms of host overhead PER JIT DISPATCH, which would swamp
sub-millisecond ops. Compare variants only WITHIN one run.

Env knobs: REPS (in-jit repetitions), BENCH_BATCH (batch size).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("REPS", "20"))
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
CFG = os.environ.get("BENCH_CFG",
                     "configs/projects/dist/ssv2/vit-b16-8+16f.yaml")
OPTS = os.environ.get("BENCH_OPTS", "").split()


def _enable_cache():
    from dist_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()


def _sync(x):
    import jax
    import numpy as np
    return np.asarray(jax.device_get(
        jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def _tree_sum(t):
    import jax
    import jax.numpy as jnp
    return sum(jnp.sum(l.astype(jnp.float32))
               for l in jax.tree_util.tree_leaves(t) if hasattr(l, "dtype"))


def _make_reps(f, x):
    """In-jit repetition of y = f(x'): the carry perturbs the input by an
    epsilon each iteration (defeats CSE) and reduces the output (defeats
    DCE)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def reps(x):
        def body(i, carry):
            out = f(x + (carry * 1e-12).astype(x.dtype))
            out = out[0] if isinstance(out, tuple) else out
            return jnp.mean(out, dtype=jnp.float32)
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))
    return reps


def _time_reps(name, reps_fn, *args, extra=None, outer=5):
    """Compile, warm, time `outer` outer dispatches of REPS in-jit reps."""
    try:
        t0 = time.perf_counter()
        _sync(reps_fn(*args))
        compile_s = time.perf_counter() - t0
        for _ in range(2):
            _sync(reps_fn(*args))
        t0 = time.perf_counter()
        for _ in range(outer):
            out = reps_fn(*args)
        _sync(out)
        per = (time.perf_counter() - t0) / outer / REPS
        rec = {"variant": name, "ms": round(per * 1e3, 3),
               "compile_s": round(compile_s, 1)}
        if extra:
            rec.update(extra)
        print(json.dumps(rec), flush=True)
    except Exception as e:
        print(json.dumps({"variant": name, "error": repr(e)[-300:]}),
              flush=True)


def _timeit(name, f, x, ref=None):
    """Time f(x); optionally report max-abs-diff against ref(x)."""
    import jax
    import numpy as np
    extra = None
    if ref is not None:
        try:
            got = np.asarray(jax.device_get(jax.jit(f)(x)), np.float32)
            want = np.asarray(jax.device_get(ref(x)), np.float32)
            extra = {"max_abs_diff": float(np.max(np.abs(got - want)))}
        except Exception as e:
            extra = {"check_error": repr(e)[-200:]}
    _time_reps(name, _make_reps(f, x), x, extra=extra)


# ---------------------------------------------------------------- attn ----

def cmd_attn(_names):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from dist_tpu.ops.attention import _pallas_attention_qkv

    rng = jax.random.PRNGKey(0)
    B, L, H, HD = 64, 197, 12, 64
    D = H * HD
    qkv = jax.random.normal(rng, (B, L, 3 * D), jnp.bfloat16)
    cur = jax.jit(lambda x: _pallas_attention_qkv(x, H, False))

    def xla_attn(x):
        q, k, v = jnp.split(x, 3, axis=-1)

        def heads(y):
            return y.reshape(B, L, H, HD).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)
        s = jnp.einsum("bhld,bhmd->bhlm", q * HD ** -0.5, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhlm,bhmd->bhld", p, v)
        return o.transpose(0, 2, 1, 3).reshape(B, L, D)

    def kernel_nb(x_ref, o_ref, *, nb, num_heads, d):
        hd = d // num_heads
        scale = hd ** -0.5
        for bi in range(nb):
            for h in range(num_heads):
                q = x_ref[bi, :, h * hd:(h + 1) * hd]
                k = x_ref[bi, :, d + h * hd:d + (h + 1) * hd]
                v = x_ref[bi, :, 2 * d + h * hd:2 * d + (h + 1) * hd]
                s = jax.lax.dot_general(
                    q.astype(jnp.float32) * scale, k.astype(jnp.float32),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                s = s - jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o = jnp.dot(p.astype(x_ref.dtype), v,
                            preferred_element_type=jnp.float32)
                o_ref[bi, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)

    def make_nb(nb):
        def run(x):
            return pl.pallas_call(
                functools.partial(kernel_nb, nb=nb, num_heads=H, d=D),
                grid=(B // nb,),
                in_specs=[pl.BlockSpec((nb, L, 3 * D), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((nb, L, D), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
            )(x)
        return run

    _timeit("attn_pallas_shipped", cur, qkv)
    _timeit("attn_xla", xla_attn, qkv, ref=cur)
    for nb in (2, 4, 8):
        _timeit(f"attn_pallas_rows{nb}", jax.jit(make_nb(nb)), qkv, ref=cur)


# ---------------------------------------------------------------- stem ----

def cmd_stem(_names):
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (BATCH, 16, 224, 224, 3), jnp.float32)
    p, tp, C, T = 16, 5, 96, 16
    kern = jax.random.normal(rng, (tp, p, p, 3, C), jnp.bfloat16)

    # shipped formulation: patchify transpose + one GEMM + temporal
    # shift-add over lane slices (dist_net.py::TemporalPatchStem)
    def patchify(x):
        b, t, h, w_, ci = x.shape
        hh, ww = h // p, w_ // p
        x = x.astype(jnp.bfloat16).reshape(b, t, hh, p, ww, p, ci)
        return x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, t, hh * ww,
                                                        p * p * ci)

    w_flat = kern.reshape(tp, p * p * 3, C)
    w_all = jnp.transpose(w_flat, (1, 0, 2)).reshape(p * p * 3, tp * C)

    def tail(y):
        pad = tp // 2
        yp = jnp.pad(y, ((0, 0), (pad, pad), (0, 0), (0, 0)))
        out = yp[:, 0:T, :, 0:C]
        for d in range(1, tp):
            out = out + yp[:, d:d + T, :, d * C:(d + 1) * C]
        return out

    def stem_transpose(x):
        return tail(patchify(x) @ w_all)

    # transpose-free: one matmul per within-patch row offset
    wk = jnp.transpose(kern, (1, 2, 3, 0, 4))
    w_dh = wk.reshape(p, p * 3, tp * C)

    def stem_rows(x):
        b, t, H, W, ci = x.shape
        hh = H // p
        xb = x.astype(jnp.bfloat16).reshape(b, t, hh, p, W * ci)
        acc = None
        for dh in range(p):
            rows = xb[:, :, :, dh, :].reshape(b, t, hh, W // p, p * ci)
            y = jax.lax.dot_general(
                rows, w_dh[dh], (((4,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        y = acc.astype(jnp.bfloat16).reshape(b, t, hh * (W // p), tp * C)
        return tail(y)

    ref = jax.jit(stem_transpose)
    _timeit("stem_transpose", stem_transpose, video)
    _timeit("stem_rows", stem_rows, video, ref=ref)

    conv1 = nn.Conv(768, (p, p), strides=(p, p), padding="VALID",
                    use_bias=False, dtype=jnp.bfloat16,
                    param_dtype=jnp.float32)
    frames = video.reshape(BATCH * 16, 224, 224, 3)
    cv = conv1.init(rng, frames)
    _timeit("tower_conv1_dense",
            lambda x: conv1.apply(cv, x.astype(jnp.bfloat16)), frames)
    _timeit("tower_conv1_sparse",
            lambda x: conv1.apply(cv, x.astype(jnp.bfloat16)), frames[::2])


# -------------------------------------------------------------- conv33 ----

def cmd_conv33(_names):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import flax.linen as nn

    rng = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(rng, (BATCH, 16, 14, 14, 96), dt)
    C = 96
    kern = jax.random.normal(rng, (1, 3, 3, C, C), jnp.bfloat16) * 0.05
    bias = jnp.zeros((C,), jnp.float32)

    conv = nn.Conv(C, (1, 3, 3), padding=((0, 0), (1, 1), (1, 1)),
                   dtype=dt, param_dtype=jnp.float32)
    cv = {"params": {"kernel": kern.astype(jnp.float32), "bias": bias}}

    def conv_fn(x):
        return conv.apply(cv, x)

    w_cat = kern.reshape(9, C, C).transpose(1, 0, 2).reshape(C, 9 * C)

    def mm_fn(x):
        b, t, h, w_, c = x.shape
        y = x @ w_cat.astype(x.dtype)
        yp = jnp.pad(y, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        out = None
        i = 0
        for dy in range(3):
            for dx in range(3):
                sl = yp[:, :, dy:dy + h, dx:dx + w_, i * C:(i + 1) * C]
                out = sl if out is None else out + sl
                i += 1
        return out + bias.astype(x.dtype)

    a = np.asarray(jax.device_get(jax.jit(conv_fn)(x)), np.float32)
    b = np.asarray(jax.device_get(jax.jit(mm_fn)(x)), np.float32)
    print(json.dumps({"check": "max_abs_diff",
                      "v": float(np.max(np.abs(a - b)))}), flush=True)

    for name, f in (("conv33_fwd_bwd", conv_fn), ("mm33_fwd_bwd", mm_fn)):
        gfn = jax.grad(lambda xx: jnp.sum(f(xx).astype(jnp.float32)))

        @jax.jit
        def reps(x, gfn=gfn):
            def body(i, acc):
                return acc * 0.0 + _tree_sum(
                    gfn(x + (acc * 0).astype(x.dtype)))
            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

        _time_reps(name, reps, x, outer=3)


# ---------------------------------------------------------------- int8 ----

def cmd_int8(_names):
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    M = 12608  # 64 frame-rows x 197 tokens
    shapes = [(M, 768, 2304), (M, 768, 768), (M, 768, 3072), (M, 3072, 768)]
    for (m, k, n) in shapes:
        xb = jax.random.normal(rng, (m, k), jnp.bfloat16)
        wb = jax.random.normal(rng, (k, n), jnp.bfloat16)
        xi = (jax.random.normal(rng, (m, k)) * 10).astype(jnp.int8)
        wi = (jax.random.normal(rng, (k, n)) * 10).astype(jnp.int8)
        _time_reps(f"bf16_{m}x{k}x{n}",
                   _make_reps(lambda x, w=wb: x @ w, xb), xb)

        def int8_mm(x, w=wi):
            return jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        _time_reps(f"int8_{m}x{k}x{n}", _make_reps(int8_mm, xi), xi)


# ---------------------------------------------------------------- dist ----

def cmd_dist(names):
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from dist_tpu.models.dist.dist_net import (
        AdaPooling, DiSTConfig, DiSTNetwork, IntegrationNetwork,
        Integration2Temporal, Temporal2Integration, TemporalNet,
        TemporalPatchStem)

    cfg = DiSTConfig(selected_layers=tuple(range(12)), num_frames=16, alpha=2)
    dt = jnp.bfloat16
    B, T, L, DM = BATCH, 16, 197, 768
    bt = B * (T // cfg.alpha)
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (B, T, 224, 224, 3), jnp.float32)
    taps = jax.random.normal(rng, (12, bt, L, DM), dt)
    x_temporal = jax.random.normal(rng, (B, T, 14, 14, cfg.temporal_dim), dt)
    mid = jax.random.normal(rng, (bt, L, cfg.integration_dim), dt)

    def bench(name, module, args):
        try:
            variables = module.init(rng, *args)

            @jax.jit
            def reps(v, args):
                def body(i, carry):
                    eps = carry.astype(args[0].dtype) * 1e-12
                    out = module.apply(v, args[0] + eps, *args[1:])
                    return jnp.mean(out[0] if isinstance(out, tuple) else out,
                                    dtype=jnp.float32)
                return jax.lax.fori_loop(0, REPS, body,
                                         jnp.zeros((), jnp.float32))

            _time_reps(name, reps, variables, args)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)

    want = set(names) or {"dist_full", "dist_full_fused", "stem",
                          "temporal_net", "integration",
                          "input_linear", "t2i", "i2t", "adapool"}
    if "dist_full" in want:
        bench("dist_full", DiSTNetwork(cfg=cfg, d_model=DM, output_dim=512,
                                       dtype=dt), (video, taps))
    if "dist_full_fused" in want:
        bench("dist_full_fused",
              DiSTNetwork(cfg=cfg, d_model=DM, output_dim=512, dtype=dt,
                          fused_temporal=True), (video, taps))
    if "stem" in want:
        bench("stem", TemporalPatchStem(channels=cfg.temporal_dim,
                                        t_patch=cfg.t_patch_size, s_patch=16,
                                        dtype=dt), (video,))
    if "temporal_net" in want:
        bench("temporal_net", TemporalNet(cfg, dt), (x_temporal,))
    if "integration" in want:
        bench("integration", IntegrationNetwork(cfg, dt), (mid,))
    if "input_linear" in want:
        bench("input_linear", nn.Dense(cfg.integration_dim, dtype=dt,
                                       param_dtype=jnp.float32), (taps[0],))
    if "t2i" in want:
        bench("t2i", Temporal2Integration(cfg, dt), (x_temporal,))
    if "i2t" in want:
        bench("i2t", Integration2Temporal(cfg, dt), (mid,))
    if "adapool" in want:
        top_cls = jax.random.normal(rng, (B, 1, cfg.integration_dim), dt)
        sp_cls = jax.random.normal(rng, (bt, 1, cfg.integration_dim), dt)
        bench("adapool", AdaPooling(cfg, dt), (mid, top_cls, sp_cls))


# ----------------------------------------------------------------- bwd ----

def cmd_bwd(names):
    import jax
    import jax.numpy as jnp

    from dist_tpu.models.dist.dist_net import (
        DiSTConfig, DiSTNetwork, TemporalPatchStem)

    cfg = DiSTConfig(selected_layers=tuple(range(12)), num_frames=16, alpha=2)
    dt = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    video = jax.random.normal(rng, (BATCH, 16, 224, 224, 3), jnp.float32)
    taps = jax.random.normal(rng, (12, BATCH * 8, 197, 768), dt)

    # NOTE: DiSTNetwork clamps unroll to rolled (1) or full — partial
    # unroll measured strictly worse (42 ms at a hand-patched unroll=4 vs
    # 26.2 rolled / 15.9 full at B/16 batch-8) and is not constructible
    variants = [("dist_fwd_bwd_rolled", {"unroll": 1}),
                ("dist_fwd_bwd_remat_rolled", {"remat": True, "unroll": 1}),
                ("dist_fwd_bwd_unrolled", {}),  # default: full unroll
                ("dist_fwd_bwd_remat_unrolled", {"remat": True}),
                # fused VMEM-resident TemporalNet Pallas kernel, fwd+bwd
                # (TPU.FUSED_TEMPORAL_NET; ops/temporal_net.py)
                ("dist_fwd_bwd_unrolled_fused", {"fused_temporal": True}),
                ("dist_fwd_bwd_remat_fused", {"remat": True,
                                              "fused_temporal": True})]
    want = set(names)
    dvars = None
    for name, kw in variants:
        if want and name not in want:
            continue
        dist = DiSTNetwork(cfg=cfg, d_model=768, output_dim=512, dtype=dt,
                           **kw)
        if dvars is None:
            dvars = dist.init(rng, video, taps)
        gfn = jax.grad(lambda v, vid, tp, dist=dist: jnp.sum(
            dist.apply(v, vid, tp).astype(jnp.float32)))

        @jax.jit
        def dist_bwd_reps(v, vid, tp, gfn=gfn):
            def body(i, acc):
                return acc * 0.0 + _tree_sum(
                    gfn(v, vid + (acc * 0).astype(vid.dtype), tp))
            return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

        _time_reps(name, dist_bwd_reps, dvars, video, taps, outer=3)

    # numerical parity of the fused-TemporalNet ladder against the unfused
    # one on THIS backend (same params; Mosaic lowering, not interpret).
    # Two extra full-ladder compiles — skipped when a name filter is given
    # (opt back in with the name `parity`)
    if not want or "parity" in want:
        try:
            if dvars is None:
                dvars = DiSTNetwork(cfg=cfg, d_model=768, output_dim=512,
                                    dtype=dt).init(rng, video, taps)
            base = DiSTNetwork(cfg=cfg, d_model=768, output_dim=512, dtype=dt)
            fused = DiSTNetwork(cfg=cfg, d_model=768, output_dim=512,
                                dtype=dt, fused_temporal=True)
            # pass the big arrays as ARGS — closed-over they become HLO
            # constants and the remote compile rejects the payload (HTTP 413)
            o1 = jax.jit(base.apply)(dvars, video, taps)
            o2 = jax.jit(fused.apply)(dvars, video, taps)
            import numpy as np
            diff = float(np.max(np.abs(np.asarray(o1, np.float32)
                                       - np.asarray(o2, np.float32))))
            scale = float(np.max(np.abs(np.asarray(o1, np.float32))))
            print(json.dumps({"variant": "fused_vs_unfused_parity",
                              "max_abs_diff": diff, "out_max": scale}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"variant": "fused_vs_unfused_parity",
                              "error": repr(e)[-300:]}), flush=True)

    if not want or "stem_fwd_bwd" in want:
        stem = TemporalPatchStem(channels=96, t_patch=5, s_patch=16, dtype=dt)
        svars = stem.init(rng, video)
        sgfn = jax.grad(lambda v, vid: jnp.sum(
            stem.apply(v, vid).astype(jnp.float32)))

        @jax.jit
        def stem_bwd_reps(v, vid):
            def body(i, acc):
                return acc * 0.0 + _tree_sum(
                    sgfn(v, vid + (acc * 0).astype(vid.dtype)))
            return jax.lax.fori_loop(0, REPS, body,
                                     jnp.zeros((), jnp.float32))

        _time_reps("stem_fwd_bwd", stem_bwd_reps, svars, video, outer=3)


def cmd_bwd_parts(names):
    """Per-module fwd+bwd decomposition of the DiST ladder at B/16 batch-8
    geometry — the data that says whether any single ladder module is off
    its floor (bandwidth-bound elementwise tail vs small-matmul latency).
    Reported `ms` is one fwd+bwd of ONE layer's module; the ladder runs 12."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn

    from dist_tpu.models.dist.dist_net import (
        AdaPooling, DiSTConfig, IntegrationNetwork, Integration2Temporal,
        Temporal2Integration, TemporalNet, TemporalPatchStem)

    cfg = DiSTConfig(selected_layers=tuple(range(12)), num_frames=16, alpha=2)
    dt = jnp.bfloat16
    B, T, L, DM = BATCH, 16, 197, 768
    bt = B * (T // cfg.alpha)
    rng = jax.random.PRNGKey(0)
    x_temporal = jax.random.normal(rng, (B, T, 14, 14, cfg.temporal_dim), dt)
    mid = jax.random.normal(rng, (bt, L, cfg.integration_dim), dt)
    tap = jax.random.normal(rng, (bt, L, DM), dt)
    video = jax.random.normal(rng, (B, T, 224, 224, 3), jnp.float32)

    def bench_bwd(name, module, *args):
        try:
            variables = module.init(rng, *args)
            gfn = jax.grad(lambda v, *a: jnp.sum(jax.tree_util.tree_reduce(
                lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)),
                module.apply(v, *a), 0.0)))

            @jax.jit
            def reps(v, *a):
                def body(i, acc):
                    perturbed = (a[0] + (acc * 0).astype(a[0].dtype),) + a[1:]
                    return acc * 0.0 + _tree_sum(gfn(v, *perturbed))
                return jax.lax.fori_loop(0, REPS, body,
                                         jnp.zeros((), jnp.float32))

            _time_reps(name, reps, variables, *args, outer=3)
        except Exception as e:
            print(json.dumps({"variant": name, "error": repr(e)[-300:]}),
                  flush=True)

    want = set(names) or {"temporal_net", "integration", "input_linear",
                          "t2i", "i2t", "adapool", "stem"}
    if "temporal_net" in want:
        bench_bwd("temporal_net_fwd_bwd", TemporalNet(cfg, dt), x_temporal)
    if "integration" in want:
        bench_bwd("integration_fwd_bwd", IntegrationNetwork(cfg, dt), mid)
    if "input_linear" in want:
        bench_bwd("input_linear_fwd_bwd",
                  nn.Dense(cfg.integration_dim, dtype=dt,
                           param_dtype=jnp.float32), tap)
    if "t2i" in want:
        bench_bwd("t2i_fwd_bwd", Temporal2Integration(cfg, dt), x_temporal)
    if "i2t" in want:
        bench_bwd("i2t_fwd_bwd", Integration2Temporal(cfg, dt), mid)
    if "adapool" in want:
        top_cls = jax.random.normal(rng, (B, 1, cfg.integration_dim), dt)
        sp_cls = jax.random.normal(rng, (bt, 1, cfg.integration_dim), dt)
        bench_bwd("adapool_fwd_bwd", AdaPooling(cfg, dt), mid, top_cls, sp_cls)
    if "stem" in want:
        bench_bwd("stem_fwd_bwd", TemporalPatchStem(
            channels=cfg.temporal_dim, t_patch=cfg.t_patch_size, s_patch=16,
            dtype=dt), video)


# --------------------------------------------------------------- train ----

def cmd_train(_names):
    import jax
    import jax.numpy as jnp

    from dist_tpu.config import load_config
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.losses import calculate_loss
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.tasks.state import (
        _prep_video, create_train_state, make_train_step)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, CFG),
        opts=["TRAIN.BATCH_SIZE", str(BATCH)] + OPTS, make_output_dir=False)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    frames = int(cfg.DATA.NUM_INPUT_FRAMES)
    crop = int(cfg.DATA.TRAIN_CROP_SIZE or 224)
    video = jax.random.randint(rng, (BATCH, frames, crop, crop, 3), 0, 255,
                               jnp.int32).astype(jnp.uint8)
    variables = model.init(rng, {"video": video.astype(jnp.float32)})
    n_cls_cfg = cfg.VIDEO.HEAD.NUM_CLASSES
    n_cls = (int(n_cls_cfg[0]) if isinstance(n_cls_cfg, (list, tuple))
             else int(n_cls_cfg))
    from dist_tpu.models.clip.model import ARCHITECTURES
    arch = ARCHITECTURES.get(cfg.VIDEO.BACKBONE.META_ARCH_NAME)
    tf = jax.random.normal(rng, (n_cls, arch.embed_dim if arch else 512),
                           jnp.float32)
    tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch=100)
    state = create_train_state(variables, tx)
    labels = jnp.zeros((BATCH,), jnp.int32)
    batch = {"video": video, "labels": labels, "text_features": tf}
    if isinstance(n_cls_cfg, (list, tuple)):
        batch["label_verb"] = labels
        batch["label_noun"] = labels
    step_fn = make_train_step(model, cfg, tx, lr_fn)

    @jax.jit
    def full_reps(state):
        def body(i, st):
            st2, _ = step_fn(st, batch, jax.random.PRNGKey(0))
            return st2
        final = jax.lax.fori_loop(0, REPS, body, state)
        return _tree_sum(final.variables) + final.step

    _time_reps("train_step_full", full_reps, state, outer=3)

    sup = ({"verb_class": labels, "noun_class": labels}
           if isinstance(n_cls_cfg, (list, tuple)) else labels)

    def loss_fn(variables, v):
        preds, logits = model.apply(
            variables, {"video": _prep_video(cfg, v), "text_features": tf},
            train=True, rngs={"dropout": jax.random.PRNGKey(0)})
        loss, _ = calculate_loss(cfg, preds, logits, {"supervised": sup})
        return loss

    @jax.jit
    def fwd_reps(variables):
        def body(i, acc):
            l = loss_fn(variables, video + (acc * 0).astype(video.dtype))
            return acc + l
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    _time_reps("loss_fwd_only", fwd_reps, variables, outer=3)

    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def bwd_reps(variables):
        def body(i, acc):
            g = grad_fn(variables, video + (acc * 0).astype(video.dtype))
            return acc + _tree_sum(g)
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.float32))

    _time_reps("loss_fwd_bwd", bwd_reps, variables, outer=3)

    @jax.jit
    def opt_reps(state):
        import optax
        g = jax.tree_util.tree_map(jnp.zeros_like, state.variables)

        def body(i, st):
            updates, opt_state = tx.update(g, st.opt_state, st.variables)
            variables = optax.apply_updates(st.variables, updates)
            return st.replace(variables=variables, opt_state=opt_state,
                              step=st.step + 1)
        final = jax.lax.fori_loop(0, REPS, body, state)
        return _tree_sum(final.variables) + final.step

    _time_reps("optimizer_only", opt_reps, state, outer=3)


COMMANDS = {"attn": cmd_attn, "stem": cmd_stem, "conv33": cmd_conv33,
            "int8": cmd_int8, "dist": cmd_dist, "bwd": cmd_bwd,
            "bwd_parts": cmd_bwd_parts, "train": cmd_train}


def main():
    if len(sys.argv) < 2 or sys.argv[1] not in COMMANDS:
        print(__doc__)
        sys.exit(2)
    _enable_cache()
    COMMANDS[sys.argv[1]](sys.argv[2:])


if __name__ == "__main__":
    main()
