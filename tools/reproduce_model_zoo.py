#!/usr/bin/env python3
"""One-command Model-Zoo acceptance harness.

Runs the reference's published eval protocol (multi-view score-sum
ensemble; reference runs/test.py:181-322, view policy runs/run.py:49-62)
for each Model-Zoo config and asserts acc@1 within ``--tolerance`` (default
0.3, the BASELINE.md acceptance bar) of the published number
(reference README.md:35-47).

Usage (real weights + data):

    PYTHONPATH=. python tools/reproduce_model_zoo.py \
        --ckpt-dir /weights \
        --ssv2-root /data/ssv2/videos --ssv2-anno /data/ssv2/annos \
        --k400-root /data/k400 --k400-anno /data/k400/annos \
        [--configs ssv2/vit-b16-8+16f ...] [--tolerance 0.3]

Checkpoints are looked up in --ckpt-dir by config stem
(``<stem>.pyth``/``.pt``/an Orbax dir named ``<stem>``), or given
explicitly with repeated ``--ckpt <stem>=<path>``. Released ``.pyth``
checkpoints (incl. the old ``ladder_net.*`` naming) convert on the fly.

``--dry-run`` exercises the full harness on synthetic data + random
weights (no assertion on accuracy) — the mode CI runs so the day real
weights are available, acceptance is this one command.

``--strict`` is the opposite stance: ACCEPTANCE means real weights and
real data, so it refuses ``--dry-run``, pre-flights every selected zoo
row for its dataset root/anno dir and checkpoint, and exits 2 listing
everything missing BEFORE evaluating anything. Until a strict run
passes, the Model-Zoo accuracy claim is unproven — a green ``--dry-run``
only proves the harness, never the numbers (the summary line says so).

Emits one JSON line per model and a final summary; exit code 1 if any
model misses tolerance.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (config path, dataset family, published acc@1, acc@5) — BASELINE.md /
# reference README.md:35-47
ZOO = [
    ("configs/projects/dist/ssv2/vit-b16-8+16f.yaml", "ssv2", 68.7, 91.1),
    ("configs/projects/dist/ssv2/vit-b16-16+32f.yaml", "ssv2", 70.2, 92.0),
    ("configs/projects/dist/ssv2/vit-b16-32+64f.yaml", "ssv2", 70.9, 92.1),
    ("configs/projects/dist/ssv2/vit-l14-32+64f.yaml", "ssv2", 73.1, 93.2),
    ("configs/projects/dist/k400/vit-b16-8+16f.yaml", "k400", 83.6, 96.3),
    ("configs/projects/dist/k400/vit-b16-16+32f.yaml", "k400", 84.4, 96.7),
    ("configs/projects/dist/k400/vit-b16-32+64f.yaml", "k400", 85.0, 97.0),
    ("configs/projects/dist/k400/vit-l14-32+64f.yaml", "k400", 88.0, 97.9),
]


def _stem(config_path):
    ds = os.path.basename(os.path.dirname(config_path))
    return f"{ds}_{os.path.splitext(os.path.basename(config_path))[0]}"


def _find_ckpt(args, config_path):
    stem = _stem(config_path)
    if stem in args.ckpt_map:
        return args.ckpt_map[stem]
    if args.ckpt_dir:
        for suffix in (".pyth", ".pt", ".pth", ""):
            p = os.path.join(args.ckpt_dir, stem + suffix)
            if os.path.exists(p):
                return p
    return None


def _apply_view_policy(cfg):
    """The automatic multi-view policy (runs/run.py::_prepare_data;
    reference runs/run.py:49-62)."""
    ds = str(cfg.TEST.DATASET)
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 10
    cfg.TEST.NUM_SPATIAL_CROPS = 3 if ("kinetics" in ds or "epickitchen" in ds) else 1
    if "ssv2" in ds:
        cfg.TEST.NUM_ENSEMBLE_VIEWS = 3
        cfg.TEST.NUM_SPATIAL_CROPS = 1
    if cfg.TEST.OVERRIDE_MULTI_SCALE_TEST.ENABLE:
        cfg.TEST.NUM_ENSEMBLE_VIEWS = (
            cfg.TEST.OVERRIDE_MULTI_SCALE_TEST.NUM_ENSEMBLE_VIEWS)
        cfg.TEST.NUM_SPATIAL_CROPS = (
            cfg.TEST.OVERRIDE_MULTI_SCALE_TEST.NUM_SPATIAL_CROPS)


def _preflight_strict(args, rows):
    """Every selected row must have real data + a real checkpoint on disk.
    Returns the list of human-readable gaps (empty = ready to accept)."""
    missing = []
    for config_path, family, _, _ in rows:
        root = getattr(args, f"{family}_root")
        anno = getattr(args, f"{family}_anno")
        if not root:
            missing.append(f"{config_path}: --{family}-root not given")
        elif not os.path.isdir(root):
            missing.append(f"{config_path}: --{family}-root {root} does not exist")
        if not anno:
            missing.append(f"{config_path}: --{family}-anno not given")
        elif not os.path.isdir(anno):
            missing.append(f"{config_path}: --{family}-anno {anno} does not exist")
        ckpt = _find_ckpt(args, config_path)
        if not ckpt:
            missing.append(
                f"{config_path}: no checkpoint named {_stem(config_path)}"
                f"[.pyth/.pt/.pth] or an Orbax dir named {_stem(config_path)}"
                " under --ckpt-dir, and no --ckpt override")
        elif not os.path.exists(ckpt):
            missing.append(f"{config_path}: checkpoint {ckpt} does not exist")
    return missing


def run_one(args, config_path, family, acc1, acc5):
    from dist_tpu.config import load_config
    from dist_tpu.tasks.test import test

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    opts = ["TRAIN.ENABLE", "false", "TEST.ENABLE", "true",
            "LOG_MODEL_INFO", "false", "LOG_CONFIG_INFO", "false",
            "OUTPUT_DIR", os.path.join(args.output_dir, _stem(config_path))]
    if args.dry_run:
        opts += ["DATA.SYNTHETIC", "true", "TEST.NUM_SAMPLES_LIMIT",
                 str(args.dry_run_samples), "DATA_LOADER.NUM_WORKERS", "0",
                 "TEST.BATCH_SIZE", "1"]
    else:
        root = getattr(args, f"{family}_root")
        anno = getattr(args, f"{family}_anno")
        assert root and anno, (
            f"--{family}-root/--{family}-anno required for {config_path}")
        opts += ["DATA.DATA_ROOT_DIR", root, "DATA.ANNO_DIR", anno]
        ckpt = _find_ckpt(args, config_path)
        assert ckpt, (f"no checkpoint for {_stem(config_path)}: pass "
                      f"--ckpt {_stem(config_path)}=<path> or put it in "
                      "--ckpt-dir")
        opts += ["TEST.CHECKPOINT_FILE_PATH", ckpt]
    opts += args.opts

    cfg = load_config(os.path.join(repo, config_path), opts=opts)
    _apply_view_policy(cfg)
    if args.dry_run:
        # keep dry-run shapes tiny; the policy's view count still applies
        cfg.TEST.NUM_ENSEMBLE_VIEWS = min(cfg.TEST.NUM_ENSEMBLE_VIEWS, 2)
        cfg.TEST.NUM_SPATIAL_CROPS = 1

    results = test(cfg)
    got1 = float(results["top1_acc"])
    got5 = float(results.get("top5_acc", float("nan")))
    ok = args.dry_run or abs(got1 - acc1) <= args.tolerance
    print(json.dumps({
        "config": config_path,
        "views": f"{cfg.TEST.NUM_ENSEMBLE_VIEWS}x{cfg.TEST.NUM_SPATIAL_CROPS}",
        "top1_acc": round(got1, 2), "top5_acc": round(got5, 2),
        "expected_top1": acc1, "expected_top5": acc5,
        "delta_top1": round(got1 - acc1, 2),
        "pass": bool(ok), "dry_run": bool(args.dry_run),
    }), flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", default=None)
    ap.add_argument("--ckpt", action="append", default=[],
                    help="<config-stem>=<path>, e.g. "
                         "ssv2_vit-b16-8+16f=/w/dist_b16_ssv2.pyth")
    ap.add_argument("--ssv2-root", default=None)
    ap.add_argument("--ssv2-anno", default=None)
    ap.add_argument("--k400-root", default=None)
    ap.add_argument("--k400-anno", default=None)
    ap.add_argument("--configs", nargs="*", default=None,
                    help="substring filters, e.g. ssv2/vit-b16-8+16f")
    ap.add_argument("--tolerance", type=float, default=0.3)
    ap.add_argument("--output-dir", default="output/model_zoo_repro")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthetic data + random weights; checks the "
                         "harness end to end, skips the accuracy assert")
    ap.add_argument("--strict", action="store_true",
                    help="acceptance mode: refuse --dry-run and exit 2 "
                         "listing every missing dataset/checkpoint before "
                         "evaluating — a strict pass is the only run that "
                         "proves the Model-Zoo numbers")
    ap.add_argument("--dry-run-samples", type=int, default=4)
    ap.add_argument("--opts", nargs=argparse.REMAINDER, default=[],
                    help="trailing dotted-key overrides applied to every "
                         "config (e.g. --opts DATA.TEST_CROP_SIZE 96)")
    args = ap.parse_args()
    args.ckpt_map = dict(kv.split("=", 1) for kv in args.ckpt)

    from dist_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()

    rows = [r for r in ZOO
            if not args.configs or any(f in r[0] for f in args.configs)]
    assert rows, f"no zoo entry matches {args.configs}"
    if args.strict:
        if args.dry_run:
            print(json.dumps({"summary": "model_zoo_repro", "error":
                              "--strict forbids --dry-run: a dry run proves "
                              "the harness, not the numbers"}), flush=True)
            sys.exit(2)
        missing = _preflight_strict(args, rows)
        if missing:
            for m in missing:
                print(json.dumps({"missing": m}), flush=True)
            print(json.dumps({"summary": "model_zoo_repro", "strict": True,
                              "models": len(rows), "missing": len(missing),
                              "error": "acceptance inputs absent — the "
                                       "Model-Zoo numbers remain UNPROVEN"}),
                  flush=True)
            sys.exit(2)
    failures = 0
    for row in rows:
        if not run_one(args, *row):
            failures += 1
    print(json.dumps({"summary": "model_zoo_repro", "models": len(rows),
                      "failures": failures, "tolerance": args.tolerance,
                      "proof": not args.dry_run}), flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
