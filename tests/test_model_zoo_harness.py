"""Model-Zoo acceptance harness (tools/reproduce_model_zoo.py) dry run.

The harness runs the reference's published eval protocol per zoo config and
asserts acc@1 vs the Model-Zoo table (reference README.md:35-47;
runs/test.py:181-322). CI can't hold real weights/data, so the contract is:
``--dry-run`` must exercise the FULL plumbing (config load, view policy,
test loop, meter, JSON report, exit code) on synthetic data + random
weights — then the day real weights exist, acceptance is the same command
without ``--dry-run``.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# shrink the real zoo config to the CPU-runnable ViT-Test scale; the
# harness plumbing under test (view policy, meters, reporting) is unchanged
TINY_OPTS = [
    "VIDEO.BACKBONE.META_ARCH_NAME", "ViT-Test",
    "VIDEO.BACKBONE.PRETRAIN_WEIGHT_PATH", "",
    "VIDEO.BACKBONE.LOCAL_PRETRAIN_WEIGHT_PATH", "",
    "VIDEO.BACKBONE.DIST.SELECTED_LAYERS", "[0,1]",
    "VIDEO.BACKBONE.DIST.INTEGRATION_DIM", "64",
    "VIDEO.BACKBONE.DIST.TEMPORAL_DIM", "32",
    "VIDEO.HEAD.NUM_CLASSES", "12",
    "DATA.NUM_INPUT_FRAMES", "4",
    "DATA.TRAIN_CROP_SIZE", "64", "DATA.TEST_SCALE", "64",
    "DATA.TEST_CROP_SIZE", "64",
]


@pytest.mark.slow
def test_dry_run_reports_and_exits_zero(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/reproduce_model_zoo.py"),
         "--dry-run", "--dry-run-samples", "2",
         "--configs", "ssv2/vit-b16-8+16f",
         "--output-dir", str(tmp_path),
         "--opts"] + TINY_OPTS,
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()
             if ln.startswith("{")]
    rows = [l for l in lines if "config" in l]
    summary = [l for l in lines if l.get("summary") == "model_zoo_repro"]
    assert len(rows) == 1 and rows[0]["dry_run"] and rows[0]["pass"]
    # SSV2 view policy applied (3x1, capped to 2 views in dry-run)
    assert rows[0]["views"] == "2x1", rows[0]
    assert rows[0]["expected_top1"] == 68.7
    assert summary and summary[0]["failures"] == 0


def _run_harness(tmp_path, *argv):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/reproduce_model_zoo.py"),
         "--output-dir", str(tmp_path)] + list(argv),
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO)


def test_strict_fails_loudly_when_inputs_absent(tmp_path):
    """--strict is the acceptance stance: with no weights/data it must exit
    2 listing every gap BEFORE evaluating, so the unproven-accuracy status
    stays visible instead of silently green."""
    proc = _run_harness(tmp_path, "--strict", "--configs", "ssv2")
    assert proc.returncode == 2, proc.stdout + proc.stderr
    lines = [json.loads(ln) for ln in proc.stdout.splitlines()
             if ln.startswith("{")]
    missing = [l["missing"] for l in lines
               if "missing" in l and "summary" not in l]
    summary = [l for l in lines if l.get("summary") == "model_zoo_repro"]
    # 4 ssv2 rows x (root + anno + ckpt) all absent
    assert len(missing) == 12, missing
    assert any("ssv2_vit-l14-32+64f" in m for m in missing)
    assert summary and "UNPROVEN" in summary[0]["error"]
    # nothing was evaluated
    assert not any("config" in l for l in lines)


def test_strict_refuses_dry_run(tmp_path):
    proc = _run_harness(tmp_path, "--strict", "--dry-run", "--configs", "ssv2")
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert "proves the harness" in proc.stdout


def test_zoo_table_matches_baseline():
    """The hardcoded zoo rows stay in sync with BASELINE.md's table."""
    sys.path.insert(0, REPO)
    from tools.reproduce_model_zoo import ZOO

    with open(os.path.join(REPO, "BASELINE.md")) as f:
        baseline = f.read()
    for config_path, _, acc1, acc5 in ZOO:
        assert os.path.exists(os.path.join(REPO, config_path)), config_path
        assert str(acc1) in baseline, (config_path, acc1)
