"""Released-PyTorch-checkpoint path E2E: a torch ``.pyth`` (with the old
ladder_net naming) loads through TEST.CHECKPOINT_FILE_PATH and drives the
multi-view test task."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import os

import numpy as np
import pytest
import torch

from dist_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml")


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    import sys
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from synth_ckpt import add_dist_state_dict, make_clip_state_dict
    from dist_tpu.models.dist.dist_net import DiSTConfig

    cfg = load_config(CFG, make_output_dir=False)
    rng = np.random.default_rng(7)
    # dims must match the ViT-Test architecture the tiny config selects
    sd = make_clip_state_dict(
        rng, embed_dim=32, image_resolution=64, vision_layers=2,
        vision_width=64, vision_patch_size=16, context_length=77,
        vocab_size=49408, transformer_width=64, transformer_layers=2)
    add_dist_state_dict(sd, rng, DiSTConfig.from_cfg(cfg), d_model=64)
    # old released naming
    renamed = {
        (k.replace("dist_net.", "ladder_net.")
         if k.startswith("dist_net.") else k): torch.from_numpy(np.asarray(v))
        for k, v in sd.items()
    }
    path = str(tmp_path_factory.mktemp("ck") / "released.pyth")
    torch.save({"model_state": renamed, "epoch": 30}, path)
    return path


def test_torch_checkpoint_drives_test_task(torch_ckpt, tmp_path_factory):
    from dist_tpu.tasks.test import test as test_task

    out = str(tmp_path_factory.mktemp("out"))
    cfg = load_config(CFG, opts=["OUTPUT_DIR", out,
                                 "TEST.CHECKPOINT_FILE_PATH", torch_ckpt,
                                 "TEST.NUM_ENSEMBLE_VIEWS", "2"])
    stats = test_task(cfg)
    assert "top1_acc" in stats
    # determinism with the converted weights
    stats2 = test_task(cfg)
    assert stats == stats2


def _module_from_state_dict(sd, dtype):
    """Build a scriptable torch module whose state_dict reproduces ``sd``
    (stands in for the released TorchScript CLIP archives, which store
    fp16 weights; models/base/clip.py:540-561)."""
    import torch

    class Leafless(torch.nn.Module):
        def forward(self):  # pragma: no cover - jit requires a forward
            return torch.zeros(1)

    root = Leafless()
    for k, v in sd.items():
        parts = k.split(".")
        m = root
        for p in parts[:-1]:
            if not hasattr(m, p):
                m.add_module(p, Leafless())
            m = getattr(m, p)
        t = torch.from_numpy(np.asarray(v)).to(dtype)
        m.register_parameter(parts[-1], torch.nn.Parameter(t, requires_grad=False))
    return root


def test_fp16_jit_archive_matches_fp32_pickle(torch_ckpt, tmp_path_factory):
    """Released checkpoints are fp16 TorchScript archives; loading one must
    produce (near-)identical predictions to the fp32 pickle path
    (fp16-storage / fp32-math, reference clip.py:540-561)."""
    import torch
    import jax
    import jax.numpy as jnp
    from dist_tpu.models.base.models import build_model
    from dist_tpu.utils import checkpoint as cu

    out = str(tmp_path_factory.mktemp("out_fp16"))
    cfg = load_config(CFG, opts=["OUTPUT_DIR", out])

    blob = torch.load(torch_ckpt, weights_only=False)
    sd = {k: v.numpy() for k, v in blob["model_state"].items()}

    # fp16 TorchScript archive with the same weights
    scripted = torch.jit.script(_module_from_state_dict(sd, torch.float16))
    jit_path = os.path.join(out, "released_fp16.pt")
    torch.jit.save(scripted, jit_path)

    model = build_model(cfg)
    video = jnp.zeros((1, 4, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"video": video})

    v32 = cu.load_torch_variables(cfg, torch_ckpt, variables)
    v16 = cu.load_torch_variables(cfg, jit_path, variables)

    # all leaves restored as fp32 (fp16 storage never leaks into math)
    for leaf in jax.tree_util.tree_leaves(v16["params"]):
        assert np.asarray(leaf).dtype == np.float32

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (2, 4, 64, 64, 3), jnp.float32)
    tf = jax.random.normal(jax.random.PRNGKey(2), (12, 32), jnp.float32)
    p32, _ = model.apply(v32, {"video": x, "text_features": tf}, train=False)
    p16, _ = model.apply(v16, {"video": x, "text_features": tf}, train=False)
    p32, p16 = np.asarray(p32, np.float32), np.asarray(p16, np.float32)
    # fp16 storage rounding only: outputs agree tightly
    assert np.max(np.abs(p32 - p16)) < 5e-2
    assert np.corrcoef(p32.ravel(), p16.ravel())[0, 1] > 0.999


def test_convert_checkpoint_cli_roundtrip(torch_ckpt, tmp_path):
    """tools/convert_checkpoint.py CLI: torch .pyth -> persistent Orbax dir
    that load_test_checkpoint restores (the process_dist_cpkt.py
    replacement as a user-facing artifact converter)."""
    import subprocess
    import sys as _sys

    src = torch_ckpt
    dst = str(tmp_path / "converted")
    r = subprocess.run(
        [_sys.executable, os.path.join(REPO, "tools/convert_checkpoint.py"),
         "--cfg", CFG, "--src", src, "--dst", dst],
        env=dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu"),
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert os.path.isdir(dst)

    from dist_tpu.config import load_config
    from dist_tpu.models.base.models import build_model
    from dist_tpu.tasks.test import _init_test_state
    from dist_tpu.utils import checkpoint as cu
    import numpy as np

    cfg = load_config(CFG, make_output_dir=False,
                      opts=["TEST.CHECKPOINT_FILE_PATH", dst])
    model = build_model(cfg)
    state = _init_test_state(cfg, model, {"video": np.zeros(
        (1, 4, 64, 64, 3), np.float32)})
    before = np.asarray(state.variables["params"]["visual"]["proj"])
    state = cu.load_test_checkpoint(cfg, state)
    after = np.asarray(state.variables["params"]["visual"]["proj"])
    # the restored projection comes from the synth checkpoint, not the init
    assert after.shape == before.shape and not np.allclose(before, after)
