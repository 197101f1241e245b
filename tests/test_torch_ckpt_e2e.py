"""Released-PyTorch-checkpoint path E2E: a torch ``.pyth`` (with the old
ladder_net naming) loads through TEST.CHECKPOINT_FILE_PATH and drives the
multi-view test task."""

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
