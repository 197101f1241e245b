"""Chained SSL workflow e2e: HiCo pretrain -> orbax checkpoint -> supervised
fine-tune consuming it through ``TRAIN.FINE_TUNE`` +
``TRAIN.CHECKPOINT_FILE_PATH`` (reference utils/checkpoint.py:532-577) —
the reference's flagship SSL recipe (pre-train configs/projects/hico/pt-k400,
fine-tune ft-ucf101), on the shipped config pair at doll-house scale.

Asserts the load semantics the reference fine-tune entry guarantees:
the backbone tree comes from the checkpoint, the contrastive head is
POPPED so the classifier keeps its fresh init, the epoch counter resets
to 0, and the optimizer starts fresh — then the supervised train task
actually runs from that state.
"""

import pytest

pytestmark = pytest.mark.slow  # two full tiny train runs + S3DG compiles

import os

import numpy as np

import jax

from dist_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = [
    "DATA.SYNTHETIC", "true",
    "DATA.NUM_INPUT_FRAMES", "8",
    "DATA.SAMPLING_RATE", "2",
    "DATA.TRAIN_CROP_SIZE", "64",
    "DATA.TEST_SCALE", "64",
    "DATA.TEST_CROP_SIZE", "64",
    "DATA_LOADER.NUM_WORKERS", "2",
    "TRAIN.BATCH_SIZE", "1",          # x8 virtual devices = global 8
    "TRAIN.NUM_SAMPLES_LIMIT", "8",
    "TRAIN.NUM_FOLDS", "1",
    "TRAIN.CHECKPOINT_PERIOD", "1",
    "TRAIN.AUTO_RESUME", "false",
    "OPTIMIZER.MAX_EPOCH", "1",
    "OPTIMIZER.WARMUP_EPOCHS", "0",
    "BN.SYNC", "false",
    "LOG_PERIOD", "1",
]


@pytest.fixture(scope="module")
def pretrain_run(tmp_path_factory):
    """Run the shipped HiCo pretrain config (tiny overrides) through the
    REAL train task; return its output dir, final state, and checkpoint."""
    from dist_tpu.tasks.train import train

    out = str(tmp_path_factory.mktemp("hico_pt"))
    cfg = load_config(
        os.path.join(REPO, "configs/projects/hico/pt-k400/s3dg-hico-l.yaml"),
        opts=TINY + [
            "OUTPUT_DIR", out,
            # 2 clips/video keeps the multi-view batch CPU-sized; the HiCo
            # loss path (TCL + gradual sampling) is unchanged
            "PRETRAIN.NUM_CLIPS_PER_VIDEO", "2",
            "PRETRAIN.CONTRASTIVE.HEAD_MID_DIM", "64",
            "PRETRAIN.CONTRASTIVE.HEAD_OUT_DIM", "32",
        ])
    state = train(cfg)
    ckpt_dir = os.path.join(out, "checkpoints")
    ckpts = sorted(c for c in os.listdir(ckpt_dir)
                   if c.startswith("checkpoint_epoch_")
                   and os.path.isdir(os.path.join(ckpt_dir, c)))
    assert ckpts, os.listdir(ckpt_dir)
    return cfg, state, os.path.join(ckpt_dir, ckpts[-1])


def _ft_cfg(pretrain_ckpt, out):
    return load_config(
        os.path.join(REPO,
                     "configs/projects/hico/ft-ucf101/ft-s3dg-hico-s.yaml"),
        opts=TINY + [
            "OUTPUT_DIR", out,
            "TRAIN.CHECKPOINT_FILE_PATH", pretrain_ckpt,
            "TRAIN.CHECKPOINT_PRE_PROCESS.ENABLE", "true",
            "TRAIN.CHECKPOINT_PRE_PROCESS.POP_HEAD", "true",
            "VIDEO.HEAD.NUM_CLASSES", "12",
            "TEST.ENABLE", "false",
            "TEST.NUM_SAMPLES_LIMIT", "8",
            "TEST.BATCH_SIZE", "1",
        ])


def test_finetune_load_semantics(pretrain_run, tmp_path):
    """The fine-tune entry must: load the backbone from the SSL checkpoint,
    pop the contrastive head (fresh classifier init), reset the epoch, and
    start the optimizer fresh."""
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.tasks.state import create_train_state
    from dist_tpu.utils import checkpoint as cu
    import jax.numpy as jnp

    _, pt_state, ckpt = pretrain_run
    cfg = _ft_cfg(ckpt, str(tmp_path))
    model = build_model(cfg)
    video = jnp.zeros((2, 8, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(3), {"video": video})
    fresh_head = jax.device_get(variables["head"])
    tx, _ = construct_optimizer(cfg, variables, steps_per_epoch=1)
    state = create_train_state(variables, tx)

    state, start_epoch, start_iter = cu.load_train_checkpoint(cfg, state)

    assert (start_epoch, start_iter) == (0, 0)  # epoch resets on fine-tune
    assert int(state.step) == 0                 # optimizer starts fresh

    # backbone == the pretrain run's final params, leaf for leaf
    got = jax.device_get(state.variables["params"])
    want = jax.device_get(pt_state.variables["params"])
    jax.tree_util.tree_map(np.testing.assert_allclose, got, want)

    # contrastive head popped -> classifier head keeps its fresh init
    head = jax.device_get(state.variables["head"])
    jax.tree_util.tree_map(np.testing.assert_array_equal, head, fresh_head)


def test_finetune_task_runs_from_pretrain(pretrain_run, tmp_path):
    """The full supervised train task consumes the SSL checkpoint through
    the config alone (the reference workflow verbatim) and trains."""
    from dist_tpu.tasks.train import train

    _, pt_state, ckpt = pretrain_run
    cfg = _ft_cfg(ckpt, str(tmp_path))
    state = train(cfg)
    assert int(state.step) == 1  # 8 samples / global batch 8, 1 epoch
    # it trained FROM the pretrained backbone: one step of SGD must not
    # leave the params identical to the checkpoint, but the first conv of
    # the stem should still be recognizably the loaded tensor (tiny LR)
    got = jax.tree_util.tree_leaves(jax.device_get(state.variables["params"]))
    want = jax.tree_util.tree_leaves(jax.device_get(pt_state.variables["params"]))
    deltas = [float(np.abs(g - w).max()) for g, w in zip(got, want)
              if g.shape == w.shape]
    assert any(d > 0 for d in deltas)          # moved (it trained)
    assert max(deltas) < 1.0                   # from the ckpt, not reinit
    ckpts = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
    assert any(c.startswith("checkpoint_epoch_") for c in ckpts)
