"""End-to-end smoke: tiny DiST train -> checkpoint -> multi-view test on
synthetic data, on the virtual 8-device CPU mesh (exercises the sharded
train step, mixup, LR schedule, meters, orbax checkpointing, and the
multi-view TestMeter regrouping)."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import os
import shutil

import numpy as np
import pytest

from dist_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml")


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("e2e_out"))
    cfg = load_config(CFG, opts=["OUTPUT_DIR", out])
    return cfg


@pytest.fixture(scope="module")
def trained(tiny_cfg):
    """Run the tiny training ONCE per module; every test needing the
    checkpoint depends on this fixture so any single test is runnable in
    isolation (no inter-test ordering)."""
    from dist_tpu.tasks.train import train

    cfg = tiny_cfg.deep_copy()
    state = train(cfg)
    return state


def test_train_and_eval(tiny_cfg, trained):
    assert int(trained.step) == 2  # 8 samples / batch 4 = 2 steps
    ckpts = os.listdir(os.path.join(tiny_cfg.OUTPUT_DIR, "checkpoints"))
    assert any(c.startswith("checkpoint_epoch_") for c in ckpts)


def test_multiview_test(tiny_cfg, trained):
    from dist_tpu.tasks.test import test as test_task

    cfg = tiny_cfg.deep_copy()
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 3
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    stats = test_task(cfg)
    assert "top1_acc" in stats and "top5_acc" in stats
    assert 0.0 <= float(stats["top1_acc"]) <= 100.0


def test_deterministic_eval(tiny_cfg, trained):
    """Same checkpoint + config -> identical metrics (keyed PRNG, no
    hidden state; SURVEY section 5.2)."""
    from dist_tpu.tasks.test import test as test_task

    cfg = tiny_cfg.deep_copy()
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    s1 = test_task(cfg)
    s2 = test_task(cfg)
    assert s1["top1_acc"] == s2["top1_acc"]
    assert s1["top5_acc"] == s2["top5_acc"]


def test_auto_resume(tiny_cfg, trained):
    """Train 1 epoch -> auto-resume continues at the saved epoch
    (reference load_train_checkpoint, checkpoint.py:532-577)."""
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.tasks.state import create_train_state
    from dist_tpu.utils import checkpoint as cu
    import jax
    import jax.numpy as jnp

    cfg = tiny_cfg.deep_copy()
    cfg.TRAIN.AUTO_RESUME = True
    # the `trained` fixture wrote the epoch-1 checkpoint
    model = build_model(cfg)
    video = jnp.zeros((2, 4, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    tx, _ = construct_optimizer(cfg, variables, steps_per_epoch=2)
    state = create_train_state(variables, tx)
    state, start_epoch, _ = cu.load_train_checkpoint(cfg, state)
    assert start_epoch == 1
    assert int(state.step) == 2  # restored optimizer step count


def test_multiview_padded_batch_matches_divisible(tiny_cfg, trained):
    """24 clips at global batch 8 (divisible) vs global batch 16 (final
    batch padded by cycling indices): identical accuracy proves the meter
    dedups padded duplicate views (round-1 review finding)."""
    from dist_tpu.tasks.test import test as test_task

    cfg = tiny_cfg.deep_copy()
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 3
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.TEST.BATCH_SIZE = 1  # x8 devices -> 24 % 8 == 0
    divisible = test_task(cfg)
    cfg.TEST.BATCH_SIZE = 2  # x8 devices -> 24 % 16 == 8, pads 8 dups
    padded = test_task(cfg)
    assert divisible["top1_acc"] == padded["top1_acc"]
    assert divisible["top5_acc"] == padded["top5_acc"]


def test_checkpoint_resume_stays_on_fold_grid(tmp_path):
    """With NUM_FOLDS > 1 a checkpoint saved after one fold-epoch (covering
    NUM_FOLDS data epochs) must resume at cur_epoch + NUM_FOLDS, not +1 —
    otherwise the loop re-trains covered epochs and runs past MAX_EPOCH
    (reference stores the last covered epoch, runs/train.py:414)."""
    import jax.numpy as jnp
    import numpy as np
    from dist_tpu.config import load_config
    from dist_tpu.tasks.state import TrainState
    from dist_tpu.utils import checkpoint as cu

    cfg = load_config(os.path.join(
        REPO, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=["TRAIN.NUM_FOLDS", "2", "OPTIMIZER.MAX_EPOCH", "10",
              "OUTPUT_DIR", str(tmp_path), "TRAIN.AUTO_RESUME", "true"])
    state = TrainState(step=jnp.asarray(7, jnp.int32),
                       variables={"params": {"w": jnp.ones((2,))}},
                       opt_state={"m": jnp.zeros((2,))}, ema_variables=None)
    cu.save_checkpoint(cfg, state, cur_epoch=0)  # fold-epoch 0 covers 0..1
    restored, start_epoch, _ = cu.load_train_checkpoint(cfg, state)
    assert start_epoch == 2, start_epoch
    assert int(restored.step) == 7
    # remaining epochs stay divisible by NUM_FOLDS (the train-loop assert)
    assert (cfg.OPTIMIZER.MAX_EPOCH - start_epoch) % 2 == 0


def test_val_padding_excluded_from_metrics(tiny_cfg, trained):
    """len(val) % global_batch != 0: the in-train val mean must equal the
    exact unpadded per-sample mean — loader pad duplicates (host-shard +
    final-batch cycling, data/builder.py) are excluded via the `_mask`
    column threaded into the eval step."""
    import jax
    import numpy as np
    from dist_tpu.data.builder import build_loader
    from dist_tpu.models.base.models import build_model
    from dist_tpu.parallel.mesh import build_mesh, shard_params
    from dist_tpu.tasks.state import make_eval_step
    from dist_tpu.tasks.train import eval_epoch
    from dist_tpu.utils.meters import ValMeter

    from dist_tpu.tasks.state import compute_text_features

    cfg = tiny_cfg.deep_copy()
    cfg.TRAIN.NUM_SAMPLES_LIMIT = 13  # 13 % (1 x 8 devices) != 0 -> pads to 16
    mesh = build_mesh(cfg)
    model = build_model(cfg)
    loader = build_loader(cfg, "val")
    variables = jax.device_get(trained.variables)
    text_features = compute_text_features(
        model, variables, loader.dataset.text_tokens, mesh)
    with mesh:
        state = shard_params(mesh, trained, fsdp=False)
        eval_step = jax.jit(make_eval_step(model, cfg))
        meter = ValMeter(len(loader), cfg)
        stats = eval_epoch(cfg, mesh, state, eval_step, loader, meter, 0,
                           text_features)

    # ground truth: the same model applied to exactly the 13 true samples
    ds = loader.dataset
    videos = np.stack([ds[i]["video"] for i in range(13)])
    labels = np.asarray([ds[i]["label"] for i in range(13)])
    tf_host = jax.device_get(text_features)
    preds, _ = jax.jit(lambda v, b, t: model.apply(
        v, {"video": b, "text_features": t}, train=False))(
            variables, videos, tf_host)
    preds = np.asarray(preds)
    top1 = float((preds.argmax(-1) != labels).mean() * 100.0)
    assert abs(float(stats["top1_err"]) - top1) < 1e-3
