"""Preemption-safe + async checkpointing.

The reference has no preemption story (SURVEY.md section 5.3): a SIGTERM
loses everything since the last epoch checkpoint (utils/checkpoint.py:102).
Here SIGTERM (or the TRAIN.PREEMPT_AFTER_ITERS fault-injection knob) drains
the in-flight step, writes a mid-epoch orbax checkpoint carrying
(epoch, iter), and exits 0; resume skips exactly the consumed prefix of the
deterministic index stream, so the resumed run is step-for-step identical
to an uninterrupted one (the train step folds its PRNG with state.step).
"""

import os

import numpy as np
import pytest

from dist_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml")


def _cfg(out, *opts):
    return load_config(CFG, opts=["OUTPUT_DIR", str(out)] + list(opts))


def test_loader_skip_batches_matches_full_stream(tmp_path):
    """set_skip_batches(n) reproduces the tail of the same epoch's stream
    (and is one-shot: the following epoch is full again)."""
    from dist_tpu.data.builder import build_loader

    cfg = _cfg(tmp_path)
    loader = build_loader(cfg, "train")
    loader.set_epoch(0)
    full = [b["label"] for b in loader]
    assert len(full) == 2
    loader.set_epoch(0)
    loader.set_skip_batches(1)
    tail = [b["label"] for b in loader]
    assert len(tail) == 1
    np.testing.assert_array_equal(tail[0], full[1])
    loader.set_epoch(0)  # one-shot: consumed by the previous __iter__
    assert len([b for b in loader]) == 2


def test_mid_epoch_checkpoint_roundtrip(tmp_path):
    """A mid-epoch save stores (cur_epoch, iter), sorts after the
    start-of-epoch checkpoint, and load_train_checkpoint surfaces both."""
    import jax.numpy as jnp

    from dist_tpu.tasks.state import TrainState
    from dist_tpu.utils import checkpoint as cu

    cfg = _cfg(tmp_path, "TRAIN.NUM_FOLDS", "2", "OPTIMIZER.MAX_EPOCH", "10",
               "TRAIN.AUTO_RESUME", "true")
    state = TrainState(step=jnp.asarray(5, jnp.int32),
                       variables={"params": {"w": jnp.full((3,), 2.0)}},
                       opt_state={"m": jnp.zeros((3,))}, ema_variables=None)
    cu.save_checkpoint(cfg, state, cur_epoch=0)  # end of fold-epoch 0 -> "2"
    mid = state.replace(step=jnp.asarray(8, jnp.int32))
    cu.save_checkpoint(cfg, mid, cur_epoch=2, iter_in_epoch=3)
    last = cu.get_last_checkpoint(cfg)
    assert last.endswith("checkpoint_epoch_00002_iter_0000003"), last
    restored, start_epoch, start_iter = cu.load_train_checkpoint(cfg, state)
    assert (start_epoch, start_iter) == (2, 3)
    assert int(restored.step) == 8
    # the fold-grid assert in the train loop still holds on resume
    assert (cfg.OPTIMIZER.MAX_EPOCH - start_epoch) % 2 == 0


def test_mid_epoch_resume_rejects_changed_loader_geometry(tmp_path):
    """A mid-epoch checkpoint records the loader signature (seed, local
    batch, hosts, folds); resuming with a different geometry must restart
    the fold-epoch from iter 0 instead of skipping the wrong prefix."""
    import jax.numpy as jnp

    from dist_tpu.tasks.state import TrainState
    from dist_tpu.utils import checkpoint as cu

    cfg = _cfg(tmp_path, "TRAIN.AUTO_RESUME", "true", "TRAIN.BATCH_SIZE", "2")
    state = TrainState(step=jnp.asarray(3, jnp.int32),
                       variables={"params": {"w": jnp.ones((2,))}},
                       opt_state={"m": jnp.zeros((2,))}, ema_variables=None)
    cu.save_checkpoint(cfg, state, cur_epoch=0, iter_in_epoch=5)

    same = _cfg(tmp_path, "TRAIN.AUTO_RESUME", "true", "TRAIN.BATCH_SIZE", "2")
    _, epoch, start_iter = cu.load_train_checkpoint(same, state)
    assert (epoch, start_iter) == (0, 5)

    changed = _cfg(tmp_path, "TRAIN.AUTO_RESUME", "true",
                   "TRAIN.BATCH_SIZE", "4")
    _, epoch, start_iter = cu.load_train_checkpoint(changed, state)
    assert (epoch, start_iter) == (0, 0)  # geometry changed -> replay epoch


def test_async_checkpoint_commit(tmp_path):
    """TRAIN.CHECKPOINT_ASYNC: the save returns before commit;
    wait_until_finished makes it durable and byte-identical."""
    import jax.numpy as jnp

    from dist_tpu.tasks.state import TrainState
    from dist_tpu.utils import checkpoint as cu

    cfg = _cfg(tmp_path, "TRAIN.CHECKPOINT_ASYNC", "true",
               "TRAIN.AUTO_RESUME", "true")
    state = TrainState(step=jnp.asarray(4, jnp.int32),
                       variables={"params": {"w": jnp.arange(4.0)}},
                       opt_state={"m": jnp.ones((4,))}, ema_variables=None)
    cu.save_checkpoint(cfg, state, cur_epoch=0)
    cu.wait_until_finished()
    restored, start_epoch, start_iter = cu.load_train_checkpoint(cfg, state)
    assert (start_epoch, start_iter) == (1, 0)
    np.testing.assert_array_equal(
        np.asarray(restored.variables["params"]["w"]), np.arange(4.0))
    np.testing.assert_array_equal(np.asarray(restored.opt_state["m"]),
                                  np.ones((4,)))


def test_checkpoint_retention_keeps_last_n(tmp_path):
    """TRAIN.CHECKPOINT_KEEP_LAST prunes all but the newest N committed
    checkpoints after each save; -1 (default) keeps everything."""
    import jax.numpy as jnp

    from dist_tpu.tasks.state import TrainState
    from dist_tpu.utils import checkpoint as cu

    cfg = _cfg(tmp_path, "TRAIN.CHECKPOINT_KEEP_LAST", "2",
               "TRAIN.AUTO_RESUME", "true")
    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       variables={"params": {"w": jnp.ones((2,))}},
                       opt_state={"m": jnp.zeros((2,))}, ema_variables=None)
    for epoch in range(4):
        cu.save_checkpoint(cfg, state, cur_epoch=epoch)
    d = cu.checkpoint_dir(cfg)

    def names():
        return sorted(n for n in os.listdir(d)
                      if n.startswith("checkpoint_")
                      and os.path.isdir(os.path.join(d, n)))

    assert names() == ["checkpoint_epoch_00003", "checkpoint_epoch_00004"]
    # the survivor is loadable
    restored, start_epoch, _ = cu.load_train_checkpoint(cfg, state)
    assert start_epoch == 4
    # a mid-epoch (preemption) checkpoint participates in retention too
    cu.save_checkpoint(cfg, state, cur_epoch=4, iter_in_epoch=1)
    assert names() == ["checkpoint_epoch_00004",
                       "checkpoint_epoch_00004_iter_0000001"]


def test_async_retention_never_drops_below_keep(tmp_path):
    """CHECKPOINT_ASYNC + KEEP_LAST: pruning runs BEFORE the new save is
    issued, so a crash while the async commit is in flight always leaves
    the newest KEEP_LAST committed checkpoints on disk."""
    import jax.numpy as jnp

    from dist_tpu.tasks.state import TrainState
    from dist_tpu.utils import checkpoint as cu

    cfg = _cfg(tmp_path, "TRAIN.CHECKPOINT_ASYNC", "true",
               "TRAIN.CHECKPOINT_KEEP_LAST", "1")
    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       variables={"params": {"w": jnp.ones((2,))}},
                       opt_state={"m": jnp.zeros((2,))}, ema_variables=None)
    d = cu.checkpoint_dir(cfg)

    def names():
        return sorted(n for n in os.listdir(d)
                      if n.startswith("checkpoint_")
                      and os.path.isdir(os.path.join(d, n)))

    cu.save_checkpoint(cfg, state, cur_epoch=0)
    cu.wait_until_finished()
    assert names() == ["checkpoint_epoch_00001"]
    cu.save_checkpoint(cfg, state, cur_epoch=1)
    cu.wait_until_finished()
    # transient keep+1: epoch 1 stays durable until the NEXT save prunes
    assert names() == ["checkpoint_epoch_00001", "checkpoint_epoch_00002"]
    cu.save_checkpoint(cfg, state, cur_epoch=2)
    cu.wait_until_finished()
    assert names() == ["checkpoint_epoch_00002", "checkpoint_epoch_00003"]


@pytest.mark.slow
def test_preempt_at_epoch_final_step_saves_end_of_epoch(tmp_path):
    """A preemption caught at the LAST step of a fold-epoch must save a
    normal end-of-epoch checkpoint (iter == epoch length in a mid-epoch
    name would poison every resume on the loader's skip assert)."""
    from dist_tpu.tasks.train import train
    from dist_tpu.utils import checkpoint as cu

    opts = ["OPTIMIZER.MAX_EPOCH", "2", "TRAIN.AUTO_RESUME", "true"]
    out = tmp_path / "run"
    # the tiny config yields 2 batches/fold-epoch: preempt after iter 2
    with pytest.raises(SystemExit) as e:
        train(_cfg(out, *opts, "TRAIN.PREEMPT_AFTER_ITERS", "2"))
    assert e.value.code == 0
    last = cu.get_last_checkpoint(_cfg(out, *opts))
    assert last.endswith("checkpoint_epoch_00001"), last  # no _iter_ suffix
    # resume completes the remaining epoch cleanly
    resumed = train(_cfg(out, *opts))
    assert int(resumed.step) == 4


@pytest.mark.slow
def test_preempt_resume_matches_uninterrupted(tmp_path):
    """Fault-inject a preemption after 1 of 4 steps; resuming completes the
    run with final params IDENTICAL to an uninterrupted run (deterministic
    index stream + step-folded PRNG)."""
    import jax

    from dist_tpu.tasks.train import train
    from dist_tpu.utils import checkpoint as cu

    opts = ["OPTIMIZER.MAX_EPOCH", "2", "TRAIN.AUTO_RESUME", "true"]

    # uninterrupted reference run
    ref = train(_cfg(tmp_path / "ref", *opts))

    # preempted run: SystemExit(0) after step 1, mid-epoch ckpt written
    pre_out = tmp_path / "pre"
    with pytest.raises(SystemExit) as e:
        train(_cfg(pre_out, *opts, "TRAIN.PREEMPT_AFTER_ITERS", "1"))
    assert e.value.code == 0
    last = cu.get_last_checkpoint(_cfg(pre_out, *opts))
    assert "_iter_0000001" in last, last

    # resume to completion and compare final params exactly
    resumed = train(_cfg(pre_out, *opts))
    assert int(resumed.step) == int(ref.step) == 4
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref.variables),
            jax.tree_util.tree_leaves_with_path(resumed.variables)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0,
                                   atol=0, err_msg=str(pa))


def test_retention_sweeps_orphan_sidecars(tmp_path):
    """An async save that dies before commit leaves a `.config.yaml`
    sidecar with no checkpoint dir; retention GC removes such orphans
    (sidecars of live checkpoints survive)."""
    import jax.numpy as jnp

    from dist_tpu.tasks.state import TrainState
    from dist_tpu.utils import checkpoint as cu

    cfg = _cfg(tmp_path, "TRAIN.CHECKPOINT_KEEP_LAST", "2")
    state = TrainState(step=jnp.asarray(0, jnp.int32),
                       variables={"params": {"w": jnp.ones((2,))}},
                       opt_state={"m": jnp.zeros((2,))}, ema_variables=None)
    cu.save_checkpoint(cfg, state, cur_epoch=0)
    d = cu.checkpoint_dir(cfg)
    orphan = os.path.join(d, "checkpoint_epoch_00099.config.yaml")
    with open(orphan, "w") as f:
        f.write("# orphan from a crashed async save\n")
    cu.prune_old_checkpoints(cfg)
    assert not os.path.exists(orphan)
    live = os.path.join(d, "checkpoint_epoch_00001.config.yaml")
    assert os.path.exists(live)  # sidecar of a committed ckpt survives
