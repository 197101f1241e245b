"""Training task loop (reference runs/train.py:331-431 + train_epoch 40-206).

Single-controller, mesh-sharded: the entire per-iteration body (mixup, LR,
forward/backward, update, EMA, metrics) is one jitted step; batches stream
in host-sharded and get placed with the data-axis sharding. Epochs stride
``NUM_FOLDS`` with the reference's shuffle/checkpoint/eval cadence. The
``./current_epoch/`` filesystem IPC (runs/train.py:29-37) is gone — the
loader gets the epoch passed explicitly.
"""

import signal
import threading

import jax
import numpy as np

from dist_tpu.data.builder import build_loader, shuffle_dataset
from dist_tpu.models.base.models import build_model
from dist_tpu.optim.optimizer import construct_optimizer
from dist_tpu.parallel.mesh import build_mesh, shard_batch, shard_params
from dist_tpu.tasks.state import (
    create_train_state,
    make_eval_step,
    make_train_step,
)
from dist_tpu.utils import checkpoint as cu
from dist_tpu.utils import logging, misc
from dist_tpu.utils.meters import TrainMeter, ValMeter

logger = logging.get_logger(__name__)


def _init_state(cfg, model, sample_batch, steps_per_epoch):
    from dist_tpu.tasks.state import init_variables
    variables = init_variables(cfg, model, sample_batch["video"].shape[1:])
    tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch)
    ema_decay = (float(cfg.MODEL.EMA.DECAY)
                 if cfg.MODEL.get("EMA") and cfg.MODEL.EMA.ENABLE else None)
    state = create_train_state(variables, tx, ema_decay)
    return state, tx, lr_fn


# Preemption flag: set by SIGTERM (TPU/GCE preemption notice) or by the
# TRAIN.PREEMPT_AFTER_ITERS fault-injection knob; the train loop drains the
# current step, writes a mid-epoch checkpoint, and exits 0. The reference
# has no preemption story (SURVEY.md §5.3) — a kill loses everything since
# the last epoch checkpoint.
#
# Multihost: SIGTERM lands on each host at a slightly different moment, so
# acting on the LOCAL flag alone would have hosts leave the step loop at
# different iterations — mismatched collectives (deadlock until the grace
# period SIGKILLs everyone) and divergent checkpoint names. The loop only
# acts on the cross-host AGREED flag (``collectives.any_flag``), polled at
# uniform boundaries every ``TRAIN.PREEMPT_SYNC_PERIOD`` steps (identical
# per-host loader lengths make the poll a uniform collective).
_PREEMPTED = threading.Event()


def _sync_period(cfg):
    return max(1, int(cfg.TRAIN.get("PREEMPT_SYNC_PERIOD", 10) or 1))


def _agreed_preempted(cfg):
    """The cross-host agreed preemption flag (uniform collective — every
    process must reach this call at the same program point)."""
    if not bool(cfg.TRAIN.get("SAVE_ON_PREEMPTION", True)):
        return False
    from dist_tpu.parallel import collectives
    return collectives.any_flag(_PREEMPTED.is_set())


# distinguishes "handler never installed" from a previous disposition of
# None (signal.signal returns None when the prior handler was installed
# outside Python, e.g. by an embedding runtime) — conflating the two would
# leave the flag-setting handler swallowing SIGTERM for the rest of the
# process after training
_HANDLER_NOT_INSTALLED = object()


def _install_preemption_handler():
    """Returns the previous SIGTERM disposition (to restore after the
    train loop — leaving the flag-setting handler installed would swallow
    SIGTERM for the rest of the process, e.g. the hours-long multi-view
    test phase that follows train in the same run list), or
    ``_HANDLER_NOT_INSTALLED`` when not on the main thread."""
    def _on_sigterm(signum, frame):
        logger.info("SIGTERM: will checkpoint at the next step boundary.")
        _PREEMPTED.set()

    try:
        return signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        # not the main thread (embedded use); preemption save unavailable
        logger.info("Not installing SIGTERM handler (non-main thread).")
        return _HANDLER_NOT_INSTALLED


def _poll_stop(cfg, boundary_iter, multihost, sync_period):
    """The uniform stop-flag poll shared by the train and eval loops:
    single-host acts on the local flag (gated on SAVE_ON_PREEMPTION like
    the multihost path, so the same config means the same semantics at any
    process count); multihost acts only on the cross-host AGREED flag at
    every ``sync_period``-th boundary."""
    if not bool(cfg.TRAIN.get("SAVE_ON_PREEMPTION", True)):
        return False
    if multihost:
        if (boundary_iter + 1) % sync_period:
            return False
        return _agreed_preempted(cfg)
    return _PREEMPTED.is_set()


def _text_features(cfg, model, state, dataset, mesh=None):
    from dist_tpu.tasks.state import compute_text_features
    return compute_text_features(model, state.variables,
                                 getattr(dataset, "text_tokens", None), mesh)


def train(cfg):
    """(reference runs/train.py:331)"""
    np.random.seed(int(cfg.RANDOM_SEED))
    logging.setup_logging(cfg, cfg.TRAIN.LOG_FILE)
    logger.info("Train with config:\n%s", cfg.dump() if cfg.LOG_CONFIG_INFO else "")

    mesh = build_mesh(cfg)
    model = build_model(cfg)

    train_loader = build_loader(cfg, "train")
    val_loader = build_loader(cfg, "val")
    # the schedule divides by the FULL fold-epoch loader length (it already
    # multiplies by NUM_FOLDS, lr_policy.lr_schedule_by_step; reference
    # runs/train.py:97) — dividing here too would run warmup/cosine
    # NUM_FOLDS x too fast
    steps_per_epoch = max(len(train_loader), 1)

    first_batch = next(iter(train_loader))
    state, tx, lr_fn = _init_state(cfg, model, first_batch, steps_per_epoch)
    if cfg.LOG_MODEL_INFO:
        misc.log_model_info(state.variables)
    state, start_epoch, start_iter = cu.load_train_checkpoint(
        cfg, state, dataset_len=len(train_loader.dataset))
    if start_iter and start_iter >= len(train_loader):
        # belt-and-braces for a mid-epoch checkpoint recorded at (or past)
        # the epoch length (shouldn't happen — the save path promotes a
        # fully-consumed epoch to an end-of-epoch checkpoint): treat the
        # fold-epoch as done rather than dying on the loader's skip assert
        logger.warning("Mid-epoch checkpoint iter %d >= epoch length %d; "
                       "resuming at the next fold-epoch.", start_iter,
                       len(train_loader))
        start_epoch += int(cfg.TRAIN.get("NUM_FOLDS", 1))
        start_iter = 0

    text_features = _text_features(cfg, model, state, train_loader.dataset,
                                   mesh)

    with mesh:
        state = shard_params(mesh, state,
                             fsdp=bool(cfg.TPU.get("FSDP", False)))
        train_step = jax.jit(make_train_step(model, cfg, tx, lr_fn, mesh=mesh),
                             donate_argnums=(0,) if cfg.TPU.DONATE_STATE else ())
        eval_step = jax.jit(make_eval_step(model, cfg))
        ema_enabled = bool(cfg.MODEL.get("EMA") and cfg.MODEL.EMA.ENABLE)
        ema_eval_step = (jax.jit(make_eval_step(model, cfg, use_ema=True))
                         if ema_enabled else None)

        rng = jax.random.PRNGKey(int(cfg.RANDOM_SEED) + 1)
        num_folds = int(cfg.TRAIN.get("NUM_FOLDS", 1))
        assert (cfg.OPTIMIZER.MAX_EPOCH - start_epoch) % num_folds == 0, (
            f"remaining epochs ({cfg.OPTIMIZER.MAX_EPOCH} - {start_epoch}) "
            f"must be divisible by TRAIN.NUM_FOLDS={num_folds} "
            "(reference runs/train.py:401)")
        train_meter = TrainMeter(len(train_loader), cfg)
        val_meter = ValMeter(len(val_loader), cfg)

        _PREEMPTED.clear()
        prev_sigterm = _HANDLER_NOT_INSTALLED
        if bool(cfg.TRAIN.get("SAVE_ON_PREEMPTION", True)):
            prev_sigterm = _install_preemption_handler()
        run_iters = [0]  # fault-injection counter (TRAIN.PREEMPT_AFTER_ITERS)
        if start_iter:
            logger.info("Mid-epoch resume: fold-epoch %d from iter %d",
                        start_epoch, start_iter)
            train_loader.set_skip_batches(start_iter)

        state_box = [state]
        try:
            _run_epochs(cfg, mesh, state_box, train_step,
                        eval_step, ema_eval_step, train_loader, val_loader,
                        train_meter, val_meter, rng, text_features,
                        start_epoch, start_iter, num_folds, run_iters)
            state = state_box[0]
        finally:
            if prev_sigterm is not _HANDLER_NOT_INSTALLED:
                # restore the previous disposition: after training, a
                # preemption SIGTERM should terminate the process (the
                # test/submission phases have nothing to checkpoint). A
                # None previous disposition means "installed outside
                # Python" — restore SIG_DFL, the closest restorable state.
                signal.signal(signal.SIGTERM,
                              prev_sigterm if prev_sigterm is not None
                              else signal.SIG_DFL)
            # release worker pools NOW (a process-pool loader would
            # otherwise keep idle spawned workers alive until GC while the
            # rest of the run list executes)
            train_loader.close()
            val_loader.close()
        cu.wait_until_finished()  # join an in-flight async checkpoint commit
    return state


def _run_epochs(cfg, mesh, state_box, train_step, eval_step, ema_eval_step,
                train_loader, val_loader, train_meter, val_meter, rng,
                text_features, start_epoch, start_iter, num_folds, run_iters):
    """The epoch loop, split out of train() so the SIGTERM handler can be
    restored in a finally regardless of how the loop exits. ``state_box``
    carries the evolving TrainState back to the caller (SystemExit on a
    preemption save skips any return value)."""
    state = state_box[0]
    for cur_epoch in range(start_epoch, cfg.OPTIMIZER.MAX_EPOCH, num_folds):
            state_box[0] = state
            shuffle_dataset(train_loader, cur_epoch)
            if hasattr(train_loader.dataset, "set_epoch_rate"):
                # explicit curriculum progress (replaces the reference's
                # ./current_epoch/ filesystem IPC, runs/train.py:29-37)
                train_loader.dataset.set_epoch_rate(
                    cur_epoch / max(float(cfg.OPTIMIZER.MAX_EPOCH), 1.0))
            iter_offset = start_iter if cur_epoch == start_epoch else 0
            state, preempt_iter = train_epoch(
                cfg, mesh, state, train_step, train_loader, train_meter,
                cur_epoch, rng, text_features, iter_offset, run_iters)
            if preempt_iter is not None:
                if preempt_iter >= len(train_loader):
                    # caught at the FINAL step: the fold-epoch is fully
                    # consumed — save a normal end-of-epoch checkpoint. A
                    # mid-epoch save with iter == epoch length would make
                    # every resume skip past the whole epoch and die on
                    # the loader's skip assert, permanently unresumable.
                    cu.save_checkpoint(cfg, state, cur_epoch)
                else:
                    cu.save_checkpoint(
                        cfg, state, cur_epoch, iter_in_epoch=preempt_iter,
                        dataset_len=len(train_loader.dataset))
                cu.wait_until_finished()
                logger.info("Preemption checkpoint committed (fold-epoch %d, "
                            "iter %d); exiting.", cur_epoch, preempt_iter)
                raise SystemExit(0)

            def _exit_preempted(saved):
                # a SIGTERM that landed outside the step loop (epoch tail,
                # checkpoint save, eval) still exits promptly with a
                # durable end-of-epoch checkpoint instead of being
                # silently absorbed until the grace period SIGKILLs us
                if not saved:
                    cu.save_checkpoint(cfg, state, cur_epoch)
                cu.wait_until_finished()
                logger.info("Preemption at the fold-epoch %d boundary; "
                            "checkpoint committed, exiting.", cur_epoch)
                raise SystemExit(0)

            saved_this_epoch = False
            if cu.is_checkpoint_epoch(cfg, cur_epoch):
                # collective save of the sharded state: EVERY process calls
                # in (orbax writes each shard exactly once, replicated
                # leaves from the primary host only) — device_get'ing to
                # host numpy first would make all hosts write the same
                # files concurrently (reference is master-only torch.save,
                # utils/checkpoint.py:102-143)
                cu.save_checkpoint(cfg, state, cur_epoch)
                saved_this_epoch = True
            if _agreed_preempted(cfg):
                _exit_preempted(saved_this_epoch)
            if misc.is_eval_epoch(cfg, cur_epoch):
                eval_epoch(cfg, mesh, state, eval_step, val_loader, val_meter,
                           cur_epoch, text_features)
                if ema_eval_step is not None:
                    # also evaluate the EMA weights (reference
                    # runs/train.py:419-422; the reference's EMA was dead
                    # code — implemented properly here)
                    logger.info("Evaluating EMA model.")
                    eval_epoch(cfg, mesh, state, ema_eval_step, val_loader,
                               val_meter, cur_epoch, text_features)
                if _agreed_preempted(cfg):
                    # eval_epoch aborts early on the agreed flag; commit a
                    # checkpoint and exit before starting another epoch
                    _exit_preempted(saved_this_epoch)
    state_box[0] = state


def train_epoch(cfg, mesh, state, train_step, loader, meter, cur_epoch, rng,
                text_features, iter_offset=0, run_iters=None):
    """Returns ``(state, preempt_iter)``: ``preempt_iter`` is None for a
    completed epoch, else the number of batches of this fold-epoch already
    consumed (incl. any resumed prefix) — the caller checkpoints it and
    exits."""
    # fault injection: N >= 0 triggers at the first step boundary once N
    # steps have run (so 0 and 1 both fire after the 1st step — a mid-epoch
    # save at iter 0 would be identical to the previous checkpoint);
    # -1/None disables
    raw = cfg.TRAIN.get("PREEMPT_AFTER_ITERS", -1)
    preempt_after = -1 if raw is None else int(raw)
    multihost = jax.process_count() > 1
    sync_period = _sync_period(cfg)
    meter.iter_tic()

    def consume(metrics, cur_iter, mb_size):
        # lag-1 metric readback: metrics of step k are fetched while step
        # k+1 runs on device, so the host never blocks the accelerator
        # (the reference syncs with .item() every iteration,
        # runs/train.py:169-201)
        metrics = jax.device_get(metrics)
        misc.check_nan_losses(metrics["loss"])
        meter.iter_toc()
        meter.update_stats(
            float(metrics["top1_err"]), float(metrics["top5_err"]),
            float(metrics["loss"]), float(metrics["lr"]),
            mb_size * jax.process_count())
        extra = {k: float(v) for k, v in metrics.items()
                 if k not in ("loss", "top1_err", "top5_err", "lr", "preds")}
        if extra:
            meter.update_custom_stats(extra)
        meter.log_iter_stats(cur_epoch, cur_iter)
        meter.iter_tic()

    pending = None
    for cur_iter, batch in enumerate(loader):
        host_batch = {"video": batch["video"], "labels": batch["label"]}
        for extra_key in ("label_verb", "label_noun", "contrastive"):
            if extra_key in batch:
                # per-sample columns ride the same data-axis sharding as the
                # video (putting them replicated forces an XLA reshard)
                host_batch[extra_key] = batch[extra_key]
        device_batch = shard_batch(mesh, host_batch)
        if text_features is not None:
            device_batch["text_features"] = text_features
        state, metrics = train_step(state, device_batch, rng)
        if pending is not None:
            consume(*pending)
        # meters report the GLOBAL in-epoch iteration (a mid-epoch resume
        # re-enumerates the tail from 0; logs must not)
        pending = (metrics, iter_offset + cur_iter, batch["video"].shape[0])
        if run_iters is not None:
            run_iters[0] += 1
            if 0 <= preempt_after <= run_iters[0]:
                _PREEMPTED.set()  # fault injection: simulate the SIGTERM
        if _poll_stop(cfg, cur_iter, multihost, sync_period):
            consume(*pending)
            return state, iter_offset + cur_iter + 1
    if pending is not None:
        consume(*pending)
    if iter_offset:
        # the meter only saw the replayed tail; label the summary so the
        # resumed epoch's loss point isn't read as a full-epoch average
        logger.info("fold-epoch %d summary below covers iters %d+ only "
                    "(mid-epoch resume)", cur_epoch, iter_offset)
    meter.log_epoch_stats(cur_epoch + int(cfg.TRAIN.get("NUM_FOLDS", 1)) - 1)
    meter.reset()
    return state, None


def eval_epoch(cfg, mesh, state, eval_step, loader, meter, cur_epoch,
               text_features):
    """(reference runs/train.py:209-329)

    Lag-1 pipelined like the train/test loops: batch k's scalar metrics
    are fetched while batch k+1 computes, so the host never blocks the
    accelerator between eval steps."""
    meter.reset()
    multihost = jax.process_count() > 1
    sync_period = _sync_period(cfg)

    def consume(metrics, mb):
        # drop the data-sharded preds before fetching: eval-in-train only
        # consumes the (replicated) scalar metrics, and device_get on a
        # cross-host-sharded array raises
        metrics = jax.device_get(
            {k: v for k, v in metrics.items() if k != "preds"})
        # the step's errors are means over VALID samples only (pad mask);
        # weight the meter by the valid count so the epoch mean is exact
        nv = metrics.pop("num_valid", None)
        if nv is not None:
            mb = float(nv)
        if mb <= 0:
            return  # batch entirely pad duplicates
        meter.update_stats(float(metrics["top1_err"]),
                           float(metrics["top5_err"]), mb)
        extra = {k: float(v) for k, v in metrics.items()
                 if k not in ("top1_err", "top5_err", "preds")}
        if extra:
            meter.update_custom_stats(extra, mb_size=mb)

    pending = None
    for cur_iter, batch in enumerate(loader):
        # preemption during eval: abort promptly (eval results are
        # recomputable; the caller commits a checkpoint and exits). Same
        # agreed-flag discipline as the train loop — the eval_step is a
        # collective too
        if _poll_stop(cfg, cur_iter, multihost, sync_period):
            logger.info("Preemption: aborting eval at iter %d.", cur_iter)
            return None
        host_batch = {"video": batch["video"], "labels": batch["label"]}
        if "_mask" in batch:
            # loader validity column: excludes pad duplicates from metrics
            host_batch["mask"] = batch["_mask"]
        for extra_key in ("label_verb", "label_noun"):
            if extra_key in batch:
                # EPIC dual labels: the eval step reports the joint action
                # error plus per-head custom stats (reference eval_epoch)
                host_batch[extra_key] = batch[extra_key]
        device_batch = shard_batch(mesh, host_batch)
        if text_features is not None:
            device_batch["text_features"] = text_features
        metrics = eval_step(state, device_batch)
        if pending is not None:
            consume(*pending)
        pending = (metrics, batch["video"].shape[0] * jax.process_count())
    if pending is not None:
        consume(*pending)
    return meter.log_epoch_stats(cur_epoch)
