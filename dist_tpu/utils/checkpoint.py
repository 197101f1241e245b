"""Checkpointing: Orbax save/load + PyTorch import.

Rebuild of the reference's ``utils/checkpoint.py``:

- save ``{epoch, variables, opt_state, ema}`` per checkpoint epoch under
  ``OUTPUT_DIR/checkpoints/`` (checkpoint.py:102-143) via Orbax (multihost-
  safe, replaces master-only torch.save),
- auto-resume from the latest checkpoint / fine-tune entry
  (``load_train_checkpoint``, checkpoint.py:532-577),
- test-time priority TEST.CHECKPOINT_FILE_PATH > last > TRAIN's
  (``load_test_checkpoint``, checkpoint.py:452-529),
- ``CHECKPOINT_TYPE: pytorch``: released ``.pyth``/``.pt`` checkpoints are
  converted on the fly (incl. the ladder_net rename) — replaces
  ``process_dist_cpkt.py``.
"""

import os
import re

import numpy as np
import orbax.checkpoint as ocp

from dist_tpu.utils import logging

logger = logging.get_logger(__name__)


def checkpoint_dir(cfg):
    return os.path.join(cfg.OUTPUT_DIR, "checkpoints")


def make_checkpoint_dir(output_dir):
    os.makedirs(os.path.join(output_dir, "checkpoints"), exist_ok=True)


def _ckpt_path(cfg, epoch, iter_in_epoch=None):
    name = f"checkpoint_epoch_{epoch:05d}"
    if iter_in_epoch is not None:
        # mid-epoch (preemption) checkpoint: epoch E iter K sorts after the
        # start-of-E checkpoint and before end-of-E (named E+folds)
        name += f"_iter_{iter_in_epoch:07d}"
    return os.path.abspath(os.path.join(checkpoint_dir(cfg), name))


def _list_checkpoints(cfg):
    """Committed checkpoint dir names under OUTPUT_DIR/checkpoints, sorted
    chronologically (lexicographic == chronological for both epoch and
    mid-epoch names; an in-flight orbax save lives under an
    ``.orbax-...-tmp`` name the pattern excludes)."""
    d = checkpoint_dir(cfg)
    if not os.path.isdir(d):
        return []
    return sorted(n for n in os.listdir(d)
                  if re.match(r"checkpoint_epoch_\d+(_iter_\d+)?$", n)
                  and os.path.isdir(os.path.join(d, n)))


def get_last_checkpoint(cfg):
    """Latest checkpoint dir or None (checkpoint.py:62-75)."""
    names = _list_checkpoints(cfg)
    if not names:
        return None
    return os.path.abspath(os.path.join(checkpoint_dir(cfg), names[-1]))


def prune_old_checkpoints(cfg):
    """Retention GC: keep only the newest ``TRAIN.CHECKPOINT_KEEP_LAST``
    COMMITTED checkpoints (-1/0 = keep all, the default and the reference's
    only behavior — utils/checkpoint.py:102 never deletes). Multi-host:
    only the primary process deletes (shared OUTPUT_DIR). Only committed
    dirs are candidates (an in-flight async save lives under an
    ``.orbax-...-tmp`` name the pattern doesn't match), and the caller
    sequences the call so the durable count never drops below ``keep``:
    sync saves prune AFTER commit; async saves prune BEFORE issuing the new
    save (pruning after would count the uncommitted save and could delete
    the last durable checkpoint)."""
    keep = int(cfg.TRAIN.get("CHECKPOINT_KEEP_LAST", -1) or -1)
    if keep <= 0:
        return
    import jax
    if jax.process_index() != 0:
        return
    d = checkpoint_dir(cfg)
    doomed = _list_checkpoints(cfg)[:-keep]
    import shutil
    for name in doomed:
        path = os.path.join(d, name)
        try:
            shutil.rmtree(path)
            if os.path.exists(path + ".config.yaml"):
                os.remove(path + ".config.yaml")  # provenance sidecar
            logger.info("Pruned old checkpoint %s (KEEP_LAST=%d)", path, keep)
        except OSError as e:  # never fail training over GC
            logger.warning("Could not prune %s: %s", path, e)
    # orphaned sidecars: an async save that crashed before commit leaves a
    # `<name>.config.yaml` with no checkpoint dir (the sidecar is written at
    # issue time); they match no checkpoint so the loop above never removes
    # them — sweep them here so they can't accumulate forever
    try:
        for f in os.listdir(d):
            if f.endswith(".config.yaml") and not os.path.isdir(
                    os.path.join(d, f[:-len(".config.yaml")])):
                os.remove(os.path.join(d, f))
                logger.info("Removed orphan config sidecar %s", f)
    except OSError as e:
        logger.warning("Could not sweep orphan sidecars in %s: %s", d, e)


def _loader_signature(cfg, dataset_len=-1):
    """What the per-host batch stream is a function of: a mid-epoch
    checkpoint's recorded iter only resumes correctly when these match at
    restore (seed + local batch size + host count + folds + dataset
    length — the shuffle permutes ``arange(len(dataset))``, so a changed
    annotation set means a different stream even at the same geometry).
    Stored with every mid-epoch save; compared on load. ``dataset_len``
    is -1 when the caller has no loader in hand (tests, tooling): -1
    compares equal to -1, so signature checks remain meaningful for the
    remaining fields."""
    import jax
    from dist_tpu.parallel.mesh import config_data_axis_size
    scale = max(config_data_axis_size(cfg) // jax.process_count(), 1)
    return np.asarray([int(cfg.RANDOM_SEED),
                       int(cfg.TRAIN.BATCH_SIZE) * scale,
                       jax.process_count(),
                       int(cfg.TRAIN.get("NUM_FOLDS", 1)),
                       int(dataset_len)], np.int64)


def is_checkpoint_epoch(cfg, cur_epoch):
    """Checkpoint cadence incl. densified saves near the end
    (checkpoint.py:89-99)."""
    period = int(cfg.TRAIN.CHECKPOINT_PERIOD)
    max_epoch = int(cfg.OPTIMIZER.MAX_EPOCH)
    folds = int(cfg.TRAIN.get("NUM_FOLDS", 1))
    next_epoch = cur_epoch + folds
    return (next_epoch % period < folds) or (next_epoch >= max_epoch)


_ASYNC_CKPTR = None


def _get_checkpointer(async_save):
    """A module-singleton AsyncCheckpointer (its background commit thread
    must outlive the call) or a fresh blocking StandardCheckpointer."""
    global _ASYNC_CKPTR
    if not async_save:
        return ocp.StandardCheckpointer()
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_until_finished():
    """Block until any in-flight async checkpoint save has committed. Call
    before process exit (train end / preemption) — an uncommitted async
    save is invisible to ``get_last_checkpoint`` (orbax renames the tmp dir
    atomically on commit), so nothing is corrupted, but the work is lost."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(cfg, state, cur_epoch, iter_in_epoch=None,
                    dataset_len=-1):
    """Save the full TrainState at OUTPUT_DIR/checkpoints/ (orbax).

    Multi-host contract (replaces the reference's master-only torch.save,
    checkpoint.py:102-143): this is a COLLECTIVE — every process calls it
    with the (possibly sharded) ``jax.Array`` state and orbax coordinates
    the write: each array shard is written exactly once by a process that
    addresses it, replicated / host-numpy leaves by the primary host only,
    and the final commit is barriered so no host can race ahead of an
    incomplete checkpoint. ``OUTPUT_DIR`` must be on storage visible to
    all hosts (docs/MULTIHOST.md). Do NOT ``device_get`` first: host-local
    numpy trees would make every host write the same files concurrently.

    The stored ``epoch`` is the NEXT fold-epoch start (``cur_epoch +
    NUM_FOLDS``): one fold-epoch covers NUM_FOLDS data epochs, so resuming
    at ``cur_epoch + 1`` would fall off the fold grid, re-train covered
    epochs, and overshoot MAX_EPOCH (reference stores the last covered
    epoch and resumes at +1, runs/train.py:414 + checkpoint.py:544).

    ``iter_in_epoch``: a MID-epoch save (preemption path): the stored epoch
    is the CURRENT unfinished fold-epoch and ``iter`` the number of batches
    already consumed in it; resume skips exactly that prefix of the
    deterministic index stream (``Loader.set_skip_batches``).

    ``TRAIN.CHECKPOINT_ASYNC``: device arrays are snapshotted to host
    synchronously (so the caller may immediately donate/overwrite the
    state) and serialized/committed in the background, overlapping
    checkpoint IO with the next epoch. The next save (or
    ``wait_until_finished``) joins the in-flight commit first."""
    async_save = bool(cfg.TRAIN.get("CHECKPOINT_ASYNC", False))
    if iter_in_epoch is None:
        epoch = cur_epoch + int(cfg.TRAIN.get("NUM_FOLDS", 1))
        path = _ckpt_path(cfg, epoch)
    else:
        epoch = cur_epoch
        path = _ckpt_path(cfg, epoch, iter_in_epoch)
    ckptr = _get_checkpointer(async_save)
    payload = {
        "epoch": np.asarray(epoch, np.int32),
        "step": np.asarray(state.step),
        "variables": state.variables,
        "opt_state": state.opt_state,
    }
    if iter_in_epoch is not None:
        payload["iter"] = np.asarray(iter_in_epoch, np.int32)
        payload["loader_sig"] = _loader_signature(cfg, dataset_len)
    if state.ema_variables is not None:
        payload["ema_variables"] = state.ema_variables
    if async_save:
        # retention GC BEFORE issuing the save: only committed dirs are
        # candidates, so the durable count never drops below KEEP_LAST
        # while the new save's commit is still in flight (the transient
        # keep+1 after commit is trimmed by the next save)
        prune_old_checkpoints(cfg)
    ckptr.save(path, payload, force=True)
    if not async_save:
        ckptr.wait_until_finished()
        prune_old_checkpoints(cfg)
    _write_config_sidecar(cfg, path)
    logger.info("Saved checkpoint %s%s", path, " (async)" if async_save else "")
    return path


def _write_config_sidecar(cfg, ckpt_path):
    """Record the full resolved config next to the checkpoint (the
    reference stores ``cfg`` inside its .pyth payload, checkpoint.py:
    102-143; orbax trees hold arrays, so it rides as a YAML sidecar).
    Primary host only; ``<name>.config.yaml`` sits OUTSIDE the orbax dir
    so it never interferes with the atomic tmp-dir commit and the
    checkpoint matcher ignores it (retention GC removes it together with
    its checkpoint)."""
    import jax
    if jax.process_index() != 0:
        return
    try:
        with open(ckpt_path + ".config.yaml", "w") as f:
            f.write(cfg.dump())
    except Exception as e:  # provenance must never fail a save
        logger.warning("Could not write config sidecar for %s: %s",
                       ckpt_path, e)


def load_checkpoint(path, template=None):
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, target=template)
    return ckptr.restore(path)


def _is_torch_ckpt(path):
    return path.endswith((".pyth", ".pt", ".pth"))


def _pop_heads(tree):
    """Drop head params from a loaded tree (reference POP_HEAD,
    checkpoint.py:193-200) so fine-tunes keep the fresh head init."""
    if not isinstance(tree, dict):
        return tree
    return {k: _pop_heads(v) for k, v in tree.items() if "head" not in k}


def _walk_preprocess(cfg, tree):
    """Apply pos-embed / patch-embed adaptation to every backbone subtree
    (identified by its ``pos_embd`` / ``stem`` keys)."""
    from dist_tpu.utils.ckpt_preprocess import preprocess_params

    if not isinstance(tree, dict):
        return tree
    if "pos_embd" in tree or isinstance(tree.get("stem"), dict):
        return preprocess_params(cfg, tree)
    return {k: _walk_preprocess(cfg, v) for k, v in tree.items()}


def preprocess_loaded(cfg, loaded, template):
    """Checkpoint adaptation before the structural merge, honoring the
    reference's gates (utils/checkpoint.py:184-274 checkpoint_preprocess,
    310-325 inflation): ``TRAIN.CHECKPOINT_PRE_PROCESS.ENABLE`` drives
    POP_HEAD/pos-embed/patch-embed adaptation, ``TRAIN.CHECKPOINT_INFLATE``
    drives I3D-style 2D->3D conv inflation against the model template."""
    pp = cfg.TRAIN.get("CHECKPOINT_PRE_PROCESS")
    if pp and pp.get("ENABLE"):
        logger.info("Preprocessing given checkpoint.")
        if cfg.TRAIN.get("FINE_TUNE") and pp.get("POP_HEAD"):
            logger.info("Popping heads.")
            loaded = _pop_heads(loaded)
        loaded = _walk_preprocess(cfg, loaded)
    if cfg.TRAIN.get("CHECKPOINT_INFLATE"):
        from dist_tpu.utils.ckpt_preprocess import inflate_2d_to_3d
        loaded = inflate_2d_to_3d(loaded, template)
    return loaded


def load_torch_variables(cfg, path, variables_template):
    """Convert a torch checkpoint into our variables tree, verifying leaf
    shapes against the template."""
    from dist_tpu.models.clip.convert import (
        convert_clip_params, load_torch_state_dict)
    from dist_tpu.models.dist.dist_net import DiSTConfig

    sd = load_torch_state_dict(path)
    dist_cfg = None
    if cfg.VIDEO.BACKBONE.get("DIST") and cfg.VIDEO.BACKBONE.DIST.ENABLE:
        dist_cfg = DiSTConfig.from_cfg(cfg)
    params, _ = convert_clip_params(sd, with_dist=dist_cfg)

    template = variables_template["params"]
    params = preprocess_loaded(cfg, params, template)
    merged, missing, unexpected = merge_into_template(template, params)
    if missing:
        logger.info("Keys in model not matched: %s", missing[:20])
    if unexpected:
        logger.info("Keys in checkpoint not matched: %s", unexpected[:20])
    out = dict(variables_template)
    out["params"] = merged
    return out


def merge_into_template(template, loaded):
    """Structural merge: loaded leaves overwrite template leaves where paths
    + shapes match (the functional analog of load_state_dict(strict=False),
    clip.py:608-610)."""
    missing, unexpected = [], []

    def walk(tpl, new, path):
        if isinstance(tpl, dict):
            out = {}
            new = new or {}
            for k, v in tpl.items():
                if k in new:
                    out[k] = walk(v, new[k], path + (k,))
                else:
                    missing.append("/".join(path + (k,)))
                    out[k] = v
            for k in new:
                if k not in tpl:
                    unexpected.append("/".join(path + (k,)))
            return out
        if new is None:
            missing.append("/".join(path))
            return tpl
        new = np.asarray(new)
        if tuple(new.shape) != tuple(np.shape(tpl)):
            missing.append("/".join(path) + f" (shape {new.shape} vs {np.shape(tpl)})")
            return tpl
        return new.astype(np.asarray(tpl).dtype)

    return walk(template, loaded, ()), missing, unexpected


def load_train_checkpoint(cfg, state, dataset_len=-1):
    """Auto-resume / fine-tune logic (checkpoint.py:532-577). Returns
    (state, start_epoch, start_iter): start_iter > 0 only when resuming a
    mid-epoch (preemption) checkpoint — the loader must skip that many
    batches of fold-epoch ``start_epoch``."""
    if cfg.TRAIN.AUTO_RESUME and get_last_checkpoint(cfg):
        path = get_last_checkpoint(cfg)
        logger.info("Auto-resume from %s", path)
        payload = {"epoch": np.asarray(0, np.int32),
                   "step": np.asarray(state.step),
                   "variables": state.variables, "opt_state": state.opt_state}
        if "_iter_" in os.path.basename(path):
            payload["iter"] = np.asarray(0, np.int32)
            payload["loader_sig"] = np.zeros(5, np.int64)
        if state.ema_variables is not None:
            payload["ema_variables"] = state.ema_variables
        try:
            restored = load_checkpoint(path, payload)
        except Exception as orig:
            # One known-benign cause: MODEL.EMA toggled between save and
            # resume, so the template's tree structure no longer matches
            # the checkpoint's. Log the ORIGINAL error, retry once with the
            # EMA-flipped template, and if that also fails re-raise the
            # original (a genuinely corrupt/truncated checkpoint must not
            # hide behind a misleading second template error).
            logger.warning(
                "Restore of %s with the configured template failed (%s: "
                "%s); retrying with the EMA-flipped template in case "
                "MODEL.EMA was toggled since the save.",
                path, type(orig).__name__, orig)
            alt = dict(payload)
            try:
                if "ema_variables" in alt:
                    del alt["ema_variables"]
                    restored = load_checkpoint(path, alt)
                    # EMA (re)starts from the restored weights, like a
                    # fresh EMA init would
                    restored["ema_variables"] = restored["variables"]
                    logger.warning(
                        "Checkpoint %s has no EMA state but EMA is enabled; "
                        "EMA restarts from the restored weights.", path)
                else:
                    alt["ema_variables"] = state.variables
                    restored = load_checkpoint(path, alt)
                    restored.pop("ema_variables", None)
                    logger.warning(
                        "Checkpoint %s carries EMA state but EMA is "
                        "disabled; dropping it.", path)
            except Exception:
                logger.error(
                    "EMA-flipped retry of %s also failed; the checkpoint "
                    "is likely corrupt or structurally incompatible — "
                    "re-raising the original error.", path)
                raise orig
        state = state.replace(
            step=restored["step"], variables=restored["variables"],
            opt_state=restored["opt_state"],
            ema_variables=restored.get("ema_variables", state.ema_variables))
        start_iter = int(restored.get("iter", 0))
        if start_iter:
            saved_sig = np.asarray(restored["loader_sig"])
            want_sig = _loader_signature(cfg, dataset_len)
            if not np.array_equal(saved_sig, want_sig):
                # the recorded iter indexes a DIFFERENT batch stream now —
                # silently skipping would drop/replay the wrong samples (or
                # an entire epoch when the skip exceeds the shorter stream).
                # Replaying the fold-epoch from iter 0 only repeats the
                # prefix, which is benign.
                logger.warning(
                    "Mid-epoch resume: loader geometry changed since the "
                    "preemption save ([seed, local_batch, hosts, folds] "
                    "%s -> %s); restarting fold-epoch %d from iter 0 "
                    "instead of skipping %d batches.",
                    saved_sig.tolist(), want_sig.tolist(),
                    int(restored["epoch"]), start_iter)
                start_iter = 0
        return state, int(restored["epoch"]), start_iter
    ckpt = cfg.TRAIN.CHECKPOINT_FILE_PATH
    if ckpt:
        assert cfg.TRAIN.CHECKPOINT_TYPE != "caffe2", (
            "caffe2 checkpoints are not supported (the reference's caffe2 "
            "loader targets Detectron pkls no DiST/TAda/HiCo config uses); "
            "set TRAIN.CHECKPOINT_TYPE to 'pytorch' or load an Orbax dir")
        if _is_torch_ckpt(ckpt) or cfg.TRAIN.CHECKPOINT_TYPE == "pytorch":
            variables = load_torch_variables(cfg, ckpt, state.variables)
            state = state.replace(variables=variables)
        else:
            restored = load_checkpoint(ckpt)
            loaded = preprocess_loaded(
                cfg, restored.get("variables", restored), state.variables)
            merged, m, u = merge_into_template(state.variables, loaded)
            state = state.replace(variables=merged)
        logger.info("Fine-tune init from %s (epoch reset)", ckpt)
    return state, 0, 0


def load_test_checkpoint(cfg, state):
    """Priority TEST.ckpt > last > TRAIN.ckpt (checkpoint.py:452-529)."""
    for path in (cfg.TEST.CHECKPOINT_FILE_PATH, get_last_checkpoint(cfg),
                 cfg.TRAIN.CHECKPOINT_FILE_PATH):
        if not path:
            continue
        if _is_torch_ckpt(path):
            try:
                variables = load_torch_variables(cfg, path, state.variables)
            except Exception as e:
                # keep the documented priority chain: a corrupt/mismatched
                # .pyth falls through to the next candidate like the orbax
                # branch does
                logger.warning("could not load torch checkpoint %s (%s)",
                               path, e)
                continue
            return state.replace(variables=variables)
        try:
            # template-free restore: test states carry no opt_state, so the
            # saved tree is read raw and only the variables are merged
            restored = load_checkpoint(path)
        except Exception as e:
            logger.warning("could not restore %s (%s)", path, e)
            continue
        merged, missing, unexpected = merge_into_template(
            state.variables, restored.get("variables", restored))
        if missing:
            logger.info("Keys in model not matched: %s", missing[:20])
        logger.info("Loaded test checkpoint %s", path)
        return state.replace(variables=merged)
    logger.warning("Testing with random initialization (no checkpoint found). "
                   "Only knowing the structure of the model.")
    return state
