"""Multi-view test task (reference runs/test.py:24-322).

Per clip-view forward -> softmax scores; the TestMeter regroups views by
``dataset index // num_clips`` and score-sums them per video
(utils/meters.py:94-114). Cross-host: each JAX process evaluates its index
shard and the small (preds, labels, ids) triples are all-gathered host-side
(replacing the reference's NCCL all_gather, runs/test.py:131-141).
"""

import jax
import jax.numpy as jnp
import numpy as np

from dist_tpu.data.builder import build_loader
from dist_tpu.models.base.models import build_model
from dist_tpu.parallel.mesh import build_mesh, shard_batch, shard_params
from dist_tpu.tasks.state import TrainState, make_eval_step
from dist_tpu.utils import checkpoint as cu
from dist_tpu.utils import logging, misc
from dist_tpu.utils.meters import TestMeter

logger = logging.get_logger(__name__)


def _init_test_state(cfg, model, sample_batch):
    from dist_tpu.tasks.state import init_variables
    variables = init_variables(cfg, model, sample_batch["video"].shape[1:])
    return TrainState(step=jnp.zeros((), jnp.int32), variables=variables,
                      opt_state=(), ema_variables=None)


def test(cfg):
    """(reference runs/test.py:181-322)"""
    np.random.seed(int(cfg.RANDOM_SEED))
    logging.setup_logging(cfg, cfg.TEST.LOG_FILE)

    mesh = build_mesh(cfg)
    model = build_model(cfg)
    loader = build_loader(cfg, "test")
    dataset = loader.dataset

    num_views = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    assert len(dataset) % num_views == 0, (
        f"dataset size {len(dataset)} not divisible by views {num_views}")
    num_videos = len(dataset) // num_views
    nc = cfg.VIDEO.HEAD.NUM_CLASSES
    if isinstance(nc, (list, tuple)):
        # EPIC verb/noun joint evaluation (reference runs/test.py:229-248)
        from dist_tpu.utils.meters import EpicKitchenMeter
        meter = EpicKitchenMeter(num_videos, num_views, tuple(nc), cfg,
                                 ensemble_method=cfg.DATA.ENSEMBLE_METHOD)
    else:
        meter = TestMeter(num_videos, num_views, int(nc), cfg,
                          ensemble_method=cfg.DATA.ENSEMBLE_METHOD)

    first_batch = next(iter(loader))
    state = _init_test_state(cfg, model, first_batch)
    state = cu.load_test_checkpoint(cfg, state)
    if cfg.LOG_MODEL_INFO:
        misc.log_model_info(state.variables)

    from dist_tpu.tasks.state import compute_text_features
    text_features = compute_text_features(
        model, state.variables, getattr(dataset, "text_tokens", None), mesh)

    from dist_tpu.utils.visualization import maybe_dump_first_batch
    if maybe_dump_first_batch(
            cfg, model, state.variables,
            {"video": first_batch["video"], "text_features": text_features}):
        # feature-map artifacts dumped for the first batch (the functional
        # analog of the reference's per-module forward hooks,
        # base_blocks.py:36-61 gated on cfg.VISUALIZATION.*)
        logger.info("VISUALIZATION.FEATURE_MAPS written for batch 0")

    try:
        with mesh:
            state = shard_params(mesh, state,
                                 fsdp=bool(cfg.TPU.get("FSDP", False)))
            eval_step = jax.jit(make_eval_step(model, cfg))
            perform_test(cfg, mesh, state, eval_step, loader, meter,
                         text_features)
    finally:
        loader.close()  # don't leak process-pool workers into the run list

    results = meter.finalize_metrics()
    _save_epic_preds(cfg, meter)
    return results


def _save_epic_preds(cfg, meter):
    """Persist the ensembled per-video verb/noun scores for EPIC-KITCHENS
    (reference runs/test.py:153-160 saves ``<log>_verb.pyth`` /
    ``<log>_noun.pyth``); ``.npz`` here. Gated on ``DATA.MULTI_LABEL``, the
    reference's flag for dict-pred datasets."""
    import os
    if "epickitchen" not in str(cfg.TEST.DATASET).lower():
        return
    if not (cfg.DATA.get("MULTI_LABEL") or not cfg.DATA.get("TRAIN_VERSION")):
        return
    if not isinstance(getattr(meter, "video_preds", None), dict):
        return
    stem = os.path.join(cfg.OUTPUT_DIR, cfg.TEST.LOG_FILE.split(".")[0])
    for key, suffix in (("verb_class", "_verb"), ("noun_class", "_noun")):
        np.savez(stem + suffix + ".npz", preds=meter.video_preds[key],
                 labels=meter.video_labels[key])
    logger.info("Saved EPIC verb/noun prediction scores to %s_{verb,noun}.npz",
                stem)


def perform_test(cfg, mesh, state, eval_step, loader, meter, text_features):
    """(reference runs/test.py:24-178)

    Lag-1 pipelined: batch k's predictions are fetched to the host while
    batch k+1 computes on device, so meter bookkeeping and the device
    forward overlap (same pattern as the train loop's metric readback)."""
    # frame-axis sharding: single/small-batch multi-chip inference — the
    # frozen tower is frame-parallel, so latency scales with the mesh even
    # at batch 1 (TPU.SHARD_FRAMES; see parallel/mesh.py::frame_sharding)
    shard_frames = bool(cfg.get("TPU") and cfg.TPU.get("SHARD_FRAMES"))
    pending = None
    for cur_iter, batch in enumerate(loader):
        device_batch = shard_batch(mesh, {
            "video": batch["video"], "labels": batch["label"]},
            shard_frames=shard_frames)
        if text_features is not None:
            device_batch["text_features"] = text_features
        metrics = eval_step(state, device_batch)
        if pending is not None:
            _consume_test_batch(cfg, meter, *pending)
        pending = (metrics, batch, cur_iter)
    if pending is not None:
        _consume_test_batch(cfg, meter, *pending)
    return meter


def _consume_test_batch(cfg, meter, metrics, batch, cur_iter):
    # each host evaluates its own index shard; the meter needs all of them
    # (replaces the reference's NCCL all_gather, runs/test.py:131-141;
    # all_gather_arrays is the identity under a single process).
    # local_rows: this host's shard of the data-sharded preds — the rows
    # matching batch["index"] (device_get would raise across hosts)
    from dist_tpu.parallel.collectives import (
        all_gather_arrays, local_rows_tree)

    preds = local_rows_tree(metrics["preds"])
    (ids,) = all_gather_arrays(batch["index"])
    if isinstance(preds, dict):
        # EPIC dual-head: labels arrive as separate verb/noun columns
        preds = dict(zip(preds, all_gather_arrays(
            *(np.asarray(v) for v in preds.values()))))
        labels = {"verb_class": batch.get("label_verb", batch["label"]),
                  "noun_class": batch.get("label_noun", batch["label"])}
        labels = dict(zip(labels, all_gather_arrays(*labels.values())))
        meter.update_stats(preds, labels, ids)
        return
    preds, labels = all_gather_arrays(np.asarray(preds), batch["label"])
    meter.update_stats(preds, labels, ids)
    if (cur_iter + 1) % cfg.LOG_PERIOD == 0:
        logger.info("test iter %d done", cur_iter + 1)
