"""Misc helpers (reference utils/misc.py): NaN guard, eval cadence,
param/FLOP accounting via jit cost analysis."""

import math

import jax
import numpy as np

from dist_tpu.utils import logging

logger = logging.get_logger(__name__)


def enable_compile_cache():
    """Point JAX at the persistent compile cache (shared by the CLI entry
    and bench.py so repeated runs skip the minutes-long TPU recompiles)."""
    import os
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/dist_tpu_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:  # backend may not support the cache — run uncached
        pass


def check_nan_losses(loss):
    """Abort on NaN loss (utils/misc.py:25-32)."""
    if math.isnan(float(loss)):
        raise RuntimeError("ERROR: Got NaN losses")


def params_count(variables):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables))


def is_eval_epoch(cfg, cur_epoch):
    """Eval cadence with fold stride (utils/misc.py:168-180)."""
    period = int(cfg.TRAIN.EVAL_PERIOD)
    folds = int(cfg.TRAIN.get("NUM_FOLDS", 1))
    if period == 0:
        return False
    next_epoch = cur_epoch + folds
    return (next_epoch % period < folds) or (next_epoch >= cfg.OPTIMIZER.MAX_EPOCH)


def flops_count(fn, *args):
    """FLOPs of a jitted callable via XLA cost analysis (replaces fvcore,
    utils/misc.py:103-165)."""
    try:
        analysis = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        return float(analysis.get("flops", float("nan")))
    except Exception as e:  # cost analysis is best-effort on some backends
        logger.warning("cost_analysis failed: %s", e)
        return float("nan")


def log_model_info(variables):
    n = params_count(variables)
    logger.info("Params: {:,}".format(n))
    return n
