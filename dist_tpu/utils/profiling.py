"""Profiling & tracing utilities (SURVEY section 5.1).

The reference had only wall-clock meters + nvidia-smi shell-outs
(utils/misc.py:44-66,165, utils/timer.py). The TPU build exposes:

- :func:`trace` — a context manager around ``jax.profiler`` trace capture
  (produces a Perfetto/XPlane trace under OUTPUT_DIR),
- :func:`step_timer` — sync-bracketed step timing that forces a small
  device->host transfer (``block_until_ready`` alone does not synchronize
  through remote-tunnel backends),
- :func:`device_memory_stats` — HBM usage per device,
- FLOPs via XLA cost analysis lives in ``dist_tpu.utils.misc.flops_count``.
"""

import contextlib
import time

import jax
import numpy as np

from dist_tpu.utils import logging

logger = logging.get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device trace: ``with trace(dir): run_steps()``."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
        logger.info("Profiler trace started -> %s", log_dir)
    except Exception as e:
        logger.warning("profiler unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
            logger.info("Profiler trace written to %s", log_dir)


def sync(tree):
    """Synchronize with device completion reliably (forces a tiny
    device->host read; see bench.py for why block_until_ready is not
    enough through tunneled backends)."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(jax.device_get(leaf.ravel()[:1] if hasattr(leaf, "ravel")
                                     else leaf))


@contextlib.contextmanager
def step_timer(name="step", result=None):
    """Time a block with device sync at exit; appends seconds to
    ``result`` (a list) when provided."""
    t0 = time.perf_counter()
    box = {}
    yield box
    if "output" in box:
        sync(box["output"])
    dt = time.perf_counter() - t0
    if result is not None:
        result.append(dt)
    logger.info("%s: %.2f ms", name, dt * 1e3)


def device_memory_stats():
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
