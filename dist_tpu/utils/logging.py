"""Process-0-only logging with per-task log files and JSON stat lines.

Mirrors the reference's utils/logging.py:21-88: on a multi-host TPU pod the
controller with ``jax.process_index() == 0`` logs to stdout + file; other
hosts stay quiet.
"""

import builtins
import decimal
import functools
import logging
import os
import sys

import simplejson

_FORMAT = "[%(asctime)s][%(levelname)s] %(filename)s: %(lineno)3d: %(message)s"


def _is_master():
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def _suppress_print():
    def ignore(*args, **kwargs):
        pass
    builtins.print = ignore


@functools.lru_cache(maxsize=None)
def _cached_log_stream(filename):
    return open(filename, "a")


def setup_logging(cfg, log_name="log"):
    """Configure root logging: master logs to stdout + OUTPUT_DIR/<name>,
    non-masters are silenced (reference utils/logging.py:32-63)."""
    logger = logging.getLogger()
    logger.setLevel(logging.INFO)
    logger.propagate = False
    for h in list(logger.handlers):
        logger.removeHandler(h)

    if not _is_master():
        _suppress_print()
        logger.addHandler(logging.NullHandler())
        return

    formatter = logging.Formatter(_FORMAT, datefmt="%m/%d %H:%M:%S")
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setFormatter(formatter)
    logger.addHandler(ch)

    out_dir = cfg.OUTPUT_DIR if hasattr(cfg, "OUTPUT_DIR") else None
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        fh = logging.StreamHandler(_cached_log_stream(os.path.join(out_dir, log_name)))
        fh.setFormatter(formatter)
        logger.addHandler(fh)


def get_logger(name):
    return logging.getLogger(name)


def log_json_stats(stats):
    """One-line JSON stats record (reference utils/logging.py:76-88)."""
    stats = {
        k: decimal.Decimal(f"{v:.6f}") if isinstance(v, float) else v
        for k, v in stats.items()
    }
    json_stats = simplejson.dumps(stats, sort_keys=True, use_decimal=True)
    get_logger(__name__).info("json_stats: {:s}".format(json_stats))
