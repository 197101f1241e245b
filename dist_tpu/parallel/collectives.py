"""Cross-host exchange helpers (reference utils/distributed.py).

Inside jitted code there are no explicit collectives to call — metrics and
gradients computed on globally-sharded arrays get their psums/all-gathers
from XLA. What remains is the HOST side: gathering small per-host numpy
results (the analog of the reference's pickled gloo ``all_gather_unaligned``,
utils/distributed.py:145-259) and broadcasting host-side decisions.
"""

import numpy as np

import jax

from dist_tpu.utils import logging

logger = logging.get_logger(__name__)


def is_master_proc():
    """(reference utils/distributed.py:98-105)"""
    return jax.process_index() == 0


def get_world_size():
    return jax.process_count()


def get_rank():
    return jax.process_index()


def local_rows(x):
    """This process's rows of a batch-sharded global ``jax.Array`` as host
    numpy, in row order.

    ``jax.device_get`` on an array with non-addressable shards raises on
    multi-host; the local rows are exactly what the per-host meters gather
    (they correspond 1:1 with this host's loader indices). Replicated
    arrays and single-process runs return the full array. Assumes only the
    leading axis is sharded (the batch contract of ``shard_batch``)."""
    if not hasattr(x, "addressable_shards") or jax.process_count() == 1:
        return np.asarray(jax.device_get(x))
    if getattr(x, "is_fully_replicated", False):
        return np.asarray(jax.device_get(x))
    seen = {}
    for s in x.addressable_shards:
        # batch contract: ONLY axis 0 is sharded — a shard split on a
        # trailing axis (e.g. XLA choosing P('data','model') for an eval
        # output) would otherwise be silently truncated to one column block
        assert all(sl.start in (None, 0) and sl.stop in (None, x.shape[i + 1])
                   for i, sl in enumerate(s.index[1:])), (
            f"local_rows expects leading-axis sharding only, got {s.index}")
        start = s.index[0].start or 0
        if start not in seen:
            seen[start] = np.asarray(s.data)
    return np.concatenate([seen[k] for k in sorted(seen)], axis=0)


def local_rows_tree(preds):
    """local_rows over an array or a dict of arrays (the eval step's
    prediction contract)."""
    if isinstance(preds, dict):
        return {k: local_rows(v) for k, v in preds.items()}
    return local_rows(preds)


def all_gather_arrays(*arrays):
    """Gather per-host numpy arrays to every host (reference
    ``du.all_gather``, utils/distributed.py:19-38). Single-process: identity."""
    if jax.process_count() == 1:
        return list(arrays)
    from jax.experimental import multihost_utils
    out = []
    for a in arrays:
        gathered = multihost_utils.process_allgather(np.asarray(a), tiled=False)
        out.append(np.concatenate(list(gathered), axis=0))
    return out


def all_reduce_mean(*scalars):
    """Mean-reduce host scalars across processes (reference
    ``du.all_reduce`` with average, utils/distributed.py:41-57)."""
    if jax.process_count() == 1:
        return [float(s) for s in scalars]
    from jax.experimental import multihost_utils
    vals = np.asarray([float(s) for s in scalars], np.float64)
    gathered = multihost_utils.process_allgather(vals, tiled=False)
    return list(np.mean(np.stack(list(gathered)), axis=0))


def any_flag(flag):
    """Cross-host OR of a per-host boolean (every process must call in).
    Used to AGREE on a host-side event before acting on it collectively —
    e.g. the preemption stop boundary: hosts receive SIGTERM at slightly
    different times, and acting on the local flag alone would have hosts
    exit the step loop at different iterations (mismatched collectives,
    divergent checkpoint names)."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        np.asarray([1.0 if flag else 0.0], np.float32), tiled=False)
    return bool(np.max(gathered) > 0)


def broadcast_from_master(value):
    """Broadcast a small host value from process 0 (the analog of the
    reference's gloo object broadcast)."""
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(value)


def synchronize():
    """Barrier across hosts (reference utils/distributed.py:130-142)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("dist_tpu_sync")
