"""Device mesh construction + sharding helpers.

Replaces the reference's process/NCCL runtime (``utils/launcher.py``,
``utils/distributed.py``) with single-controller JAX:

- one process per host, all devices in a ``jax.sharding.Mesh`` with a
  ``data`` axis (and an optional ``model`` axis for tensor sharding),
- gradients/metrics reduce over ICI via the collectives XLA inserts for
  pjit-sharded computation — there is no user-visible backend, and the
  reference's ``NUM_GPUS / NUM_SHARDS / DIST_BACKEND / init_method`` keys
  collapse into the mesh shape (``TPU.MESH``).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def build_mesh(cfg=None, devices=None) -> Mesh:
    """Mesh from config: TPU.MESH.DATA (-1 = all remaining) x TPU.MESH.MODEL."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = 1
    if cfg is not None and cfg.get("TPU") and cfg.TPU.get("MESH"):
        model = int(cfg.TPU.MESH.get("MODEL", 1) or 1)
    assert n % model == 0, f"{n} devices not divisible by model={model}"
    data = n // model
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded on the leading axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch):
    """Place a host batch pytree with the leading axis sharded over data."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s) if hasattr(x, "ndim") and x.ndim > 0
        else x, batch)


def replicate(mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def local_batch_size(cfg, mesh=None):
    """Per-device batch size from the per-GPU-style config batch
    (TRAIN.BATCH_SIZE is per-device in the reference, dataset/base/builder.py)."""
    return int(cfg.TRAIN.BATCH_SIZE)


def is_master():
    return jax.process_index() == 0
