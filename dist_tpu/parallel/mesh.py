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
PIPE_AXIS = "pipe"
MODEL_AXIS = "model"


def _mesh_shape_cfg(cfg):
    """(data, pipe, model) from TPU.MESH; data -1/None = all remaining."""
    model, pipe, data = 1, 1, -1
    if cfg is not None and cfg.get("TPU") and cfg.TPU.get("MESH"):
        model = int(cfg.TPU.MESH.get("MODEL", 1) or 1)
        pipe = int(cfg.TPU.MESH.get("PIPE", 1) or 1)
        data = int(cfg.TPU.MESH.get("DATA", -1) or -1)
    return data, pipe, model


def config_data_axis_size(cfg, n_devices=None):
    """Size of the data mesh axis implied by the config (the global-batch
    multiplier: global batch = TRAIN.BATCH_SIZE x this)."""
    n = n_devices if n_devices is not None else jax.device_count()
    data, pipe, model = _mesh_shape_cfg(cfg)
    return data if data > 0 else max(n // (model * pipe), 1)


def build_mesh(cfg=None, devices=None) -> Mesh:
    """Mesh from config: TPU.MESH.DATA (-1 = all remaining) x
    TPU.MESH.PIPE x TPU.MESH.MODEL."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data, pipe, model = _mesh_shape_cfg(cfg)
    assert not (pipe > 1 and model > 1), (
        "pipe x tensor parallelism is not composed (the pipeline body runs "
        "under manual shard_map, outside GSPMD's tp propagation); pick one")
    assert n % (model * pipe) == 0, (
        f"{n} devices not divisible by pipe={pipe} x model={model}")
    if data > 0:
        # an explicit data size must tile the device count exactly — a
        # mismatched {data, pipe, model} tuple is a config error, not a hint
        assert data * pipe * model == n, (
            f"TPU.MESH data={data} x pipe={pipe} x model={model} != {n} "
            "devices; set DATA to -1 to use all remaining devices")
    else:
        data = n // (model * pipe)
    dev_array = np.asarray(devices).reshape(data, pipe, model)
    return Mesh(dev_array, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: sharded on the leading axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Video tensors sharded on the FRAME axis (B, T, ...) over data.

    The frozen tower treats frames independently (SURVEY section 5.7), so a
    single long video can spread over the whole mesh — the multi-chip
    low-latency serving path for batch sizes below the device count
    (``TPU.SHARD_FRAMES``)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_batch(mesh, batch, shard_frames=False):
    """Place a host batch pytree with the leading axis sharded over data.

    Single-process: a straight ``device_put``. Multi-process: each host's
    batch is its own disjoint shard of the global batch (the loader hands
    out per-host index shards), so the global array must be ASSEMBLED from
    process-local data — ``jax.device_put`` under a cross-process sharding
    would instead interpret each host's local batch as the (identical)
    global value and silently drop (P-1)/P of every host's samples.

    ``shard_frames``: shard the video's frame axis instead (small-batch
    inference); non-video per-sample tensors are replicated since the
    batch axis no longer matches the data axis."""
    if shard_frames:
        assert jax.process_count() == 1, (
            "TPU.SHARD_FRAMES is a single-host serving path (each process "
            "loads different samples, so a cross-host frame sharding would "
            "mix distinct videos); use plain data sharding on pods")
        fs, rep = frame_sharding(mesh), replicated(mesh)
        return {
            k: jax.device_put(
                v, fs if (hasattr(v, "ndim") and v.ndim >= 5) else rep)
            if hasattr(v, "ndim") else v
            for k, v in batch.items()
        }
    s = batch_sharding(mesh)
    if jax.process_count() > 1:
        def place(x):
            if not (hasattr(x, "ndim") and x.ndim > 0):
                return x
            return jax.make_array_from_process_local_data(s, np.asarray(x))
        return jax.tree_util.tree_map(place, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, s) if hasattr(x, "ndim") and x.ndim > 0
        else x, batch)


def replicate(mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def _tp_spec_for(path_str, ndim):
    """Tensor-parallel PartitionSpec for transformer params (Megatron-style
    column/row split over the ``model`` axis):

    - qkv / mlp up-projection kernels: shard the OUTPUT dim (column),
    - out-proj / mlp down-projection kernels: shard the INPUT dim (row),
    - everything else: replicated.

    XLA inserts the psum for the row-parallel matmuls automatically when the
    jitted step consumes these shardings.
    """
    col = ("attn/in_proj_weight", "mlp/c_fc/kernel", "ffn/c_fc/kernel")
    row = ("attn/out_proj/kernel", "mlp/c_proj/kernel", "ffn/c_proj/kernel")
    if any(path_str.endswith(s) for s in col):
        spec = [None] * ndim
        spec[-1] = MODEL_AXIS
        return P(*spec)
    if any(path_str.endswith(s) for s in row):
        spec = [None] * ndim
        spec[-2] = MODEL_AXIS
        return P(*spec)
    return P()


# leaves smaller than this stay replicated under FSDP: sharding a LayerNorm
# vector saves nothing and costs an all-gather dispatch
_FSDP_MIN_SIZE = 8192


def _fsdp_axis(shape, spec, dp):
    """Largest dim divisible by the data-axis size and not already
    tensor-sharded; None if nothing qualifies."""
    best = None
    for ax, d in enumerate(shape):
        if spec[ax] is None and d % dp == 0 and d >= dp:
            if best is None or d > shape[best]:
                best = ax
    return best


def shard_params(mesh, tree, fsdp=False):
    """Place a variables/state tree on the mesh.

    - tensor parallel (model axis > 1): Megatron column/row specs,
    - pipeline (pipe axis > 1): the pipelined tower's stacked per-layer
      params shard on their LAYER axis over ``pipe`` — the same placement
      ``parallel/pipeline.py``'s shard_map consumes, so each stage stores
      only its own L/S layers (no per-step reshard, 1/S of tower HBM),
    - ``fsdp``: ZeRO-3-style — every large leaf is additionally sharded
      over the DATA axis on its largest free dim. XLA all-gathers params
      at use and reduce-scatters gradients (GSPMD inserts both), so
      params + optimizer moments take 1/dp of HBM per chip; the optimizer
      update itself runs sharded (optax transforms are elementwise).
      Reference counterpart: none (DDP replicates); this is the TPU-native
      scaling lever for models whose state exceeds one chip.
    """
    tp = mesh.shape.get(MODEL_AXIS, 1) > 1
    dp = mesh.shape.get(DATA_AXIS, 1)
    pipe = mesh.shape.get(PIPE_AXIS, 1)
    if not tp and not (fsdp and dp > 1) and pipe == 1:
        return replicate(mesh, tree)

    tp_matched = [0]

    def place(path, leaf):
        if not hasattr(leaf, "ndim") or leaf.ndim == 0:
            return jax.device_put(leaf, replicated(mesh))
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        spec = [None] * leaf.ndim
        if (pipe > 1 and "visual/resblocks" in name
                and leaf.shape[0] % pipe == 0):
            spec[0] = PIPE_AXIS
        if tp:
            tspec = _tp_spec_for(name, leaf.ndim)
            # shard only if every tensor-split dim divides evenly; merge
            # onto the spec (a stacked pipe param keeps its layer axis)
            if any(s is not None for s in tspec) and all(
                    leaf.shape[ax] % mesh.shape[MODEL_AXIS] == 0
                    for ax, s in enumerate(tspec) if s is not None):
                for ax, s in enumerate(tspec):
                    if s is not None and spec[ax] is None:
                        spec[ax] = s
                tp_matched[0] += 1
        if fsdp and dp > 1 and leaf.size >= _FSDP_MIN_SIZE:
            ax = _fsdp_axis(leaf.shape, spec, dp)
            if ax is not None:
                spec[ax] = DATA_AXIS
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    placed = jax.tree_util.tree_map_with_path(place, tree)
    if tp and not tp_matched[0]:
        # _tp_spec_for matches the CLIP tower's param names; a non-CLIP
        # backbone under TPU.MESH.MODEL>1 would otherwise run with every
        # param replicated — the data axis shrunk model-fold for zero
        # tensor parallelism, a silent throughput cliff
        from dist_tpu.utils.logging import get_logger
        get_logger(__name__).warning(
            "TPU.MESH.MODEL=%d but NO parameter matched a tensor-parallel "
            "sharding rule (non-CLIP param naming?) — all params are "
            "replicated and the model axis buys nothing; set "
            "TPU.MESH.MODEL: 1 (or extend parallel/mesh.py::_tp_spec_for).",
            mesh.shape[MODEL_AXIS])
    return placed


def local_batch_size(cfg, mesh=None):
    """Per-device batch size from the per-GPU-style config batch
    (TRAIN.BATCH_SIZE is per-device in the reference, dataset/base/builder.py)."""
    return int(cfg.TRAIN.BATCH_SIZE)
