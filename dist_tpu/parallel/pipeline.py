"""GPipe-style pipeline parallelism for scanned transformer stacks.

The reference has no pipeline parallelism (its largest tower, CLIP
ViT-L/14, fits one V100); on TPU pods a ``pipe`` mesh axis lets towers
larger than one chip's HBM — or meshes wider than the batch — run with the
layer dimension sharded across devices. This module implements the
schedule as a pure-JAX primitive over the same stacked per-layer params
that ``nn.scan`` creates (``models/clip/model.py::transformer_stack``), so
the pipelined forward is numerically identical to the scanned one and
checkpoints are interchangeable.

Design (the standard TPU formulation, cf. the public scaling-book recipe):

- the stacked params' LAYER axis is sharded over the ``pipe`` mesh axis —
  each device holds ``L/S`` contiguous layers (one stage),
- the batch is split into ``M`` microbatches; at tick ``t`` stage ``s``
  runs its layers on microbatch ``t - s`` and hands the activation to
  stage ``s+1`` with a ring ``ppermute``,
- ``M + S - 1`` ticks drain the pipe (bubble fraction ``(S-1)/(M+S-1)``),
- per-layer taps (the DiST ladder's inputs) are COMPUTED stage-locally
  (each stage fills only its own ``L/S`` slices) but returned REPLICATED:
  the stages' disjoint chunks are assembled with one taps-sized psum, so
  peak tap memory matches the sequential scan (see the in-code note on
  the XLA partial-manual bug that rules out the sharded out_spec).

``shard_map`` runs FULL-manual over the mesh: the microbatch rows are
explicitly data-sharded (dp x pp composes as row-parallelism inside every
microbatch). Partial-manual mode (auto ``data`` axis via ``axis_names``)
would be more elegant but miscompiles in this XLA version ('Invalid
binary instruction opcode copy') once downstream ops consume the taps.
The whole schedule is built from ``lax.scan`` + ``ppermute`` and is
reverse-differentiable (ppermute transposes to the reverse ring), so the
same primitive serves training.

Tensor parallelism is NOT composed with pp (the block body under manual
shard_map does not see GSPMD param shardings): ``build_mesh`` asserts
``model == 1`` when ``pipe > 1``.
"""

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from dist_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS


def current_mesh():
    """The ``with mesh:`` context's physical mesh, or None outside one.

    jax exposes no public accessor for the context mesh, so this reads the
    private ``thread_resources`` (guarded: a jax upgrade that moves it
    degrades to the abstract-mesh fallback / a clear None, not a crash at
    trace time)."""
    try:
        from jax._src import mesh as mesh_lib

        m = mesh_lib.thread_resources.env.physical_mesh
        if m.devices.size:
            return m
    except Exception:
        pass
    try:  # jax.sharding.use_mesh contexts surface here instead
        m = jax.sharding.get_abstract_mesh()
        if m is not None and m.shape:
            return m
    except Exception:
        pass
    return None


def pipeline_stages(mesh=None):
    """Size of the pipe axis of ``mesh`` (or the context mesh); 1 if none."""
    mesh = mesh if mesh is not None else current_mesh()
    if mesh is None:
        return 1
    return int(mesh.shape.get(PIPE_AXIS, 1))


def pipeline_stack(body, stacked_params, x, *, mesh, n_microbatches=0,
                   collect_taps=True):
    """Run ``x`` through ``L`` stacked layers, pipelined over the mesh's
    ``pipe`` axis.

    body: ``(params_of_one_layer, x) -> y`` with ``y.shape == x.shape``
      (a pure function, e.g. a flax block's ``apply``).
    stacked_params: pytree whose leaves lead with the layer axis ``(L, ...)``
      — exactly what ``nn.scan(variable_axes={"params": 0})`` creates.
    x: ``(N, ...)`` batch-major activations.
    n_microbatches: ``M`` (0 = one per stage). More microbatches shrink the
      pipeline bubble: efficiency = ``M / (M + S - 1)``.

    Returns ``(y, taps)`` matching the sequential scan bit-for-bit in
    structure: ``y (N, ...)`` and ``taps (L, N, ...)`` (or None), both
    replicated over the pipe axis.
    """
    stages = pipeline_stages(mesh)
    leaves = jax.tree_util.tree_leaves(stacked_params)
    n_layers = leaves[0].shape[0]
    assert n_layers % stages == 0, (
        f"{n_layers} layers not divisible by pipe={stages}")
    n = x.shape[0]
    # the shard_map is FULL-manual over the mesh (partial-manual mode —
    # auto data axis — miscompiles in XLA: 'Invalid binary instruction
    # opcode copy'), so every microbatch's rows are explicitly
    # data-sharded: M must divide n/dp. Clamp the requested M to the
    # largest compatible value — small per-shard eval batches would
    # otherwise hard-fail on a knob that only tunes the bubble.
    dp = int(mesh.shape.get(DATA_AXIS, 1))
    assert n % dp == 0, (
        f"batch rows {n} not divisible by the data axis ({dp})")
    m_req = int(n_microbatches) or stages
    m_micro = max(m for m in range(1, min(m_req, n // dp) + 1)
                  if (n // dp) % m == 0)
    if m_micro < m_req:
        # the silent case is a real throughput cliff: m_micro=1 serializes
        # the stages entirely (bubble (S-1)/S) while the knob looks honored
        from dist_tpu.utils.logging import get_logger
        get_logger(__name__).warning(
            "pipeline: clamped microbatches %d -> %d (per-data-shard rows "
            "%d admit no larger divisor); bubble fraction %.0f%% — raise "
            "the batch or lower TPU.PIPE_MICROBATCHES",
            m_req, m_micro, n // dp,
            100.0 * (stages - 1) / (m_micro + stages - 1))
    mb = n // m_micro
    xm = x.reshape((m_micro, mb) + x.shape[1:])
    ring = [(i, (i + 1) % stages) for i in range(stages)]

    def staged(params_local, xm):
        s = lax.axis_index(PIPE_AXIS)

        def apply_local(c):
            def layer(c, p):
                y = body(p, c)
                return y, (y if collect_taps else None)

            return lax.scan(layer, c, params_local)

        def tick(carry, t):
            cur, out, taps_buf = carry
            # stage 0 injects microbatch t while any remain
            src = lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, m_micro - 1), 0, keepdims=False)
            cur = jnp.where((s == 0) & (t < m_micro), src, cur)
            y, taps_t = apply_local(cur)
            # stage s finished microbatch t - s this tick
            mb_idx = t - s
            mi = jnp.clip(mb_idx, 0, m_micro - 1)
            valid = (mb_idx >= 0) & (mb_idx < m_micro)

            def put(buf, val):
                old = lax.dynamic_index_in_dim(buf, mi, 0, keepdims=False)
                return lax.dynamic_update_index_in_dim(
                    buf, jnp.where(valid, val, old), mi, 0)

            out = put(out, y)
            if collect_taps:
                taps_buf = put(taps_buf, taps_t)
            cur = lax.ppermute(y, PIPE_AXIS, ring)
            return (cur, out, taps_buf), None

        # zv: a pipe-VARYING zero, and xm*0: a data-varying zero — the scan
        # carry must enter with the same varying-axis type it exits with
        # (the buffers become pipe- and data-varying the moment
        # stage-dependent activations are written into them)
        zv = jnp.zeros_like(s, xm.dtype)
        xz = xm * 0
        taps0 = (jnp.zeros((m_micro, n_layers // stages) + xm.shape[1:],
                           xm.dtype) + zv + xz[:, None]
                 if collect_taps else zv)
        carry0 = (xz[0] + zv, xz + zv, taps0)
        (cur, out, taps_buf), _ = lax.scan(
            tick, carry0, jnp.arange(m_micro + stages - 1))
        # only the LAST stage's buffer holds final-layer outputs; the masked
        # psum both selects it and replicates it over the pipe axis
        out = lax.psum(out * (s == stages - 1).astype(out.dtype), PIPE_AXIS)
        if not collect_taps:
            return out
        # assemble the full (M, L, mb, ...) tap stack: each stage scatters
        # its disjoint layer chunk at offset s*L/S and the psum concatenates.
        # (Replicated output — NOT a P(None, 'pipe') sharded out_spec: that
        # leaves the layer axis sharded, and downstream gathers over it hit
        # an XLA partial-manual lowering bug, 'Invalid binary instruction
        # opcode copy'. The psum costs one taps-sized all-reduce, matching
        # what the sequential scan materializes anyway.)
        full = (jnp.zeros((m_micro, n_layers) + xm.shape[1:], xm.dtype)
                + zv + xz[:, None])
        start = (jnp.zeros((), jnp.int32), s * (n_layers // stages)) + \
            (jnp.zeros((), jnp.int32),) * (full.ndim - 2)
        full = lax.dynamic_update_slice(full, taps_buf, start)
        return out, lax.psum(full, PIPE_AXIS)

    x_spec = P(None, DATA_AXIS)
    taps_spec = P(None, None, DATA_AXIS)
    fn = jax.shard_map(
        staged, mesh=mesh,
        in_specs=(P(PIPE_AXIS), x_spec),
        out_specs=(x_spec, taps_spec) if collect_taps else x_spec)
    if not collect_taps:
        y = fn(stacked_params, xm).reshape((n,) + x.shape[1:])
        return y, None
    out, taps = fn(stacked_params, xm)
    y = out.reshape((n,) + x.shape[1:])
    taps = jnp.moveaxis(taps, 1, 0).reshape((n_layers, n) + x.shape[1:])
    return y, taps
