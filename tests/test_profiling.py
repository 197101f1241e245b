"""utils/profiling smoke: trace capture, sync-bracketed step timing,
memory stats (SURVEY section 5.1)."""

import jax.numpy as jnp

from dist_tpu.utils import profiling


def test_trace_context(tmp_path):
    with profiling.trace(str(tmp_path / "trace")):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    assert float(x[0, 0]) == 8.0


def test_step_timer_records_and_syncs():
    times = []
    with profiling.step_timer("t", result=times) as box:
        box["output"] = jnp.ones((4,)) * 2
    assert len(times) == 1 and times[0] >= 0.0


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert len(stats) >= 1  # one entry per device (value may be None)
