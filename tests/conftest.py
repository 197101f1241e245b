"""Test harness: run everything on a virtual 8-device CPU mesh so multi-chip
sharding is exercised without TPU hardware (the JAX-native analog of a fake
backend; see SURVEY.md section 4)."""

import os

# force CPU even when the env points at a TPU tunnel (JAX_PLATFORMS=axon);
# the axon site hook overrides the env var, so use jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
import re as _re
flags = os.environ.get("XLA_FLAGS", "")
# normalize to EXACTLY 8 devices: an inherited device_count flag from
# another project would otherwise silently shrink the mesh and break every
# device-count-dependent test with confusing sharding errors
flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def repo_root():
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
