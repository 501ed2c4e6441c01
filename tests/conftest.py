"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding logic is validated on
``--xla_force_host_platform_device_count=8`` CPU devices (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__).

Note: the environment's sitecustomize force-registers the axon TPU
backend in every process *before* conftest runs, so ``JAX_PLATFORMS=cpu``
is ineffective.  Instead we set the XLA host-device-count flag before the
CPU client is (lazily) created and route all default placement to CPU via
``jax_default_device``.  Tests that build meshes must use
``jax.devices("cpu")``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gslam_jax_cache")

import jax  # noqa: E402

# the on-hardware tier (pytest -m tpu, GSLAM_TEST_ALLOW_TPU=1) must NOT
# pin default placement to the CPU client — that is the whole point
if not os.environ.get("GSLAM_TEST_ALLOW_TPU"):
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_threefry_partitionable", True)
# XLA-CPU compiles are slow on this small host; cache everything across runs.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def cpu_devices(n: int = 8):
    return jax.devices("cpu")[:n]


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
