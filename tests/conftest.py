"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding logic is validated on
``--xla_force_host_platform_device_count=8`` CPU devices (the driver
separately dry-run-compiles the multi-chip path via __graft_entry__).
Must set env before jax imports anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
