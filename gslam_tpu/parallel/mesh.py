"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_mesh(n: Optional[int] = None,
                 devices: Optional[Sequence] = None) -> Mesh:
    """1-D frame-parallel mesh (axis 'dp') over n devices — for the
    sharded tracking step (parallel/tracking.py)."""
    devs = list(devices if devices is not None else jax.devices())
    if n is not None:
        devs = devs[:n]
    return Mesh(np.asarray(devs), ("dp",))


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("pt", "obs"),
              devices: Optional[Sequence] = None) -> Mesh:
    """2D mesh over the available devices.

    Default shape (n, 1): all devices shard landmarks ('pt'); pass
    (n//2, 2) etc. to also shard observation slots ('obs').
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axis_names)


def shard_points_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for (P, ...) landmark-major arrays: P over 'pt'."""
    return NamedSharding(mesh, P("pt"))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
