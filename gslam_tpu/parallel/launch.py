"""Multi-host launch helpers.

SURVEY 5.8: multi-host setup goes through ``jax.distributed.initialize``
(control over DCN, collectives over ICI).  This wraps the standard
incantation plus the mesh construction across all global devices;
single-process runs are no-ops so the same entry works 1-host and
N-host.

Typical pod-slice launch (one process per host):

    python -m gslam_tpu play -dataset seqs.kitti -slam stereo \
        -dist.coordinator 10.0.0.2:8476 -dist.nprocs 4 -dist.pid $ID
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

from gslam_tpu.parallel.mesh import make_mesh


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: int = 1,
                           process_id: int = 0) -> None:
    """Initialize multi-process JAX when configured; no-op otherwise."""
    if num_processes <= 1 or coordinator is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(shape: Optional[Tuple[int, int]] = None):
    """Mesh over ALL global devices (multi-host aware)."""
    devs = jax.devices()
    n = len(devs)
    if shape is None:
        shape = (n, 1) if n % 2 or n <= 2 else (n // 2, 2)
    return make_mesh(shape, devices=devs)


def is_primary() -> bool:
    return jax.process_index() == 0
