"""Frame-parallel tracking over a device mesh (data-parallel analog).

No upstream counterpart (the reference is single-process CPU —
SURVEY §2 "Parallelism strategies"); this is the TPU-first fleet mode:
a BATCH of frames (different sequences, or a sliding window of one
sequence being re-localized against a fixed map) is sharded over a
1-D device mesh and every chip runs the fused tracking step
(gslam_tpu.models.graft.track_forward) on its shard via
``shard_map`` + ``vmap``.  The local-map slab is replicated (it is the
shared world model); per-frame inputs and outputs are sharded.  There
is no cross-chip communication in the step itself — tracking is
embarrassingly parallel; the collectives live in the distributed BA
backend (parallel/dist_ba.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


@partial(jax.jit, static_argnames=("mesh", "max_kps", "ransac_b"))
def sharded_track_batch(mesh: Mesh, images: jnp.ndarray,
                        cam_params: jnp.ndarray, map_xyz: jnp.ndarray,
                        map_desc: jnp.ndarray, map_valid: jnp.ndarray,
                        keys: jnp.ndarray, max_kps: int = 512,
                        ransac_b: int = 256
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Track B frames against one replicated map slab, B sharded over
    the mesh's 'dp' axis.

    images (B, H, W) f32; cam_params (4,); map_* the shared slab;
    keys (B,) PRNG keys (jax.random.split output, (B, 2) uint32).
    Returns (poses (B, 7), n_inliers (B,), n_features (B,)).
    B must be a multiple of the 'dp' axis size (pad upstream).
    """
    from gslam_tpu.models.graft import track_forward

    def local(images, cam_params, map_xyz, map_desc, map_valid, keys):
        step = partial(track_forward, max_kps=max_kps,
                       ransac_b=ransac_b)
        return jax.vmap(step, in_axes=(0, None, None, None, None, 0))(
            images, cam_params, map_xyz, map_desc, map_valid, keys)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P("dp"), P(), P(), P(), P(), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp")),
        check_vma=False)
    return fn(images, cam_params, map_xyz, map_desc, map_valid, keys)
