"""Stereo matching: per-keypoint disparity/depth from rectified pairs.

Reference analog: stereo SLAM plugins' left-right ORB matching (KITTI
config).  TPU formulation: one dense (Kl, Kr) Hamming GEMM masked by the
rectified epipolar gate (same row +/- v_tol, disparity in (0, max_disp])
— then depth = fx * baseline / disparity.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gslam_tpu.ops.matching import BITS, hamming_matrix


@partial(jax.jit, static_argnames=("max_dist",))
def match_stereo(desc_l: jnp.ndarray, valid_l: jnp.ndarray,
                 uv_l: jnp.ndarray,
                 desc_r: jnp.ndarray, valid_r: jnp.ndarray,
                 uv_r: jnp.ndarray,
                 max_disparity: float = 128.0, v_tol: float = 2.0,
                 max_dist: float = 64.0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Left->right match under the rectified-stereo gate.

    Returns (disparity (Kl,), valid (Kl,)): disparity = u_l - u_r > 0.
    """
    D = hamming_matrix(desc_l, desc_r)
    inf = jnp.float32(BITS + 1)
    du = uv_l[:, None, 0] - uv_r[None, :, 0]   # disparity candidates
    dv = jnp.abs(uv_l[:, None, 1] - uv_r[None, :, 1])
    gate = ((du > 0.1) & (du <= max_disparity) & (dv <= v_tol)
            & valid_l[:, None] & valid_r[None, :])
    D = jnp.where(gate, D, inf)
    j = jnp.argmin(D, axis=1)
    best = jnp.take_along_axis(D, j[:, None], 1)[:, 0]
    ok = valid_l & (best <= max_dist)
    disp = jnp.take_along_axis(du, j[:, None], 1)[:, 0]
    return jnp.where(ok, disp, 0.0), ok


def stereo_depth(disparity: jnp.ndarray, valid: jnp.ndarray,
                 fx: float, baseline: float) -> jnp.ndarray:
    """depth = fx * b / d; 0 where invalid."""
    d = jnp.where(valid & (disparity > 1e-3), disparity, jnp.inf)
    return fx * baseline / d
