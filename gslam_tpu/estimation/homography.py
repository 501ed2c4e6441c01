"""Homography estimation (reference ``Estimator::findHomography``)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gslam_tpu.estimation.epipolar import _normalize_points
from gslam_tpu.estimation.ransac import run_ransac

_EPS = 1e-12


def _dlt_homography(pts: jnp.ndarray) -> jnp.ndarray:
    """(k>=4, 4) [x1, y1, x2, y2] -> 3x3 H by DLT."""
    x1, y1, x2, y2 = pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1)
    r2 = jnp.stack([z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], -1)
    A = jnp.concatenate([r1, r2], 0)  # (2k, 9)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    H = vt[-1].reshape(3, 3)
    return H / jnp.where(jnp.abs(H[2, 2]) < _EPS, _EPS, H[2, 2])


def homography_transfer_error(H: jnp.ndarray, pts: jnp.ndarray
                              ) -> jnp.ndarray:
    """Squared forward transfer error |H x1 - x2|^2, pts (N, 4)."""
    x1 = jnp.stack([pts[:, 0], pts[:, 1], jnp.ones_like(pts[:, 0])], -1)
    y = x1 @ H.T
    w = jnp.where(jnp.abs(y[:, 2:3]) < _EPS, _EPS, y[:, 2:3])
    proj = y[:, :2] / w
    return jnp.sum((proj - pts[:, 2:4]) ** 2, -1)


@partial(jax.jit, static_argnames=("B",))
def find_homography(key, pts1: jnp.ndarray, pts2: jnp.ndarray,
                    valid: jnp.ndarray, threshold: float = 9.0,
                    B: int = 256):
    """RANSAC homography; threshold in squared coordinate units.

    Returns (H, inlier_mask, n_inliers).
    """
    data = jnp.concatenate([pts1, pts2], -1)

    def fit(sample):
        n1, T1 = _normalize_points(sample[:, :2])
        n2, T2 = _normalize_points(sample[:, 2:])
        Hn = _dlt_homography(jnp.concatenate([n1, n2], -1))
        return jnp.linalg.inv(T2) @ Hn @ T1

    return run_ransac(key, fit, homography_transfer_error, data, valid,
                      min_set=4, threshold=threshold, B=B)
