"""Homography estimation + decomposition (reference
``Estimator::findHomography``; decomposition has no direct upstream
analog — the reference delegates it to its SLAM plugins' initializers —
but is required for planar-scene two-view initialization, where the
8-point essential solve is degenerate)."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.se3 import se3_make
from gslam_tpu.core.so3 import matrix_to_quat, quat_rotate
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


def decompose_homography(H: jnp.ndarray, rays1: jnp.ndarray,
                         rays2: jnp.ndarray, valid: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Calibrated H (x2 ~ H x1, normalized coords) -> relative pose
    T_21 (7,) by cheirality voting over the 8 Faugeras-Lustman solutions.

    H decomposes as ``s (R + t n^T / d)``; with singular values
    d1 >= d2 >= d3 the classic closed form yields, per sign choice
    (eps1, eps3) and per +/- d2 branch, a candidate (R, t, n).  All 8
    are scored in parallel: triangulate every correspondence, count
    points in front of both cameras (and on the plane's visible side).
    |t| = 1 on return (monocular scale).  Degenerate pure-rotation
    homographies (d1 ~ d3) decompose to t ~ 0; callers should gate on
    parallax before trusting the translation direction.
    """
    from gslam_tpu.estimation.epipolar import triangulate

    u, d, vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(u) * jnp.linalg.det(vt)
    d1, d2, d3 = d[0], d[1], d[2]
    den = jnp.maximum(d1 * d1 - d3 * d3, _EPS)
    x1m = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / den)
    x3m = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / den)
    d2s = jnp.maximum(d2, _EPS)

    def cand(e1, e3, positive):
        x1 = e1 * x1m
        x3 = e3 * x3m
        if positive:   # d' = +d2 branch
            st = (d1 - d3) * x1 * x3 / d2s
            ct = (d1 * x3 * x3 + d3 * x1 * x1) / d2s
            Rp = jnp.array([[1.0, 0.0, 0.0],
                            [0.0, 1.0, 0.0],
                            [0.0, 0.0, 1.0]])
            Rp = Rp.at[0, 0].set(ct).at[0, 2].set(-st)
            Rp = Rp.at[2, 0].set(st).at[2, 2].set(ct)
            tp = (d1 - d3) * jnp.stack([x1, 0.0 * x1, -x3])
        else:          # d' = -d2 branch
            sp = (d1 + d3) * x1 * x3 / d2s
            cp = (d3 * x1 * x1 - d1 * x3 * x3) / d2s
            Rp = jnp.zeros((3, 3))
            Rp = Rp.at[0, 0].set(cp).at[0, 2].set(sp)
            Rp = Rp.at[1, 1].set(-1.0)
            Rp = Rp.at[2, 0].set(sp).at[2, 2].set(-cp)
            tp = (d1 + d3) * jnp.stack([x1, 0.0 * x1, x3])
        R = s * (u @ Rp @ vt)
        t = u @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), _EPS)

    cands = [cand(e1, e3, pos)
             for pos in (True, False)
             for e1 in (1.0, -1.0)
             for e3 in (1.0, -1.0)]

    def score(Rt):
        R, tt = Rt
        T21 = se3_make(tt, matrix_to_quat(R))
        X, dpt1 = triangulate(
            se3_make(jnp.zeros(3), jnp.asarray([1.0, 0.0, 0.0, 0.0])),
            T21, rays1, rays2)
        dpt2 = (quat_rotate(T21[3:7], X) + T21[:3])[..., 2]
        return jnp.sum((dpt1 > 0) & (dpt2 > 0) & valid), T21

    scored = [score(c) for c in cands]
    scores = jnp.stack([sc for sc, _ in scored])
    poses = jnp.stack([p for _, p in scored])
    best = jnp.argmax(scores)
    return poses[best], scores[best]
