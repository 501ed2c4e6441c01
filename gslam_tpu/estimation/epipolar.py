"""Two-view epipolar geometry: F / E estimation, decomposition,
triangulation.

Covers the reference Estimator's 2D-2D surface
(``GSLAM/core/Estimator.h``: findFundamental, findEssentialMatrix with
RANSAC + inlier masks; 'trianglate').  All fits are DLT + batched SVD so
``vmap`` turns one minimal solve into B concurrent hypotheses.

Inputs are *normalized image coordinates* (rays with z=1) unless noted:
the caller unprojects pixels with its camera model first, which keeps
these functions camera-model-agnostic (any of the four lens models).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.se3 import se3_inverse, se3_make
from gslam_tpu.core.so3 import matrix_to_quat, quat_rotate, quat_to_matrix
from gslam_tpu.estimation.ransac import num_hypotheses, run_ransac

_EPS = 1e-12


def _normalize_points(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hartley normalization: zero-mean, sqrt(2) RMS; returns (xn, T)."""
    mean = x.mean(axis=0)
    d = jnp.sqrt(((x - mean) ** 2).sum(-1)).mean()
    s = jnp.sqrt(2.0) / jnp.maximum(d, 1e-8)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return (x - mean) * s, T


def _eight_point(pts: jnp.ndarray) -> jnp.ndarray:
    """(k>=8, 4) [x1, y1, x2, y2] -> 3x3 F/E by DLT (no rank forcing)."""
    x1, y1, x2, y2 = pts[:, 0], pts[:, 1], pts[:, 2], pts[:, 3]
    A = jnp.stack([x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
                   jnp.ones_like(x1)], axis=-1)  # (k, 9)
    # null vector of A: smallest right singular vector
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[-1].reshape(3, 3)


def _force_rank2(F: jnp.ndarray) -> jnp.ndarray:
    u, s, vt = jnp.linalg.svd(F)
    return (u * s.at[2].set(0.0)[None, :]) @ vt


def _force_essential(E: jnp.ndarray) -> jnp.ndarray:
    u, s, vt = jnp.linalg.svd(E)
    return u @ jnp.diag(jnp.asarray([1.0, 1.0, 0.0])) @ vt


def sampson_distance(F: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric error of x2' F x1 = 0; pts (N, 4)."""
    x1 = jnp.stack([pts[:, 0], pts[:, 1], jnp.ones_like(pts[:, 0])], -1)
    x2 = jnp.stack([pts[:, 2], pts[:, 3], jnp.ones_like(pts[:, 0])], -1)
    Fx1 = x1 @ F.T          # (N, 3) = F @ x1
    Ftx2 = x2 @ F           # (N, 3) = F^T @ x2
    num = jnp.sum(x2 * Fx1, -1) ** 2
    den = Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2 + Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2
    return num / jnp.maximum(den, _EPS)


@partial(jax.jit, static_argnames=("B",))
def find_fundamental(key, pts1: jnp.ndarray, pts2: jnp.ndarray,
                     valid: jnp.ndarray, threshold: float = 3e-6,
                     B: int = 512):
    """RANSAC fundamental matrix from pixel (or normalized) pairs.

    pts1/pts2 (N, 2); threshold is on squared Sampson distance (scale it
    to your coordinate units).  Returns (F, inlier_mask, n_inliers).
    """
    data = jnp.concatenate([pts1, pts2], -1)

    def fit(sample):
        n1, T1 = _normalize_points(sample[:, :2])
        n2, T2 = _normalize_points(sample[:, 2:])
        Fn = _force_rank2(_eight_point(jnp.concatenate([n1, n2], -1)))
        return T2.T @ Fn @ T1

    return run_ransac(key, fit, sampson_distance, data, valid,
                      min_set=8, threshold=threshold, B=B)


@partial(jax.jit, static_argnames=("B",))
def find_essential(key, rays1: jnp.ndarray, rays2: jnp.ndarray,
                   valid: jnp.ndarray, threshold: float = 1e-6,
                   B: int = 512):
    """RANSAC essential matrix from normalized coords (N, 2) each.

    Returns (E, inliers, count); decompose with
    :func:`decompose_essential`.
    """
    data = jnp.concatenate([rays1, rays2], -1)

    def fit(sample):
        return _force_essential(_eight_point(sample))

    return run_ransac(key, fit, sampson_distance, data, valid,
                      min_set=8, threshold=threshold, B=B)


def essential_from_rt(q: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """E = [t]x R for pose taking cam1 coords to cam2 (x2 ~ R x1 + t)."""
    R = quat_to_matrix(q)
    tx = jnp.array([
        [0.0, -t[2], t[1]],
        [t[2], 0.0, -t[0]],
        [-t[1], t[0], 0.0]])
    return tx @ R


def triangulate(T1: jnp.ndarray, T2: jnp.ndarray, rays1: jnp.ndarray,
                rays2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-view DLT triangulation; batched over N.

    T1/T2: (7,) world->camera SE3 poses; rays: (N, 2) normalized coords.
    Returns (points_world (N, 3), depths-in-cam1 (N,)).  (Reference
    ``Estimator::trianglate``.)
    """
    from gslam_tpu.core.se3 import se3_to_matrix

    P1 = se3_to_matrix(T1)[:3]  # (3, 4)
    P2 = se3_to_matrix(T2)[:3]

    def one(r1, r2):
        A = jnp.stack([
            r1[0] * P1[2] - P1[0],
            r1[1] * P1[2] - P1[1],
            r2[0] * P2[2] - P2[0],
            r2[1] * P2[2] - P2[1],
        ])
        _, _, vt = jnp.linalg.svd(A)
        X = vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < _EPS, _EPS, X[3])

    X = jax.vmap(one)(rays1, rays2)
    depth1 = (quat_rotate(T1[3:7], X) + T1[:3])[..., 2]
    return X, depth1


def decompose_essential(E: jnp.ndarray, rays1: jnp.ndarray,
                        rays2: jnp.ndarray, valid: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """E -> relative pose T_21 (7,) by cheirality voting.

    Four candidate (R, t) from the standard SVD decomposition; the one
    putting the most points in front of both cameras wins (all four
    evaluated in parallel — no branching).  |t| = 1 (monocular scale).
    """
    u, _, vt = jnp.linalg.svd(E)
    # ensure proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), _EPS)

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    I = se3_make(jnp.zeros(3), jnp.asarray([1.0, 0.0, 0.0, 0.0]))

    def score(Rt):
        R, tt = Rt
        T21 = se3_make(tt, matrix_to_quat(R))
        X, d1 = triangulate(I, T21, rays1, rays2)
        d2 = (quat_rotate(T21[3:7], X) + T21[:3])[..., 2]
        return jnp.sum((d1 > 0) & (d2 > 0) & valid), T21

    scores_poses = [score(c) for c in cands]
    scores = jnp.stack([s for s, _ in scores_poses])
    poses = jnp.stack([p for _, p in scores_poses])
    best = jnp.argmax(scores)
    return poses[best], scores[best]
