"""3D-3D alignment: Umeyama / SIM3 RANSAC / affine / plane fitting.

Covers the reference Estimator's 3D-3D surface
(``GSLAM/core/Estimator.h``: findSIM3, findAffine3D, findPlane) plus the
Umeyama alignment the evaluation harness uses for trajectory ATE
(SURVEY.md section 3.5).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.sim3 import sim3_apply, sim3_make
from gslam_tpu.core.so3 import matrix_to_quat
from gslam_tpu.estimation.ransac import run_ransac

_EPS = 1e-12


def umeyama_alignment(src: jnp.ndarray, dst: jnp.ndarray,
                      weights: jnp.ndarray | None = None,
                      with_scale: bool = True) -> jnp.ndarray:
    """Closed-form similarity aligning src -> dst: returns Sim3 (8,).

    Weighted Umeyama (Horn) with SVD sign correction; `with_scale=False`
    returns s = 1 (SE3 alignment).  Batched-safe under vmap.
    """
    N = src.shape[0]
    w = jnp.ones(N) if weights is None else weights
    wsum = jnp.maximum(w.sum(), _EPS)
    wn = (w / wsum)[:, None]
    mu_s = (wn * src).sum(0)
    mu_d = (wn * dst).sum(0)
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * wn).T @ sc  # (3, 3) dst x src
    U, S, Vt = jnp.linalg.svd(cov)
    d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) .at[2].set(d))
    R = U @ D @ Vt
    var_s = (wn[:, 0] * (sc ** 2).sum(-1)).sum()
    s = jnp.where(with_scale,
                  (S * jnp.asarray([1.0, 1.0, 1.0]).at[2].set(d)).sum()
                  / jnp.maximum(var_s, _EPS),
                  1.0)
    t = mu_d - s * (R @ mu_s)
    return sim3_make(t, matrix_to_quat(R), s[None] if s.ndim == 0 else s)


def _sim3_residual(S: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
    src, dst = data[:, :3], data[:, 3:6]
    return jnp.sum((sim3_apply(S, src) - dst) ** 2, -1)


@partial(jax.jit, static_argnames=("B", "with_scale"))
def find_sim3(key, src: jnp.ndarray, dst: jnp.ndarray, valid: jnp.ndarray,
              threshold: float = 0.01, B: int = 256,
              with_scale: bool = True
              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RANSAC similarity from 3-point minimal Umeyama fits.

    Returns (Sim3 (8,), inliers, count), refit on all inliers.
    (Loop-closure geometric verification, reference findSIM3.)
    """
    data = jnp.concatenate([src, dst], -1)

    def fit(sample):
        return umeyama_alignment(sample[:, :3], sample[:, 3:6],
                                 with_scale=with_scale)

    S, inl, n = run_ransac(key, fit, _sim3_residual, data, valid,
                           min_set=3, threshold=threshold, B=B)
    # polish: weighted refit on the inlier set
    S = umeyama_alignment(src, dst, weights=inl.astype(jnp.float32),
                          with_scale=with_scale)
    err = _sim3_residual(S, data)
    inl = (err < threshold) & valid
    return S, inl, inl.sum()


def _affine_fit(sample: jnp.ndarray) -> jnp.ndarray:
    """(k>=4, 6) -> 3x4 affine via least squares."""
    src = sample[:, :3]
    dst = sample[:, 3:6]
    A = jnp.concatenate([src, jnp.ones_like(src[:, :1])], -1)  # (k, 4)
    M, *_ = jnp.linalg.lstsq(A, dst)
    return M.T  # (3, 4)


def _affine_residual(M: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
    src, dst = data[:, :3], data[:, 3:6]
    pred = src @ M[:, :3].T + M[:, 3]
    return jnp.sum((pred - dst) ** 2, -1)


@partial(jax.jit, static_argnames=("B",))
def find_affine3d(key, src: jnp.ndarray, dst: jnp.ndarray,
                  valid: jnp.ndarray, threshold: float = 0.01,
                  B: int = 256):
    """RANSAC 3D affine transform (3x4). Reference findAffine3D."""
    data = jnp.concatenate([src, dst], -1)
    return run_ransac(key, _affine_fit, _affine_residual, data, valid,
                      min_set=4, threshold=threshold, B=B)


def _plane_fit(sample: jnp.ndarray) -> jnp.ndarray:
    """3 points -> plane [n (unit), d] with n.x + d = 0."""
    p0, p1, p2 = sample[0], sample[1], sample[2]
    n = jnp.cross(p1 - p0, p2 - p0)
    n = n / jnp.maximum(jnp.linalg.norm(n), _EPS)
    return jnp.concatenate([n, -jnp.dot(n, p0)[None]])


def _plane_residual(plane: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(data @ plane[:3] + plane[3])


@partial(jax.jit, static_argnames=("B",))
def find_plane(key, points: jnp.ndarray, valid: jnp.ndarray,
               threshold: float = 0.01, B: int = 128):
    """RANSAC dominant plane [nx, ny, nz, d]. Reference findPlane."""
    return run_ransac(key, _plane_fit, _plane_residual, points, valid,
                      min_set=3, threshold=threshold, B=B)
