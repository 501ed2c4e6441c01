"""Perspective-n-Point: camera pose from 2D-3D correspondences.

Covers the reference Estimator's 2D-3D surface (PnP RANSAC,
``GSLAM/core/Estimator.h``).  Hypotheses are 6-point DLT fits of the
projection matrix (vmapped batched SVD) with the rotation re-orthogonal-
ized by SVD; refinement on inliers is Gauss-Newton on the SE3 tangent
(fixed iteration count — jit-friendly), playing the role of the
reference's iterative PnP polish.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.se3 import se3_apply, se3_exp, se3_make, se3_mul
from gslam_tpu.core.so3 import matrix_to_quat, quat_rotate
from gslam_tpu.estimation.ransac import run_ransac

_EPS = 1e-12


def _dlt_pnp(sample: jnp.ndarray) -> jnp.ndarray:
    """(k>=6, 5) rows [X, Y, Z, u, v] (u,v normalized coords) -> T (7,).

    DLT for P = [R|t] (up to scale), then nearest rotation via SVD and
    scale fixed so det(R) = 1 with positive depths.
    """
    X = sample[:, :3]
    u = sample[:, 3]
    v = sample[:, 4]
    z = jnp.zeros_like(u)
    o = jnp.ones_like(u)
    Xh = jnp.concatenate([X, o[:, None]], -1)  # (k, 4)
    r1 = jnp.concatenate([Xh, jnp.zeros_like(Xh), -u[:, None] * Xh], -1)
    r2 = jnp.concatenate([jnp.zeros_like(Xh), Xh, -v[:, None] * Xh], -1)
    A = jnp.concatenate([r1, r2], 0)  # (2k, 12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    P = vt[-1].reshape(3, 4)
    R = P[:, :3]
    # nearest rotation: R = U V^T; recover scale from singular values
    U, s, Vt = jnp.linalg.svd(R)
    d = jnp.sign(jnp.linalg.det(U @ Vt))
    Rn = U @ jnp.diag(jnp.asarray([1.0, 1.0, d])) @ Vt
    scale = d * 3.0 / jnp.maximum(s.sum(), _EPS)
    t = P[:, 3] * scale
    # sign: majority of sampled points must be in front
    front = (X @ Rn.T + t)[:, 2]
    flip = jnp.sign(jnp.sum(jnp.sign(front)))
    flip = jnp.where(flip == 0, 1.0, flip)
    # note: flipping P's sign flips both R and t; R flip breaks det=1,
    # so flip t and rotate 180 deg is wrong — instead flip whole P:
    # use -P -> R' = -R (det=-1). The d-correction above already chose
    # det=+1; the remaining ambiguity is handled by scoring (bad
    # hypotheses get few inliers). Keep t-flip only.
    return se3_make(t * flip, matrix_to_quat(Rn))


def pnp_reproj_error(T: jnp.ndarray, data: jnp.ndarray) -> jnp.ndarray:
    """Squared reprojection error in normalized image coords."""
    X = data[:, :3]
    uv = data[:, 3:5]
    pc = se3_apply(T, X)
    z = jnp.where(pc[:, 2] > _EPS, pc[:, 2], _EPS)
    proj = pc[:, :2] / z[:, None]
    err = jnp.sum((proj - uv) ** 2, -1)
    return jnp.where(pc[:, 2] > _EPS, err, jnp.inf)


@partial(jax.jit, static_argnames=("iters",))
def refine_pose_gn(T: jnp.ndarray, data: jnp.ndarray, weights: jnp.ndarray,
                   iters: int = 5) -> jnp.ndarray:
    """Gauss-Newton motion-only refinement on the SE3 tangent.

    Minimizes sum_i w_i |pi(T X_i) - uv_i|^2 over left-multiplied twist.
    Analytic 2x6 Jacobians; 6x6 normal equations solved per iteration.
    """
    def step(T, _):
        pc = se3_apply(T, data[:, :3])  # (N, 3)
        x, y = pc[:, 0], pc[:, 1]
        z = jnp.maximum(pc[:, 2], _EPS)
        iz = 1.0 / z
        proj = pc[:, :2] * iz[:, None]
        r = (proj - data[:, 3:5])  # (N, 2)
        # d(proj)/d(twist), twist = [rho, phi] acting on the LEFT:
        # d(pc) = d(rho) + d(phi) x pc
        zero = jnp.zeros_like(x)
        Jx = jnp.stack([iz, zero, -x * iz * iz,
                        -x * y * iz * iz, 1.0 + x * x * iz * iz, -y * iz],
                       -1)
        Jy = jnp.stack([zero, iz, -y * iz * iz,
                        -(1.0 + y * y * iz * iz), x * y * iz * iz, x * iz],
                       -1)
        J = jnp.stack([Jx, Jy], 1)  # (N, 2, 6)
        w = (weights * (pc[:, 2] > _EPS))[:, None, None]
        H = jnp.einsum("nia,nib->ab", J * w, J) + 1e-6 * jnp.eye(6)
        b = jnp.einsum("nia,ni->a", J * w, r)
        dx = -jnp.linalg.solve(H, b)
        return se3_mul(se3_exp(dx), T), None

    T, _ = jax.lax.scan(step, T, None, length=iters)
    return T


@partial(jax.jit, static_argnames=("B", "refine_iters"))
def find_pnp_ransac(key, points3d: jnp.ndarray, rays: jnp.ndarray,
                    valid: jnp.ndarray, threshold: float = 1e-5,
                    B: int = 256, refine_iters: int = 5
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RANSAC PnP: world points (N,3) + normalized coords (N,2) -> T_cw.

    threshold: squared normalized-coords reprojection error.
    Returns (T (7,), inlier_mask, n_inliers), GN-refined on inliers.
    """
    data = jnp.concatenate([points3d, rays], -1)
    T, inl, n = run_ransac(key, _dlt_pnp, pnp_reproj_error, data, valid,
                           min_set=6, threshold=threshold, B=B)
    T = refine_pose_gn(T, data, inl.astype(jnp.float32),
                       iters=refine_iters)
    err = pnp_reproj_error(T, data)
    inl = jnp.isfinite(err) & (err < threshold) & valid
    return T, inl, inl.sum()
