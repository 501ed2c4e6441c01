"""Perspective-n-Point: camera pose from 2D-3D correspondences.

Covers the reference Estimator's 2D-3D surface (PnP RANSAC,
``GSLAM/core/Estimator.h``).  RANSAC hypotheses come from a *batched
closed-form P3P* (Grunert's quartic, solved by Ferrari's method in f32
with Newton polish — TPU has no f64 and no nonsymmetric eig, so the
companion-matrix route is out): P3P handles planar and general scenes
alike, where a 6-point DLT of the projection matrix degenerates on
coplanar samples (walls/floors — ubiquitous in SLAM).  Each minimal
sample yields up to 4 pose solutions disambiguated by a 4th point; all
B x 4 candidates are scored in parallel.  A 6-point DLT remains
available (``_dlt_pnp``) for volumetric scenes.  Refinement on inliers
is Gauss-Newton on the SE3 tangent (fixed iterations, jit-friendly).
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


def _solve_quartic(c4, c3, c2, c1, c0, newton_iters: int = 4
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real roots of a quartic, Ferrari's method (f32-safe).

    Returns (roots (4,), valid (4,)).  Invalid slots hold garbage;
    downstream scoring masks them.  Roots are polished with Newton
    iterations on the original quartic to recover f32 precision.
    """
    eps = 1e-12
    c4s = jnp.where(jnp.abs(c4) < eps, eps, c4)
    a = c3 / c4s
    b = c2 / c4s
    c = c1 / c4s
    d = c0 / c4s
    # depressed quartic y^4 + p y^2 + q y + r, x = y - a/4
    p = b - 3.0 * a * a / 8.0
    q = c - a * b / 2.0 + a ** 3 / 8.0
    r = d - a * c / 4.0 + a * a * b / 16.0 - 3.0 * a ** 4 / 256.0

    # resolvent cubic z^3 + 2p z^2 + (p^2 - 4r) z - q^2 = 0; need z >= 0
    A2 = 2.0 * p
    A1 = p * p - 4.0 * r
    A0 = -q * q
    # depressed cubic w^3 + P w + Q, z = w - A2/3
    P = A1 - A2 * A2 / 3.0
    Q = A0 - A1 * A2 / 3.0 + 2.0 * A2 ** 3 / 27.0
    D = (Q / 2.0) ** 2 + (P / 3.0) ** 3

    def cbrt(x):
        return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)

    sqrtD = jnp.sqrt(jnp.abs(D))
    w_pos = cbrt(-Q / 2.0 + sqrtD) + cbrt(-Q / 2.0 - sqrtD)
    # trig branch (three real roots): take the largest
    Psafe = jnp.where(P < -eps, P, -eps)
    arg = jnp.clip(3.0 * Q / (2.0 * Psafe) * jnp.sqrt(-3.0 / Psafe),
                   -1.0, 1.0)
    w_tri = 2.0 * jnp.sqrt(-Psafe / 3.0) * jnp.cos(jnp.arccos(arg) / 3.0)
    w = jnp.where(D >= 0, w_pos, w_tri)
    z = jnp.maximum(w - A2 / 3.0, 0.0)

    alpha = jnp.sqrt(z)
    tiny_alpha = alpha < 1e-6
    alpha_s = jnp.where(tiny_alpha, 1.0, alpha)
    beta = (p + z - q / alpha_s) / 2.0
    gamma = (p + z + q / alpha_s) / 2.0
    # biquadratic fallback when alpha ~ 0: y^2 = (-p +/- sqrt(p^2-4r))/2
    disc_bi = p * p - 4.0 * r
    y2a = (-p + jnp.sqrt(jnp.abs(disc_bi))) / 2.0
    y2b = (-p - jnp.sqrt(jnp.abs(disc_bi))) / 2.0

    def quad_roots(A_, B_, C_):
        disc = B_ * B_ - 4.0 * A_ * C_
        ok = disc >= 0
        s = jnp.sqrt(jnp.abs(disc))
        return (-B_ + s) / (2.0 * A_), (-B_ - s) / (2.0 * A_), ok

    r1, r2, ok12 = quad_roots(1.0, alpha, beta)
    r3, r4, ok34 = quad_roots(1.0, -alpha, gamma)
    # biquadratic roots
    b1 = jnp.sqrt(jnp.maximum(y2a, 0.0))
    b2 = -b1
    b3 = jnp.sqrt(jnp.maximum(y2b, 0.0))
    b4 = -b3
    okb12 = (disc_bi >= 0) & (y2a >= 0)
    okb34 = (disc_bi >= 0) & (y2b >= 0)

    y = jnp.where(tiny_alpha, jnp.stack([b1, b2, b3, b4]),
                  jnp.stack([r1, r2, r3, r4]))
    ok = jnp.where(tiny_alpha,
                   jnp.stack([okb12, okb12, okb34, okb34]),
                   jnp.stack([ok12, ok12, ok34, ok34]))
    x = y - a / 4.0

    # Newton polish on the original quartic
    for _ in range(newton_iters):
        f = (((c4 * x + c3) * x + c2) * x + c1) * x + c0
        fp = ((4.0 * c4 * x + 3.0 * c3) * x + 2.0 * c2) * x + c1
        x = x - f / jnp.where(jnp.abs(fp) < eps, eps, fp)
    return x, ok


def _align_triad(Pw: jnp.ndarray, Pc: jnp.ndarray) -> jnp.ndarray:
    """Rigid transform world->cam from 3 exact point pairs (3, 3).

    Builds matching orthonormal frames from the two triangles:
    R = B_c B_w^T, t = c_c - R c_w.  Exact when the pairs are congruent
    (the P3P case); degenerate (collinear) samples give garbage that
    RANSAC scoring rejects.
    """
    eps = 1e-12

    def frame(P):
        u = P[1] - P[0]
        v = P[2] - P[0]
        e1 = u / jnp.maximum(jnp.linalg.norm(u), eps)
        n = jnp.cross(u, v)
        e3 = n / jnp.maximum(jnp.linalg.norm(n), eps)
        e2 = jnp.cross(e3, e1)
        return jnp.stack([e1, e2, e3], axis=1)  # columns

    Bw = frame(Pw)
    Bc = frame(Pc)
    R = Bc @ Bw.T
    t = Pc[0] - R @ Pw[0]
    return se3_make(t, matrix_to_quat(R))


def _p3p_grunert(sample: jnp.ndarray) -> jnp.ndarray:
    """(4, 5) rows [X, Y, Z, u, v] -> SE3 (7,) world->cam.

    Grunert's P3P on rows 0-2 (quartic coefficients derived by
    symbolic resultant elimination), up to 4 solutions; row 3
    disambiguates by reprojection.  Degenerate samples produce NaN-free
    garbage poses that simply score zero inliers.
    """
    eps = 1e-9
    Xw = sample[:3, :3]                                   # (3, 3)
    bear = jnp.concatenate([sample[:, 3:5],
                            jnp.ones((4, 1))], -1)
    bear = bear / jnp.linalg.norm(bear, axis=-1, keepdims=True)
    j1, j2, j3 = bear[0], bear[1], bear[2]
    P1, P2, P3 = Xw[0], Xw[1], Xw[2]
    a2 = jnp.sum((P2 - P3) ** 2)
    b2 = jnp.maximum(jnp.sum((P1 - P3) ** 2), eps)
    c2 = jnp.sum((P1 - P2) ** 2)
    A = a2 / b2
    B = c2 / b2
    ca = jnp.dot(j2, j3)
    cb = jnp.dot(j1, j3)
    cg = jnp.dot(j1, j2)

    # quartic in v = s3/s1 (coefficients from sympy resultant)
    c4 = (A ** 2 - 2 * A * B - 2 * A + B ** 2 - 4 * B * ca ** 2
          + 2 * B + 1)
    c3 = (-4 * A ** 2 * cb + 8 * A * B * cb + 4 * A * ca * cg
          + 4 * A * cb - 4 * B ** 2 * cb + 8 * B * ca ** 2 * cb
          + 4 * B * ca * cg - 4 * B * cb - 4 * ca * cg)
    c2_ = (4 * A ** 2 * cb ** 2 + 2 * A ** 2 - 8 * A * B * cb ** 2
           - 4 * A * B - 8 * A * ca * cb * cg - 4 * A * cg ** 2
           + 4 * B ** 2 * cb ** 2 + 2 * B ** 2 - 4 * B * ca ** 2
           - 8 * B * ca * cb * cg + 4 * ca ** 2 + 4 * cg ** 2 - 2)
    c1 = (-4 * A ** 2 * cb + 8 * A * B * cb + 4 * A * ca * cg
          + 8 * A * cb * cg ** 2 - 4 * A * cb - 4 * B ** 2 * cb
          + 4 * B * ca * cg + 4 * B * cb - 4 * ca * cg)
    c0 = A ** 2 - 2 * A * B - 4 * A * cg ** 2 + 2 * A + B ** 2 - 2 * B + 1

    v_roots, v_ok = _solve_quartic(c4, c3, c2_, c1, c0)   # (4,)

    def pose_from_v(v):
        # u from eq2: u^2 - 2 u cg + (1 - B(1 + v^2 - 2 v cb)) = 0
        k = 1.0 - B * (1.0 + v * v - 2.0 * v * cb)
        disc = jnp.maximum(cg * cg - k, 0.0)
        u_cands = jnp.stack([cg + jnp.sqrt(disc), cg - jnp.sqrt(disc)])
        # pick the u satisfying eq1 best
        eq1 = (u_cands ** 2 + v ** 2 - 2 * u_cands * v * ca
               - A * (1.0 + v * v - 2.0 * v * cb))
        u = u_cands[jnp.argmin(jnp.abs(eq1))]
        denom = jnp.maximum(1.0 + v * v - 2.0 * v * cb, eps)
        s1 = jnp.sqrt(b2 / denom)
        s2 = u * s1
        s3 = v * s1
        Yc = jnp.stack([s1 * j1, s2 * j2, s3 * j3])       # cam points
        # rigid alignment world -> cam on the 3 exact pairs: closed-form
        # orthonormal-triad construction (no SVD — batched 3x3 SVD is
        # slow on TPU and unnecessary for exact minimal triples)
        T = _align_triad(Xw, Yc)
        good = (s1 > 0) & (s2 > 0) & (s3 > 0)
        return T, good

    poses, good = jax.vmap(pose_from_v)(v_roots)          # (4, 7)
    good = good & v_ok & jnp.isfinite(poses).all(-1)
    # disambiguate with the 4th row
    d4 = sample[3:4]
    errs = jax.vmap(lambda T: pnp_reproj_error(T, d4)[0])(poses)
    errs = jnp.where(good, errs, jnp.inf)
    best = jnp.argmin(errs)
    return jnp.where(jnp.isfinite(errs[best]), poses[best],
                     se3_make(jnp.zeros(3),
                              jnp.asarray([1.0, 0.0, 0.0, 0.0])))


def pnp_reproj_error(T: jnp.ndarray, data: jnp.ndarray,
                     max_depth: float = jnp.inf) -> jnp.ndarray:
    """Squared reprojection error in normalized image coords.

    ``max_depth`` bounds the accepted point depth: degenerate RANSAC
    hypotheses (near-collinear minimal samples) can place the camera
    absurdly far away yet keep many distant points projecting tightly —
    a scale-aware depth bound starves such consensus sets."""
    X = data[:, :3]
    uv = data[:, 3:5]
    pc = se3_apply(T, X)
    z = jnp.where(pc[:, 2] > _EPS, pc[:, 2], _EPS)
    proj = pc[:, :2] / z[:, None]
    err = jnp.sum((proj - uv) ** 2, -1)
    ok = (pc[:, 2] > _EPS) & (pc[:, 2] < max_depth)
    return jnp.where(ok, err, jnp.inf)


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
                    B: int = 256, refine_iters: int = 5,
                    max_depth: float = jnp.inf
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RANSAC PnP: world points (N,3) + normalized coords (N,2) -> T_cw.

    threshold: squared normalized-coords reprojection error.
    max_depth: optional scene-scale depth bound on counted inliers
    (see :func:`pnp_reproj_error`).
    Returns (T (7,), inlier_mask, n_inliers), GN-refined on inliers.
    """
    data = jnp.concatenate([points3d, rays], -1)

    def err_fn(T, d):
        return pnp_reproj_error(T, d, max_depth=max_depth)

    T, inl, n = run_ransac(key, _p3p_grunert, err_fn, data,
                           valid, min_set=4, threshold=threshold, B=B)
    T = refine_pose_gn(T, data, inl.astype(jnp.float32),
                       iters=refine_iters)
    err = err_fn(T, data)
    inl = jnp.isfinite(err) & (err < threshold) & valid
    return T, inl, inl.sum()


@jax.jit
def pose_information(T: jnp.ndarray, data: jnp.ndarray,
                     weights: jnp.ndarray) -> jnp.ndarray:
    """Gauss-Newton pose information H = sum_i w_i J_i^T J_i (6, 6).

    The estimator-derived covariance the pose-graph edges want: the
    same analytic 2x6 reprojection Jacobians as
    :func:`refine_pose_gn`, evaluated AT the solution — in normalized
    image-coordinate units (multiply by 1/sigma^2 of the measurement
    noise for an absolute scale; edge builders typically normalize
    relative scales instead).  data (N, 5) = [X | ray_xy].
    """
    pc = se3_apply(T, data[:, :3])
    x, y = pc[:, 0], pc[:, 1]
    z = jnp.maximum(pc[:, 2], _EPS)
    iz = 1.0 / z
    zero = jnp.zeros_like(x)
    Jx = jnp.stack([iz, zero, -x * iz * iz,
                    -x * y * iz * iz, 1.0 + x * x * iz * iz, -y * iz],
                   -1)
    Jy = jnp.stack([zero, iz, -y * iz * iz,
                    -(1.0 + y * y * iz * iz), x * y * iz * iz, x * iz],
                   -1)
    J = jnp.stack([Jx, Jy], 1)                          # (N, 2, 6)
    w = (weights * (pc[:, 2] > _EPS))[:, None, None]
    return jnp.einsum("nia,nib->ab", J * w, J)
