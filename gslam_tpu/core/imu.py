"""IMU preintegration (Forster-style, on-manifold).

Reference surface: ``MapFrame``'s IMU accessors (acceleration, angular
velocity, pose priors — ``GSLAM/core/MapFrame.h``) feed visual-inertial
SLAM plugins; the reference itself ships no estimator.  This module
provides the TPU-native building blocks:

* :func:`preintegrate` — light delta (dq/dv/dp/dt) for the gyro-aided
  motion model (one ``lax.scan`` over the window);
* :func:`preintegrate_full` — the full Forster et al. (TRO'16) factor:
  delta + 9x9 covariance (rotation/velocity/position error state) +
  first-order bias Jacobians, consumed by the visual-inertial bundle
  adjustment in :mod:`gslam_tpu.opt.vi`;
* :func:`compose_factors` — chain two preintegrated windows (used to
  accumulate per-frame windows into inter-keyframe factors without
  re-integrating).

Conventions: samples (M, 7) rows [t, ax, ay, az, wx, wy, wz] (body
frame, m/s^2 and rad/s); gravity handled by the caller (subtract in the
world frame using the current orientation estimate).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.so3 import (quat_identity, quat_mul, quat_rotate,
                                quat_to_matrix, so3_exp)

GRAVITY = 9.81


def _hat(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1)], -2)


def _so3_right_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian of SO(3): Jr(phi), Taylor-guarded near 0."""
    th2 = jnp.sum(phi * phi, -1)
    th = jnp.sqrt(th2)
    K = _hat(phi)
    K2 = K @ K
    small = th < 1e-5
    ths = jnp.where(small, 1.0, th)
    a = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(ths)) / (ths * ths))
    b = jnp.where(small, 1.0 / 6.0 - th2 / 120.0,
                  (ths - jnp.sin(ths)) / (ths ** 3))
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - a[..., None, None] * K + b[..., None, None] * K2


class ImuDelta(NamedTuple):
    dq: jnp.ndarray   # (4,) preintegrated rotation (body_i -> body_j)
    dv: jnp.ndarray   # (3,) velocity change in frame i (gravity-free)
    dp: jnp.ndarray   # (3,) position change in frame i (gravity-free)
    dt: jnp.ndarray   # () elapsed seconds


@jax.jit
def preintegrate(samples: jnp.ndarray, valid: jnp.ndarray,
                 gyro_bias: jnp.ndarray = jnp.zeros(3),
                 accel_bias: jnp.ndarray = jnp.zeros(3)) -> ImuDelta:
    """Integrate an IMU window (fixed-size, validity-masked).

    samples (M, 7); valid (M,).  dt per sample from successive
    timestamps (first sample anchors, zero contribution).
    """
    t = samples[:, 0]
    acc = samples[:, 1:4] - accel_bias
    gyr = samples[:, 4:7] - gyro_bias
    dts = jnp.diff(t, prepend=t[:1])
    dts = jnp.where(valid & (dts > 0) & (dts < 0.1), dts, 0.0)

    def step(carry, inp):
        q, v, p = carry
        a, w, dt = inp
        # midpoint rule: rotate body accel with the mid-step rotation
        # (halves the discretization bias of Euler under body rotation)
        a_i = quat_rotate(quat_mul(q, so3_exp(0.5 * w * dt)), a)
        p = p + v * dt + 0.5 * a_i * dt * dt
        v = v + a_i * dt
        q = quat_mul(q, so3_exp(w * dt))
        return (q, v, p), None

    init = (quat_identity(), jnp.zeros(3), jnp.zeros(3))
    (q, v, p), _ = jax.lax.scan(step, init, (acc, gyr, dts))
    return ImuDelta(dq=q, dv=v, dp=p, dt=dts.sum())


class ImuFactor(NamedTuple):
    """Full preintegrated IMU factor between two frames (Forster TRO'16).

    Error state ordering is [dtheta, dv, dp] (9,).  Bias Jacobians are
    first-order sensitivities of the deltas to the gyro/accel bias used
    at integration time (here: zero bias — apply corrections with the
    current bias estimate).
    """

    dq: jnp.ndarray     # (4,) preintegrated rotation body_i -> body_j
    dv: jnp.ndarray     # (3,) velocity delta in frame i (gravity-free)
    dp: jnp.ndarray     # (3,) position delta in frame i (gravity-free)
    dt: jnp.ndarray     # () elapsed seconds
    cov: jnp.ndarray    # (9, 9) covariance of [dtheta, dv, dp]
    J_R_bg: jnp.ndarray  # (3, 3) d(dtheta)/d(bg)
    J_v_bg: jnp.ndarray  # (3, 3) d(dv)/d(bg)
    J_v_ba: jnp.ndarray  # (3, 3) d(dv)/d(ba)
    J_p_bg: jnp.ndarray  # (3, 3) d(dp)/d(bg)
    J_p_ba: jnp.ndarray  # (3, 3) d(dp)/d(ba)


def identity_factor() -> ImuFactor:
    z3 = jnp.zeros((3, 3))
    return ImuFactor(dq=quat_identity(), dv=jnp.zeros(3), dp=jnp.zeros(3),
                     dt=jnp.zeros(()), cov=jnp.zeros((9, 9)),
                     J_R_bg=z3, J_v_bg=z3, J_v_ba=z3, J_p_bg=z3, J_p_ba=z3)


@jax.jit
def preintegrate_full(samples: jnp.ndarray, valid: jnp.ndarray,
                      gyro_noise: float = 1.7e-4,
                      accel_noise: float = 2.0e-3) -> ImuFactor:
    """Forster preintegration with covariance + bias Jacobians.

    samples (M, 7) rows [t, ax, ay, az, wx, wy, wz]; valid (M,).
    Noise densities are continuous-time (rad/s/sqrt(Hz), m/s^2/sqrt(Hz));
    per-sample variance = density^2 / dt.  Integrated with zero bias;
    downstream corrects with the bias Jacobians.
    """
    t = samples[:, 0]
    acc = samples[:, 1:4]
    gyr = samples[:, 4:7]
    dts = jnp.diff(t, prepend=t[:1])
    dts = jnp.where(valid & (dts > 0) & (dts < 0.1), dts, 0.0)

    def step(carry, inp):
        q, v, p, cov, JRg, Jvg, Jva, Jpg, Jpa = carry
        a, w, dt = inp
        active = dt > 0
        phi = w * dt
        # midpoint rotation for the accel transport (matches
        # :func:`preintegrate`); recursions stay first-order exact
        R = quat_to_matrix(quat_mul(q, so3_exp(0.5 * phi)))
        Ra = R @ a                        # accel rotated into frame i
        ah = _hat(a)
        dR_step = quat_to_matrix(so3_exp(phi))
        Jr = _so3_right_jacobian(phi)

        # bias Jacobian recursion (Forster eqs. 69-71; order matters:
        # position uses the *previous* velocity/rotation Jacobians)
        Jpg_n = Jpg + Jvg * dt - 0.5 * (R @ ah @ JRg) * dt * dt
        Jpa_n = Jpa + Jva * dt - 0.5 * R * dt * dt
        Jvg_n = Jvg - (R @ ah @ JRg) * dt
        Jva_n = Jva - R * dt
        JRg_n = dR_step.T @ JRg - Jr * dt

        # covariance propagation on [dtheta, dv, dp]
        A = jnp.zeros((9, 9))
        A = A.at[0:3, 0:3].set(dR_step.T)
        A = A.at[3:6, 0:3].set(-(R @ ah) * dt)
        A = A.at[3:6, 3:6].set(jnp.eye(3))
        A = A.at[6:9, 0:3].set(-0.5 * (R @ ah) * dt * dt)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        A = A.at[6:9, 6:9].set(jnp.eye(3))
        B = jnp.zeros((9, 6))
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(R * dt)
        B = B.at[6:9, 3:6].set(0.5 * R * dt * dt)
        dt_s = jnp.where(active, dt, 1.0)
        Qd = jnp.diag(jnp.concatenate([
            jnp.full((3,), gyro_noise ** 2 / dt_s),
            jnp.full((3,), accel_noise ** 2 / dt_s)]))
        cov_n = A @ cov @ A.T + B @ Qd @ B.T

        # state integration (mid-frame rotation; matches preintegrate)
        p_n = p + v * dt + 0.5 * Ra * dt * dt
        v_n = v + Ra * dt
        q_n = quat_mul(q, so3_exp(phi))

        def sel(new, old):
            return jnp.where(active, new, old)

        carry = (sel(q_n, q), sel(v_n, v), sel(p_n, p), sel(cov_n, cov),
                 sel(JRg_n, JRg), sel(Jvg_n, Jvg), sel(Jva_n, Jva),
                 sel(Jpg_n, Jpg), sel(Jpa_n, Jpa))
        return carry, None

    z3 = jnp.zeros((3, 3))
    init = (quat_identity(), jnp.zeros(3), jnp.zeros(3), jnp.zeros((9, 9)),
            z3, z3, z3, z3, z3)
    (q, v, p, cov, JRg, Jvg, Jva, Jpg, Jpa), _ = jax.lax.scan(
        step, init, (acc, gyr, dts))
    cov = 0.5 * (cov + cov.T)   # enforce symmetry against f32 drift
    return ImuFactor(dq=q, dv=v, dp=p, dt=dts.sum(), cov=cov,
                     J_R_bg=JRg, J_v_bg=Jvg, J_v_ba=Jva,
                     J_p_bg=Jpg, J_p_ba=Jpa)


@jax.jit
def compose_factors(a: ImuFactor, b: ImuFactor) -> ImuFactor:
    """Chain factor i->j (a) with j->k (b) into i->k.

    Deltas compose exactly; covariance and bias Jacobians compose to
    first order (the same approximation as incremental propagation).
    """
    Ra = quat_to_matrix(a.dq)
    dq = quat_mul(a.dq, b.dq)
    dv = a.dv + Ra @ b.dv
    dp = a.dp + a.dv * b.dt + Ra @ b.dp
    dt = a.dt + b.dt

    # error-state transport of segment a's uncertainty through segment b:
    # x_ik = f(x_ij, x_jk); d(x_ik)/d(x_ij) = F, d(x_ik)/d(x_jk) = G
    Rb_T = quat_to_matrix(b.dq).T
    F = jnp.zeros((9, 9))
    F = F.at[0:3, 0:3].set(Rb_T)
    F = F.at[3:6, 0:3].set(-Ra @ _hat(b.dv))
    F = F.at[3:6, 3:6].set(jnp.eye(3))
    F = F.at[6:9, 0:3].set(-Ra @ _hat(b.dp))
    F = F.at[6:9, 3:6].set(jnp.eye(3) * b.dt)
    F = F.at[6:9, 6:9].set(jnp.eye(3))
    G = jnp.zeros((9, 9))
    G = G.at[0:3, 0:3].set(jnp.eye(3))
    G = G.at[3:6, 3:6].set(Ra)
    G = G.at[6:9, 6:9].set(Ra)
    cov = F @ a.cov @ F.T + G @ b.cov @ G.T

    J_R_bg = Rb_T @ a.J_R_bg + b.J_R_bg
    J_v_bg = a.J_v_bg + Ra @ b.J_v_bg - Ra @ _hat(b.dv) @ a.J_R_bg
    J_v_ba = a.J_v_ba + Ra @ b.J_v_ba
    J_p_bg = (a.J_p_bg + a.J_v_bg * b.dt + Ra @ b.J_p_bg
              - Ra @ _hat(b.dp) @ a.J_R_bg)
    J_p_ba = a.J_p_ba + a.J_v_ba * b.dt + Ra @ b.J_p_ba
    return ImuFactor(dq=dq, dv=dv, dp=dp, dt=dt, cov=cov,
                     J_R_bg=J_R_bg, J_v_bg=J_v_bg, J_v_ba=J_v_ba,
                     J_p_bg=J_p_bg, J_p_ba=J_p_ba)


def predict_pose(pose_wc_i: jnp.ndarray, vel_w: jnp.ndarray,
                 delta: ImuDelta, gravity_w: jnp.ndarray | None = None
                 ) -> jnp.ndarray:
    """Predict cam->world pose at j from pose/velocity at i + IMU delta.

    Assumes the IMU frame == camera frame (callers apply extrinsics
    first).  gravity_w defaults to [0, -g, 0]? No: [0, 0, -g] in a
    z-up world; pass your convention explicitly for real data.
    """
    from gslam_tpu.core.se3 import se3_make

    if gravity_w is None:
        gravity_w = jnp.asarray([0.0, 0.0, -GRAVITY])
    t_i = pose_wc_i[:3]
    q_i = pose_wc_i[3:7]
    dt = delta.dt
    p_j = (t_i + vel_w * dt + 0.5 * gravity_w * dt * dt
           + quat_rotate(q_i, delta.dp))
    q_j = quat_mul(q_i, delta.dq)
    return se3_make(p_j, q_j)


def imu_rotation_edge(delta: ImuDelta, weight: float = 1.0):
    """Pose-graph edge from a preintegrated gyro delta.

    Returns (Z (7,), info (6,)) for :class:`gslam_tpu.opt.pose_graph.
    PoseGraph` with edge (i=new frame, j=old frame): the measured
    relative pose Z = T_i<-j has rotation conj(dq) (dq rotates body_j
    -> body_i) and unconstrained translation — the diagonal information
    weights only the rotation dims, so accelerometer double-integration
    error never pollutes position.  (Reference analog: relative-pose
    edges with information matrices in ``GSLAM/core/Optimizer.h``.)
    """
    from gslam_tpu.core.so3 import quat_conj

    Z = jnp.concatenate([jnp.zeros(3), quat_conj(delta.dq)])
    info = jnp.concatenate([jnp.zeros(3), jnp.full((3,), weight)])
    return Z, info
