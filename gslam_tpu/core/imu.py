"""IMU preintegration (Forster-style, on-manifold).

Reference surface: ``MapFrame``'s IMU accessors (acceleration, angular
velocity, pose priors — ``GSLAM/core/MapFrame.h``) feed visual-inertial
SLAM plugins; the reference itself ships no estimator.  This module
provides the TPU-native building block: batched preintegration of an
IMU window into a relative-motion factor (delta R/v/p + elapsed time),
computed with a ``lax.scan`` over samples — used by the EuRoC VI config
as a motion-model prior between frames and available as a pose-graph
edge term.

Conventions: samples (M, 7) rows [t, ax, ay, az, wx, wy, wz] (body
frame, m/s^2 and rad/s); gravity handled by the caller (subtract in the
world frame using the current orientation estimate).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.so3 import quat_identity, quat_mul, quat_rotate, so3_exp

GRAVITY = 9.81


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
        # rotate body accel into frame i, integrate
        a_i = quat_rotate(q, a)
        p = p + v * dt + 0.5 * a_i * dt * dt
        v = v + a_i * dt
        q = quat_mul(q, so3_exp(w * dt))
        return (q, v, p), None

    init = (quat_identity(), jnp.zeros(3), jnp.zeros(3))
    (q, v, p), _ = jax.lax.scan(step, init, (acc, gyr, dts))
    return ImuDelta(dq=q, dv=v, dp=p, dt=dts.sum())


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
