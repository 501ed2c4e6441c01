"""SE(3) rigid transforms, packed (..., 7) = [t(3), q(4 wxyz)].

Re-designs the reference's ``SE3_<P>`` (``GSLAM/core/SE3.h``: exp/log,
composition, inverse, point action) as batched pure functions.  The exp/log
maps use the closed-form left Jacobian of SO(3) with Taylor fallbacks, so
pose-graph residuals ``log(Z^-1 Xi^-1 Xj)`` are exactly differentiable
under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from gslam_tpu.core.so3 import (
    quat_conj, quat_identity, quat_mul, quat_normalize, quat_rotate,
    quat_to_matrix, matrix_to_quat, so3_exp, so3_log,
)

_EPS = 1e-8


def se3_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    t = jnp.zeros((*shape, 3), dtype)
    return jnp.concatenate([t, quat_identity(shape, dtype)], axis=-1)


def se3_t(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., :3]


def se3_q(T: jnp.ndarray) -> jnp.ndarray:
    return T[..., 3:7]


def se3_make(t: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([t, quat_normalize(q)], axis=-1)


def se3_mul(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Compose: (A*B) x = A (B x)."""
    tA, qA = A[..., :3], A[..., 3:7]
    tB, qB = B[..., :3], B[..., 3:7]
    return se3_make(tA + quat_rotate(qA, tB), quat_mul(qA, qB))


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    t, q = T[..., :3], T[..., 3:7]
    qi = quat_conj(q)
    return se3_make(-quat_rotate(qi, t), qi)


def se3_apply(T: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Act on points x (..., 3): R x + t."""
    return quat_rotate(T[..., 3:7], x) + T[..., :3]


def _so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """J_l(phi) (..., 3, 3): V matrix s.t. t = J_l(phi) rho in se3_exp."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2.clip(_EPS * _EPS))
    K = _hat(phi)
    KK = K @ K
    small = theta2 < _EPS
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    b = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * KK


def _so3_left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2.clip(_EPS * _EPS))
    K = _hat(phi)
    KK = K @ K
    small = theta2 < _EPS
    half = 0.5 * theta
    # 1/theta^2 - (1+cos)/(2 theta sin) == (1/theta^2)(1 - theta cot(theta/2)/2)
    cot_term = half * jnp.cos(half) / jnp.sin(half).clip(_EPS)
    c = jnp.where(small, 1.0 / 12.0 + theta2 / 720.0,
                  (1.0 - cot_term) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + c * KK


def _hat(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> skew matrices (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        zero, -z, y,
        z, zero, -x,
        -y, x, zero,
    ], axis=-1).reshape(*v.shape[:-1], 3, 3)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist (..., 6) = [rho, phi] -> SE3 (..., 7)."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp(phi)
    t = (_so3_left_jacobian(phi) @ rho[..., None])[..., 0]
    return se3_make(t, q)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """SE3 (..., 7) -> twist (..., 6) = [rho, phi]."""
    t, q = T[..., :3], T[..., 3:7]
    phi = so3_log(q)
    rho = (_so3_left_jacobian_inv(phi) @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_to_matrix(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> homogeneous matrices (..., 4, 4)."""
    R = quat_to_matrix(T[..., 3:7])
    t = T[..., :3]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], T.dtype), (*T.shape[:-1], 1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_se3(M: jnp.ndarray) -> jnp.ndarray:
    return se3_make(M[..., :3, 3], matrix_to_quat(M[..., :3, :3]))
