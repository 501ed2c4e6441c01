"""SO(3) as unit quaternions — batched, differentiable, jit-safe.

Re-designs the reference's quaternion-backed ``SO3_<P>`` value type
(``GSLAM/core/SO3.h``: exp/log, composition, inverse, point action) as pure
functions over (..., 4) arrays in (w, x, y, z) order.  Small-angle branches
use Taylor series selected with ``jnp.where`` on *safe* operands so both
values and gradients are NaN-free under jit (no data-dependent Python
control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def quat_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    q = jnp.zeros((*shape, 4), dtype)
    return q.at[..., 0].set(1.0)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (broadcasts over leading dims)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate points v (..., 3) by q (..., 4): R(q) v.

    Uses the expanded form 2*(q_v x (q_v x v + w v)) + v — two cross
    products, cheaper than forming the matrix for single points.
    """
    w = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + w * t + jnp.cross(qv, t)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (..., 3) -> unit quaternion (..., 4).

    q = [cos(|phi|/2), sin(|phi|/2) * phi/|phi|], Taylor near 0.
    """
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2.clip(_EPS * _EPS))
    half = 0.5 * theta
    small = theta2 < _EPS
    # sin(t/2)/t: exact vs 2nd-order Taylor 1/2 - t^2/48
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([w, k * phi], axis=-1))


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (..., 4) -> axis-angle (..., 3), |result| <= pi."""
    q = quat_normalize(q)
    # canonicalize to w >= 0 so the angle is in [0, pi]
    q = jnp.where(q[..., :1] < 0, -q, q)
    w = q[..., :1]
    qv = q[..., 1:]
    n2 = jnp.sum(qv * qv, axis=-1, keepdims=True)
    n = jnp.sqrt(n2.clip(_EPS * _EPS))
    small = n2 < _EPS
    angle = 2.0 * jnp.arctan2(n, w)
    # phi = angle * qv / n ; near identity: 2/w * qv (Taylor)
    k = jnp.where(small, 2.0 / w.clip(_EPS), angle / n)
    return k * qv


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) -> rotation matrices (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(quat_normalize(q), -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(*m.shape[:-1], 3, 3)


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) via Shepperd's branch-free variant.

    Computes all four candidate quaternions (one per dominant diagonal
    term) and selects the numerically best with where-masks — jit-safe.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates, each scaled by its 4*q_i^2 term (always >= 0 for one)
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20],
                   axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21],
                   axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22],
                   axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cand, 4)
    # the candidate whose leading term (4 q_i^2) is largest is best
    lead = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                      1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(lead, axis=-1)
    best = jnp.take_along_axis(
        cands, idx[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2
    )[..., 0, :]
    return quat_normalize(best)
