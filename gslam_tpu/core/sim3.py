"""Sim(3) similarity transforms, packed (..., 8) = [t(3), q(4 wxyz), s].

Re-designs the reference's ``SIM3_<P>`` (``GSLAM/core/SIM3.h``) for batched
jnp.  Sim3 is the pose type of monocular keyframes (scale drift) and of
loop-closure pose-graph edges; metric maps use s = 1 (see
``sim3_from_se3``).  exp/log use the closed-form W matrix (Strasdat's
similarity left Jacobian) with Taylor fallbacks.
"""

from __future__ import annotations

import jax.numpy as jnp

from gslam_tpu.core.se3 import _hat
from gslam_tpu.core.so3 import (
    quat_conj, quat_identity, quat_mul, quat_normalize, quat_rotate,
    so3_exp, so3_log,
)

_EPS = 1e-8


def sim3_identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    t = jnp.zeros((*shape, 3), dtype)
    s = jnp.ones((*shape, 1), dtype)
    return jnp.concatenate([t, quat_identity(shape, dtype), s], axis=-1)


def sim3_make(t, q, s) -> jnp.ndarray:
    return jnp.concatenate([t, quat_normalize(q), s], axis=-1)


def sim3_from_se3(T: jnp.ndarray) -> jnp.ndarray:
    s = jnp.ones((*T.shape[:-1], 1), T.dtype)
    return jnp.concatenate([T, s], axis=-1)


def sim3_to_se3(S: jnp.ndarray) -> jnp.ndarray:
    """Drop scale (caller decides whether to bake it into t)."""
    return S[..., :7]


def sim3_mul(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """(A*B) x = A (B x) where S x = s R x + t."""
    tA, qA, sA = A[..., :3], A[..., 3:7], A[..., 7:8]
    tB, qB, sB = B[..., :3], B[..., 3:7], B[..., 7:8]
    return sim3_make(tA + sA * quat_rotate(qA, tB), quat_mul(qA, qB), sA * sB)


def sim3_inverse(S: jnp.ndarray) -> jnp.ndarray:
    t, q, s = S[..., :3], S[..., 3:7], S[..., 7:8]
    qi = quat_conj(q)
    si = 1.0 / s.clip(_EPS)
    return sim3_make(-si * quat_rotate(qi, t), qi, si)


def sim3_apply(S: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    return S[..., 7:8] * quat_rotate(S[..., 3:7], x) + S[..., :3]


def _sim3_W(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """W(phi, sigma) s.t. t = W rho  (Strasdat Sim3 exp; (...,3,3)).

    W = A I + B K + C KK with coefficients depending on theta=|phi| and
    sigma (log scale); all branches Taylor-guarded.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2.clip(_EPS * _EPS))
    sig = sigma[..., None]
    s = jnp.exp(sig)
    K = _hat(phi)
    KK = K @ K

    sig_small = jnp.abs(sig) < 1e-5
    th_small = theta2 < _EPS

    # A = (s - 1)/sigma  (sigma->0: 1 + sigma/2)
    A = jnp.where(sig_small, 1.0 + sig / 2.0 + sig * sig / 6.0,
                  (s - 1.0) / jnp.where(sig_small, 1.0, sig))

    # a = s*sin(theta), b = s*cos(theta), denom = sigma^2 + theta^2
    denom = (sig * sig + theta2).clip(_EPS)
    a_ = s * jnp.sin(theta)
    b_ = s * jnp.cos(theta)

    # B = (a*sigma + (1-b)*theta) / (theta*denom)   (guarded)
    # C = (A - ((b-1)*sigma + a*theta)/denom) / theta2
    B_gen = (a_ * sig + (1.0 - b_) * theta) / (theta * denom).clip(_EPS)
    C_gen = (A - ((b_ - 1.0) * sig + a_ * theta) / denom) / theta2.clip(_EPS)

    # theta -> 0 limits (any sigma):
    #   B -> (sigma*s - s + 1)/sigma^2          (sigma->0: 1/2 + sigma/3)
    #   C -> (s*sigma^2/2 - s*sigma + s - 1)/sigma^3   (sigma->0: 1/6 + sigma/8)
    sig_safe = jnp.where(sig_small, 1.0, sig)
    B_th0 = jnp.where(sig_small, 0.5 + sig / 3.0,
                      (sig * s - s + 1.0) / (sig_safe * sig_safe))
    C_th0 = jnp.where(sig_small, 1.0 / 6.0 + sig / 8.0,
                      (s * sig * sig / 2.0 - s * sig + s - 1.0)
                      / (sig_safe ** 3))

    B = jnp.where(th_small, B_th0, B_gen)
    C = jnp.where(th_small, C_th0, C_gen)

    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return A * eye + B * K + C * KK


def sim3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent (..., 7) = [rho, phi, sigma] -> Sim3 (..., 8)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = so3_exp(phi)
    W = _sim3_W(phi, sigma)
    t = (W @ rho[..., None])[..., 0]
    return sim3_make(t, q, jnp.exp(sigma))


def sim3_log(S: jnp.ndarray) -> jnp.ndarray:
    """Sim3 (..., 8) -> tangent (..., 7) = [rho, phi, sigma]."""
    t, q, s = S[..., :3], S[..., 3:7], S[..., 7:8]
    phi = so3_log(q)
    sigma = jnp.log(s.clip(_EPS))
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma], axis=-1)
