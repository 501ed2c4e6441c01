"""Robust M-estimator weights for IRLS (reference: robust kernel config
of the Optimizer plugin, ``GSLAM/core/Optimizer.h``).

Each returns w(e) = rho'(e^2)/1 evaluated so that multiplying the
squared-error normal equations by w implements the kernel; e is the
*unsquared* residual norm.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def huber_weight(e: jnp.ndarray, delta: float) -> jnp.ndarray:
    """1 inside |e|<=delta, delta/|e| outside."""
    a = jnp.abs(e)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, _EPS))


def cauchy_weight(e: jnp.ndarray, c: float) -> jnp.ndarray:
    return 1.0 / (1.0 + (e / c) ** 2)


def tukey_weight(e: jnp.ndarray, c: float) -> jnp.ndarray:
    w = (1.0 - (e / c) ** 2) ** 2
    return jnp.where(jnp.abs(e) <= c, w, 0.0)
