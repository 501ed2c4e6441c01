"""Two-view initialization with H/E model selection.

The reference's SLAM plugins (ORB-SLAM-family) initialize monocular
geometry by fitting BOTH a homography and a fundamental/essential matrix
and choosing by inlier support — planar or low-parallax scenes break the
8-point essential solve (its null space becomes 2-dimensional), while
homographies break on general 3D scenes.  The reference ships this logic
inside its plugin ecosystem (cf. ``GSLAM/core/Estimator.h`` providing
both ``findHomography`` and ``findEssentialMatrix`` for exactly this
purpose); here it is one fused jittable graph: both RANSACs + both
decompositions run batched, and the winner is selected with a
branch-free ``where``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gslam_tpu.estimation.epipolar import (_eight_point, _force_essential,
                                           decompose_essential,
                                           essential_from_rt,
                                           find_essential, sampson_distance)
from gslam_tpu.estimation.homography import (decompose_homography,
                                             find_homography,
                                             homography_transfer_error)


class TwoViewResult(NamedTuple):
    T_21: jnp.ndarray       # (7,) relative SE3, |t| = 1
    inliers: jnp.ndarray    # (N,) bool, winning model's inlier mask
    n_inliers: jnp.ndarray  # () int32
    used_h: jnp.ndarray     # () bool — True if the homography model won
    n_e: jnp.ndarray        # () int32 essential-inlier count
    n_h: jnp.ndarray        # () int32 homography-inlier count


@partial(jax.jit, static_argnames=("B", "lo_rounds"))
def two_view_geometry(key, rays1: jnp.ndarray, rays2: jnp.ndarray,
                      valid: jnp.ndarray, sigma: float = 3e-3,
                      h_ratio: float = 0.45,
                      B: int = 256, lo_rounds: int = 2) -> TwoViewResult:
    """Relative pose from normalized correspondences, planar-safe.

    Fits E (8-point RANSAC + LO refits) and H (4-point RANSAC) in
    parallel and selects by *truncated chi-square scores*, not raw
    inlier counts: on (near-)planar scenes a degenerate E still fits
    every coplanar point, so counts cannot discriminate.  Following the
    ORB-SLAM initializer's rule, each model accumulates
    ``max(0, Gamma - d^2)`` per correspondence per direction (symmetric
    transfer for H, Sampson for E) with Gamma = 5.99 sigma^2 and the E
    inlier cutoff at 3.84 sigma^2; H wins when
    S_H / (S_H + S_E) > ``h_ratio``.

    ``sigma`` is the keypoint noise scale in NORMALIZED image units
    (pixel sigma / focal length).  A generous value (~1 px) is load-
    bearing: it lets one homography blanket a quasi-planar scene so the
    H model wins exactly where the 8-point essential solve degenerates.
    """
    ke, kh = jax.random.split(key)
    data = jnp.concatenate([rays1, rays2], -1)

    sigma2 = sigma * sigma
    e_threshold = 3.84 * sigma2
    gamma = 5.99 * sigma2

    E, inl_e, n_e = find_essential(ke, rays1, rays2, valid,
                                   threshold=e_threshold, B=B)

    def lo_round(carry, _):
        E, inl = carry
        d = sampson_distance(E, data)
        order = jnp.argsort(jnp.where(valid, d, jnp.inf))[:64]
        E2 = _force_essential(_eight_point(data[order]))
        inl2 = (sampson_distance(E2, data) < e_threshold) & valid
        better = inl2.sum() > inl.sum()
        return (jnp.where(better, E2, E), jnp.where(better, inl2, inl)), None

    (E, inl_e), _ = jax.lax.scan(lo_round, (E, inl_e), None,
                                 length=lo_rounds)
    n_e = inl_e.sum()

    H, _, _ = find_homography(kh, rays1, rays2, valid,
                              threshold=gamma, B=B)

    # truncated chi-square scores, both directions for each model
    d_e = sampson_distance(E, data)
    s_e = 2.0 * jnp.sum(jnp.where(valid & (d_e < e_threshold),
                                  gamma - d_e, 0.0))
    d_h1 = homography_transfer_error(H, data)
    data_rev = jnp.concatenate([rays2, rays1], -1)
    d_h2 = homography_transfer_error(jnp.linalg.inv(H), data_rev)
    s_h = (jnp.sum(jnp.where(valid & (d_h1 < gamma), gamma - d_h1, 0.0))
           + jnp.sum(jnp.where(valid & (d_h2 < gamma), gamma - d_h2, 0.0)))
    inl_h = valid & (d_h1 < gamma) & (d_h2 < gamma)
    n_h = inl_h.sum()

    T_e, _ = decompose_essential(E, rays1, rays2, inl_e)
    T_h, _ = decompose_homography(H, rays1, rays2, inl_h)

    # H-selected pairs still report epipolar inliers of the H-derived
    # motion (off-plane points are valid correspondences for BA even
    # though no single homography maps them)
    t_h = T_h[:3] / jnp.maximum(jnp.linalg.norm(T_h[:3]), 1e-12)
    d_he = sampson_distance(essential_from_rt(T_h[3:7], t_h), data)
    inl_he = valid & (d_he < gamma)

    use_h = s_h > h_ratio * (s_h + s_e)
    T = jnp.where(use_h, T_h, T_e)
    inl = jnp.where(use_h, inl_he, inl_e)
    return TwoViewResult(T_21=T, inliers=inl,
                         n_inliers=inl.sum().astype(jnp.int32),
                         used_h=use_h, n_e=n_e.astype(jnp.int32),
                         n_h=n_h.astype(jnp.int32))
