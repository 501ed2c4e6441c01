"""Batched RANSAC machinery.

The classical loop (sample -> fit -> score -> repeat until confidence)
is data-dependent control flow XLA can't pipeline.  The TPU formulation
runs a *fixed batch* of B hypotheses concurrently:

1. sample: B x k indices via Gumbel top-k over the validity mask
   (collision-free within each hypothesis, vectorized, no while loops);
2. fit: ``vmap(fit_fn)`` over the B minimal sets (batched SVDs);
3. score: residuals for all B x N correspondences as one dense op;
4. select: argmax of masked inlier counts.

B is chosen from the classical sample-count formula at trace time
(static), e.g. B >= log(1-p) / log(1 - w^k) for confidence p and
worst-case inlier ratio w.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def num_hypotheses(min_set: int, inlier_ratio: float = 0.4,
                   confidence: float = 0.999, cap: int = 1024) -> int:
    """Classical RANSAC sample count, rounded up to a multiple of 8."""
    w = max(1e-3, inlier_ratio) ** min_set
    n = math.log(max(1e-12, 1.0 - confidence)) / math.log(max(1e-12, 1.0 - w))
    return min(cap, max(8, int(-(-n // 8) * 8)))


def ransac_sample_indices(key: jax.Array, valid: jnp.ndarray, B: int,
                          k: int) -> jnp.ndarray:
    """(B, k) index samples, uniform over the valid entries.

    Collision-TOLERANT uniform draws over the compacted valid-index
    list: one argsort moves valid indices to the front, then (B, k)
    uniforms pick positions below the valid count.  A within-sample
    collision (prob ~ k^2 / 2V, a couple percent at V~400) yields a
    degenerate minimal set that simply scores ~zero inliers — RANSAC
    absorbs it.

    The round-2 design drew (B, N) Gumbel noise and took per-row
    ``top_k`` — elegant and collision-free, but XLA lowers the masked
    (256, 2048) top-k to a ~35 ms sort-based monster when the mask is
    a traced value (measured on v5e; with a compile-time-constant mask
    it folds away, which is why microbenchmarks never caught it).
    This path is ~500x cheaper and was the whole-pipeline hotspot.
    """
    N = valid.shape[0]
    order = jnp.argsort(~valid)               # valid indices first
    V = jnp.maximum(valid.sum(), 1)
    u = jax.random.uniform(key, (B, k))
    # clip to V-1, not N-1: floor(u * V) rounds up to exactly V when u
    # is within 1 ulp of 1.0, which would sample the first INVALID
    # entry of the compacted order (round-3 advisor)
    pos = jnp.floor(u * V).astype(jnp.int32).clip(0, V - 1)
    return order[pos]


def run_ransac(key: jax.Array,
               fit_fn: Callable[[jnp.ndarray], jnp.ndarray],
               residual_fn: Callable[[jnp.ndarray], jnp.ndarray],
               data: jnp.ndarray, valid: jnp.ndarray,
               min_set: int, threshold: float, B: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generic batched RANSAC.

    fit_fn: (k, D) minimal sample -> model params (vmapped to (B, ...))
    residual_fn: (model, (N, D) data) -> (N,) residuals (vmapped over B)
    Returns (best_model, inlier_mask (N,), inlier_count).
    """
    idx = ransac_sample_indices(key, valid, B, min_set)
    samples = data[idx]  # (B, k, D)
    models = jax.vmap(fit_fn)(samples)
    res = jax.vmap(lambda m: residual_fn(m, data))(models)  # (B, N)
    good = jnp.isfinite(res) & (res < threshold) & valid[None, :]
    counts = good.sum(axis=1)
    # guard NaN models (degenerate samples): their count is 0 via isfinite
    best = jnp.argmax(counts)
    best_model = jax.tree_util.tree_map(lambda m: m[best], models)
    best_res = residual_fn(best_model, data)
    inliers = jnp.isfinite(best_res) & (best_res < threshold) & valid
    return best_model, inliers, inliers.sum()
