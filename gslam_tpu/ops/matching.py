"""Descriptor matching: Hamming distance as an MXU GEMM.

The reference's matcher is a C++ Hamming scan with SSE/AVX popcount
(SLAM-plugin hot loop; cf. the Vocabulary's popcount distance,
``GSLAM/core/Vocabulary.h``).  The TPU-first identity: for bit vectors
a, b written as +/-1 vectors A, B,

    hamming(a, b) = (BITS - <A, B>) / 2

so the full N x M distance matrix is ONE matmul on the MXU in bf16
(+/-1 values are exact in bf16; accumulation in f32 via
preferred_element_type).  Ratio test and mutual-consistency check are
top-k/argmin postprocessing on the distance matrix.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gslam_tpu.map.arena import DESC_WORDS

BITS = DESC_WORDS * 32


class Matches(NamedTuple):
    """Fixed-size match set A->B."""

    idx: jnp.ndarray    # (N,) int32 index into B (-1 invalid)
    dist: jnp.ndarray   # (N,) float32 Hamming distance
    valid: jnp.ndarray  # (N,) bool
    count: jnp.ndarray  # () int32


def unpack_descriptors(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, DESC_WORDS) uint32 -> (N, BITS) +/-1 bf16."""
    n = desc.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    pm1 = bits.astype(jnp.bfloat16) * 2.0 - 1.0
    return pm1.reshape(n, BITS)


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(N, W) x (M, W) packed uint32 -> (N, M) f32 Hamming distances."""
    A = unpack_descriptors(desc_a)
    B = unpack_descriptors(desc_b)
    dot = jnp.dot(A, B.T, preferred_element_type=jnp.float32)
    return (BITS - dot) * 0.5


@partial(jax.jit, static_argnames=("max_dist", "ratio", "mutual"))
def match_descriptors(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
                      desc_b: jnp.ndarray, valid_b: jnp.ndarray,
                      max_dist: float = 64.0, ratio: float = 0.8,
                      mutual: bool = True) -> Matches:
    """Brute-force Hamming matching with Lowe ratio + mutual check.

    All shapes static; invalid rows/cols are masked to +inf distance.
    """
    D = hamming_matrix(desc_a, desc_b)
    inf = jnp.float32(BITS + 1)
    D = jnp.where(valid_a[:, None] & valid_b[None, :], D, inf)

    # two smallest per row for the ratio test
    neg2, idx2 = jax.lax.top_k(-D, 2)
    best = -neg2[:, 0]
    second = -neg2[:, 1]
    bidx = idx2[:, 0]

    ok = valid_a & (best <= max_dist) & (best <= ratio * second)
    if mutual:
        # B's best must point back to us (argmin over columns)
        back = jnp.argmin(D, axis=0)  # (M,)
        ok &= back[bidx] == jnp.arange(D.shape[0])
    return Matches(idx=jnp.where(ok, bidx, -1).astype(jnp.int32),
                   dist=jnp.where(ok, best, inf),
                   valid=ok,
                   count=ok.sum().astype(jnp.int32))


def match_frames(feat_a, feat_b, **kw) -> Matches:
    """Match two Features sets (gslam_tpu.ops.frontend.Features)."""
    return match_descriptors(feat_a.desc, feat_a.valid,
                             feat_b.desc, feat_b.valid, **kw)


@partial(jax.jit, static_argnames=("max_dist", "ratio"))
def match_descriptors_gated(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
                            desc_b: jnp.ndarray, valid_b: jnp.ndarray,
                            uv_a: jnp.ndarray, uv_b: jnp.ndarray,
                            gate_radius: jnp.ndarray | float,
                            max_dist: float = 64.0,
                            ratio: float = 0.9) -> Matches:
    """Projection-gated matching (search-by-projection).

    The ORB-SLAM-style tracking matcher: candidate pairs are restricted
    to a spatial gate |uv_a - uv_b| < gate_radius (uv_a = projected map
    points under the predicted pose, uv_b = detected keypoints), which
    resolves repetitive-texture ambiguity that a global ratio test
    can't.  Formulated densely: the (N, M) Hamming GEMM masked by the
    (N, M) gate — still pure MXU/VPU work, no gather lists.
    """
    D = hamming_matrix(desc_a, desc_b)
    inf = jnp.float32(BITS + 1)
    gate2 = jnp.asarray(gate_radius, jnp.float32) ** 2
    d2 = jnp.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, -1)
    ok_pair = (valid_a[:, None] & valid_b[None, :]) & (d2 <= gate2)
    D = jnp.where(ok_pair, D, inf)

    neg2, idx2 = jax.lax.top_k(-D, 2)
    best = -neg2[:, 0]
    second = -neg2[:, 1]
    bidx = idx2[:, 0]
    ok = valid_a & (best <= max_dist) & (best <= ratio * second)
    return Matches(idx=jnp.where(ok, bidx, -1).astype(jnp.int32),
                   dist=jnp.where(ok, best, inf),
                   valid=ok,
                   count=ok.sum().astype(jnp.int32))


@partial(jax.jit, static_argnames=("max_dist", "ratio", "level_div"))
def match_descriptors_word_gated(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
                                 words_a: jnp.ndarray,
                                 desc_b: jnp.ndarray, valid_b: jnp.ndarray,
                                 words_b: jnp.ndarray,
                                 max_dist: float = 64.0,
                                 ratio: float = 0.9,
                                 level_div: int = 1) -> Matches:
    """BoW-guided matching (the reference FeatureVector use: DBoW's
    guided matching restricts candidate pairs to features indexed under
    the same vocabulary node at an upper tree level — dropping the
    quadratic scan to per-node buckets).

    TPU formulation: keep the dense (N, M) Hamming GEMM and mask pairs
    whose word ids disagree at the gating level.  ``level_div`` =
    k^(L - l): leaf words integer-divided by it give the level-l node id
    (1 = gate at the leaf itself).  Invalid/unassigned (-1) words never
    match.
    """
    D = hamming_matrix(desc_a, desc_b)
    inf = jnp.float32(BITS + 1)
    na = words_a // level_div
    nb = words_b // level_div
    ok_pair = (valid_a[:, None] & valid_b[None, :]
               & (words_a[:, None] >= 0) & (words_b[None, :] >= 0)
               & (na[:, None] == nb[None, :]))
    D = jnp.where(ok_pair, D, inf)

    neg2, idx2 = jax.lax.top_k(-D, 2)
    best = -neg2[:, 0]
    second = -neg2[:, 1]
    bidx = idx2[:, 0]
    ok = valid_a & (best <= max_dist) & (best <= ratio * second)
    return Matches(idx=jnp.where(ok, bidx, -1).astype(jnp.int32),
                   dist=jnp.where(ok, best, inf),
                   valid=ok,
                   count=ok.sum().astype(jnp.int32))
