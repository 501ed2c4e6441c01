"""Fused Hamming matcher: unpack + MXU GEMM + top-2 + mutual check.

One kernel computes, for packed 256-bit descriptor sets A (N, 8) and
B (M, 8): per-A best/second Hamming distances, best index, and per-B
best-of-column index (for the mutual-consistency check) — without ever
writing the (N, M) distance matrix or the (N, 256) unpacked +/-1
matrices to HBM.  The distance matrix lives once in VMEM; the GEMM runs
in bf16 on the MXU (+/-1 exact), reductions on the VPU.

Gold contract: identical decisions to
gslam_tpu.ops.matching.match_descriptors (ties broken by lowest index).
"""

from __future__ import annotations

from functools import partial


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslam_tpu.ops.matching import BITS, Matches


def _matcher_kernel(a_ref, av_ref, b_ref, bv_ref,
                    best_ref, second_ref, idx_ref, back_ref):
    # descriptors arrive pre-unpacked as (K, 256) +/-1 bf16: the
    # (K, 8, 32) -> (K, 256) unpack reshape has no Mosaic lowering
    # ("unsupported shape cast"), and unpacked descriptors are tiny
    # (<= 1 MB) so staging them through HBM costs nothing.  The fusion
    # win of this kernel is keeping the (N, M) distance matrix out of
    # HBM and fusing the top-2 / mutual-check reductions.
    A = a_ref[:]
    B = b_ref[:]
    N = A.shape[0]
    M = B.shape[0]
    dot = jnp.dot(A, B.T, preferred_element_type=jnp.float32)
    D = (jnp.float32(BITS) - dot) * 0.5
    inf = jnp.float32(BITS + 1)
    ok = (av_ref[:].reshape(N, 1) > 0) & (bv_ref[:].reshape(1, M) > 0)
    D = jnp.where(ok, D, inf)

    # row best / second / argmin (ties -> lowest index, matching top_k)
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1)
    best = jnp.min(D, axis=1, keepdims=True)                 # (N, 1)
    is_best = D == best
    first_best_col = jnp.min(jnp.where(is_best, cols, M), axis=1,
                             keepdims=True)
    D2 = jnp.where(cols == first_best_col, inf, D)
    second = jnp.min(D2, axis=1, keepdims=True)

    best_ref[:] = best[:, 0]
    second_ref[:] = second[:, 0]
    idx_ref[:] = first_best_col[:, 0]

    # column argmin for the mutual check (ties -> lowest row index)
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0)
    cbest = jnp.min(D, axis=0, keepdims=True)                # (1, M)
    first_best_row = jnp.min(jnp.where(D == cbest, rows, N), axis=0)
    back_ref[:] = first_best_row


@partial(jax.jit, static_argnames=("interpret",))
def _matcher_call(desc_a, valid_a, desc_b, valid_b, interpret=False):
    from gslam_tpu.ops.matching import unpack_descriptors

    N = desc_a.shape[0]
    M = desc_b.shape[0]
    A = unpack_descriptors(desc_a)    # (N, 256) +/-1 bf16, XLA-side
    B = unpack_descriptors(desc_b)
    return pl.pallas_call(
        _matcher_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((N,), jnp.float32),
            jax.ShapeDtypeStruct((N,), jnp.float32),
            jax.ShapeDtypeStruct((N,), jnp.int32),
            jax.ShapeDtypeStruct((M,), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
        interpret=interpret,
    )(A, valid_a.astype(jnp.int32), B, valid_b.astype(jnp.int32))


@partial(jax.jit, static_argnames=("max_dist", "ratio", "mutual",
                                   "interpret"))
def match_hamming_pallas(desc_a: jnp.ndarray, valid_a: jnp.ndarray,
                         desc_b: jnp.ndarray, valid_b: jnp.ndarray,
                         max_dist: float = 64.0, ratio: float = 0.8,
                         mutual: bool = True,
                         interpret: bool = False) -> Matches:
    """Drop-in fused replacement for matching.match_descriptors."""
    best, second, bidx, back = _matcher_call(
        desc_a, valid_a, desc_b, valid_b, interpret=interpret)
    inf = jnp.float32(BITS + 1)
    ok = valid_a & (best <= max_dist) & (best <= ratio * second)
    if mutual:
        ok &= back[bidx] == jnp.arange(desc_a.shape[0])
    return Matches(idx=jnp.where(ok, bidx, -1).astype(jnp.int32),
                   dist=jnp.where(ok, best, inf),
                   valid=ok,
                   count=ok.sum().astype(jnp.int32))


def _gated_kernel(a_ref, av_ref, ax_ref, ay_ref,
                  b_ref, bv_ref, bx_ref, by_ref,
                  best_ref, second_ref, idx_ref, *, gate2: float):
    """Projection-gated variant: the (N, M) distance matrix AND the
    (N, M) pixel-distance gate both live only in VMEM."""
    A = a_ref[:]
    B = b_ref[:]
    N = A.shape[0]
    M = B.shape[0]
    dot = jnp.dot(A, B.T, preferred_element_type=jnp.float32)
    D = (jnp.float32(BITS) - dot) * 0.5
    inf = jnp.float32(BITS + 1)
    dx = ax_ref[:].reshape(N, 1) - bx_ref[:].reshape(1, M)
    dy = ay_ref[:].reshape(N, 1) - by_ref[:].reshape(1, M)
    ok = ((av_ref[:].reshape(N, 1) > 0) & (bv_ref[:].reshape(1, M) > 0)
          & (dx * dx + dy * dy <= jnp.float32(gate2)))
    D = jnp.where(ok, D, inf)

    cols = jax.lax.broadcasted_iota(jnp.int32, (N, M), 1)
    best = jnp.min(D, axis=1, keepdims=True)
    first_best_col = jnp.min(jnp.where(D == best, cols, M), axis=1,
                             keepdims=True)
    D2 = jnp.where(cols == first_best_col, inf, D)
    best_ref[:] = best[:, 0]
    second_ref[:] = jnp.min(D2, axis=1)
    idx_ref[:] = first_best_col[:, 0]


@partial(jax.jit, static_argnames=("gate_radius", "max_dist", "ratio",
                                   "interpret"))
def match_hamming_gated_pallas(desc_a, valid_a, desc_b, valid_b,
                               uv_a, uv_b, gate_radius: float,
                               max_dist: float = 64.0,
                               ratio: float = 0.9,
                               interpret: bool = False) -> Matches:
    """Drop-in fused replacement for matching.match_descriptors_gated
    (the product tracking matcher: search-by-projection)."""
    from gslam_tpu.ops.matching import unpack_descriptors

    N = desc_a.shape[0]
    A = unpack_descriptors(desc_a)
    B = unpack_descriptors(desc_b)
    best, second, bidx = pl.pallas_call(
        partial(_gated_kernel, gate2=float(gate_radius) ** 2),
        out_shape=(jax.ShapeDtypeStruct((N,), jnp.float32),
                   jax.ShapeDtypeStruct((N,), jnp.float32),
                   jax.ShapeDtypeStruct((N,), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
        interpret=interpret,
    )(A, valid_a.astype(jnp.int32), uv_a[:, 0], uv_a[:, 1],
      B, valid_b.astype(jnp.int32), uv_b[:, 0], uv_b[:, 1])
    inf = jnp.float32(BITS + 1)
    ok = valid_a & (best <= max_dist) & (best <= ratio * second)
    return Matches(idx=jnp.where(ok, bidx, -1).astype(jnp.int32),
                   dist=jnp.where(ok, best, inf),
                   valid=ok,
                   count=ok.sum().astype(jnp.int32))
