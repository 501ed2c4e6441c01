"""Fused BoW vocabulary transform: one MXU GEMM + L masked argmins.

Reference analog: ``Vocabulary::transform`` tree descent in
``GSLAM/core/Vocabulary.h`` (SSE/AVX popcount per node visit, pointer
chasing per descriptor).  The TPU re-design removes the data-dependent
tree walk entirely: distances from every descriptor to EVERY tree node
are one bf16 +/-1 GEMM on the MXU (popcount(xor) == (bits - dot)/2),
and the descent becomes L per-level *masked argmins* over static column
slices of that distance matrix — each descriptor may only select the k
children of its current node, enforced with an iota mask, so decisions
are bit-identical to the sequential descent.  No gathers, no pointers,
nothing data-dependent leaves VMEM.

Scope: the whole node table is held unpacked in VMEM, so the kernel
targets vocabularies with n_nodes <= ~8k (trained loop-closure vocs;
the jnp path in gslam_tpu.ops.vocab handles arbitrarily large ones).

Gold contract: identical word ids to vocab._transform_words
(tests/test_pallas.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_N = 128
# node table must fit VMEM unpacked: (n_nodes, 256) bf16 + the (TILE_N,
# n_nodes) f32 distance tile.  8k nodes ~= 4.2 MB + 4 MB.
MAX_NODES = 8192


def _level_offset(k: int, l: int) -> int:
    return (k ** l - 1) // (k - 1)


def _vocab_kernel(desc_ref, valid_ref, nodes_ref, words_ref, *, k, L,
                  bits):
    # pre-unpacked +/-1 bf16 inputs (the in-kernel unpack reshape has
    # no Mosaic lowering; see ops/pallas/matcher.py)
    A = desc_ref[:]                                # (N, bits)
    Nd = nodes_ref[:]                              # (n_nodes, bits)
    N = A.shape[0]
    dot = jnp.dot(A, Nd.T, preferred_element_type=jnp.float32)
    D = (jnp.float32(bits) - dot) * 0.5            # (N, n_nodes)
    inf = jnp.float32(bits + 1)

    node = jnp.zeros((N, 1), jnp.int32)            # index within level
    for l in range(1, L + 1):
        off = _level_offset(k, l)
        m = k ** l
        Dl = D[:, off:off + m]
        cols = jax.lax.broadcasted_iota(jnp.int32, (N, m), 1)
        Dm = jnp.where(cols // k == node, Dl, inf)
        best = jnp.min(Dm, axis=1, keepdims=True)
        # ties -> lowest child index, matching jnp.argmin
        node = jnp.min(jnp.where(Dm == best, cols, m), axis=1,
                       keepdims=True)
    # valid/words are (N, 1) columns: 1-D operands hit an XLA/Mosaic
    # layout disagreement (T(512) vs T(128)) on current libtpu
    words_ref[:] = jnp.where(valid_ref[:] > 0, node, -1)


@partial(jax.jit, static_argnames=("k", "L", "interpret"))
def transform_words_pallas(node_desc: jnp.ndarray, desc: jnp.ndarray,
                           valid: jnp.ndarray, k: int, L: int,
                           interpret: bool = False) -> jnp.ndarray:
    """Fused replacement for vocab._transform_words: (N,) word ids."""
    n_nodes = node_desc.shape[0]
    if n_nodes > MAX_NODES:
        raise ValueError(f"node table too large for VMEM kernel "
                         f"({n_nodes} > {MAX_NODES}); use the jnp path")
    from gslam_tpu.ops.matching import unpack_descriptors

    N = desc.shape[0]
    bits = desc.shape[1] * 32
    n_pad = (-N) % _TILE_N
    A = unpack_descriptors(jnp.pad(desc, ((0, n_pad), (0, 0))))
    Nd = unpack_descriptors(node_desc)
    valid_p = jnp.pad(valid.astype(jnp.int32), (0, n_pad))[:, None]
    grid = (A.shape[0] // _TILE_N,)
    words = pl.pallas_call(
        partial(_vocab_kernel, k=k, L=L, bits=bits),
        out_shape=jax.ShapeDtypeStruct((A.shape[0], 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_N, bits), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_nodes, bits), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_N, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(A, valid_p, Nd)
    return words[:N, 0]
