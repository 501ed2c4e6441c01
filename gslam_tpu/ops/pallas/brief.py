"""Rotated-BRIEF descriptor sampling as one-hot MXU selection.

The jnp reference (gslam_tpu.ops.frontend.brief_descriptors) samples
2*256 rotated pattern points per keypoint with ONE flat 512x512-element
``jnp.take`` — a serial per-element gather the TPU executes in ~1.8 ms
at 512 kps (measured r4: HALF the tracking step).  This kernel removes
the gather entirely:

* each keypoint's 32x32 patch is staged from the VMEM-resident
  (transposed) image with ONE ALIGNED dynamic slice, then two
  tpu.dynamic_rotate ops roll the true window corner to the origin
  (Mosaic proves only 8-/128-aligned dynamic starts, so the corner
  aligns DOWN and the roll absorbs the sub-tile shift) — transposing
  the image outside means the slice lands patch-transposed (c, r),
  exactly the layout the selection GEMM wants, with no in-kernel
  transpose or cross-lane reshape;
* the rotated integer sample positions are computed on the VPU from
  the pattern constants ((256, 1) column layout so broadcasts never
  need a lane<->sublane transpose), identical rounding to the jnp path
  (jnp.round, round-half-even);
* sampling endpoint e of pattern bit j is then
      s_e[k, j] = sum_{r,c} 1[c == cx_e(k,j)] patchT[k, c, r]
                           1[r == ry_e(k,j)]
  -> a batched one-hot (TK, 256, 32) x (TK, 32, 32) dot_general on the
  MXU plus a masked lane-reduction; one-hot f32 selection is EXACT, so
  descriptors are BIT-EQUAL to the jnp path for every valid keypoint
  (invalid keypoints are zeroed by the caller, as in the jnp path).

An earlier variant widened the one-hot extents to the aligned staging
window ((40, 160)) instead of rolling; compaction to (32, 32) halves
the padded-MXU-tile count per endpoint and measured ~2x faster
on-chip (570 -> 286 us kernel-only at K=512, the recorded number in
BASELINE.md; an earlier same-day run of the same kernel measured
312 us — tunnel-host variance band), bit-equal.

Reference: ORB-SLAM-style plugin frontends (SURVEY 3.2 HOT LOOP);
the reference CPU code rotates a learned pattern per keypoint — same
observable behavior, TPU-native execution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslam_tpu.map.arena import DESC_WORDS
from gslam_tpu.ops.frontend import _PATTERN, PATCH_R

BITS = DESC_WORDS * 32      # 256
PS = 32                     # patch size (covers radius-13 pattern + subpixel)
PSX = PS + 8                # staged sublane extent: Mosaic can only
                            # prove dynamic sublane starts that are
                            # 8-aligned, so the x-corner is aligned
                            # DOWN and the roll absorbs the shift
PSY2 = 256                  # staged lane extent: tpu.dynamic_rotate
                            # only lowers for lane dims that are
                            # multiples of 128, so the kernel stages
                            # 2 lane tiles and ROLLS the true window
                            # to the origin
TILE_K = 8                  # keypoints per grid step (swept on-chip:
                            # 16 ran 2.1x slower — register/VMEM
                            # pressure breaks the slice/roll/dot
                            # pipeline — and 4 is an illegal <8-sublane
                            # output block)


def _brief_kernel(cx_ref, cy_ref, ca_ref, sa_ref, x0_ref, y0_ref,
                  imgT_ref, pat_ref, out_ref):
    """Roll-compacted one-hot selection (module docstring).

    Sublane rotates miscompile for NEGATIVE shifts in current Mosaic
    (probed on-chip: shift -5 on 40 rows landed at -229); both shifts
    are therefore passed as positive residues."""
    p1x = pat_ref[:, 0:1]                       # (BITS, 1)
    p1y = pat_ref[:, 1:2]
    p2x = pat_ref[:, 2:3]
    p2y = pat_ref[:, 3:4]
    iota = jax.lax.broadcasted_iota(jnp.int32, (BITS, PS), 1)

    ohs = [None] * (4 * TILE_K)
    patches = [None] * TILE_K
    t = pl.program_id(0)
    for i in range(TILE_K):
        k = t * TILE_K + i
        cx = cx_ref[0, k]
        cy = cy_ref[0, k]
        ca = ca_ref[0, k]
        sa = sa_ref[0, k]
        x0 = x0_ref[0, k]                       # TRUE window corner
        y0 = y0_ref[0, k]
        x0a = (x0 // 8) * 8
        y0a = (y0 // 128) * 128
        # stage the transposed patch: imgT[x, y] = img[y, x], so the
        # slice IS patchT[c, r] = img[y0+r, x0+c]
        raw = imgT_ref[pl.ds(pl.multiple_of(x0a, 8), PSX),
                       pl.ds(pl.multiple_of(y0a, 128), PSY2)]
        # roll the true corner to the origin (positive residues only;
        # normalized mod the axis size — an aligned corner would
        # otherwise pass shift == size, relying on implicit modular
        # behavior of tpu.dynamic_rotate, as fastnms._roll also avoids)
        r = pltpu.roll(raw, shift=(PSY2 - (y0 - y0a)) % PSY2, axis=1)
        r = pltpu.roll(r, shift=(PSX - (x0 - x0a)) % PSX, axis=0)
        patches[i] = r[0:PS, 0:PS]              # patchT[c, r] at (x0, y0)
        x0f = x0.astype(jnp.float32)
        y0f = y0.astype(jnp.float32)
        # rotated absolute sample coords, rounded EXACTLY as jnp does,
        # re-based to the window corner (always in-bounds for
        # border-respecting keypoints); parenthesization matches the
        # jnp path (cx + (rotated offset)) — a different f32
        # association would flip bits near .5
        c1 = jnp.round(cx + (p1x * ca - p1y * sa)) - x0f  # (BITS, 1)
        r1 = jnp.round(cy + (p1x * sa + p1y * ca)) - y0f
        c2 = jnp.round(cx + (p2x * ca - p2y * sa)) - x0f
        r2 = jnp.round(cy + (p2x * sa + p2y * ca)) - y0f
        for e, v in enumerate((c1, r1, c2, r2)):
            vi = v.clip(0, PS - 1).astype(jnp.int32)     # exact: round
            ohs[4 * i + e] = (iota == vi).astype(jnp.float32)

    def stack(sel):
        return jnp.stack([ohs[4 * i + sel] for i in range(TILE_K)], 0)

    C1, R1 = stack(0), stack(1)                 # (TK, BITS, PS)
    C2, R2 = stack(2), stack(3)
    P = jnp.stack(patches, 0)                   # (TK, PS_c, PS_r)
    dn = (((2,), (1,)), ((0,), (0,)))           # batch k, contract c
    # HIGHEST keeps selection exact (the default MXU pass truncates
    # patch intensities to bf16 and flips ~1% of a<b bits).  A manual
    # bf16x3 split of only the patch (3 one-pass dots, also exact) was
    # MEASURED SLOWER — 375 vs 312 us at K=512 — the three small dots
    # + VPU splits cost more than HIGHEST's extra passes at this
    # padded-tile size, so the kernel is not MXU-throughput-bound.
    U1 = jax.lax.dot_general(C1, P, dn,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    U2 = jax.lax.dot_general(C2, P, dn,         # (TK, BITS, PS_r)
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    s1 = jnp.sum(R1 * U1, axis=2)               # (TK, BITS)
    s2 = jnp.sum(R2 * U2, axis=2)
    out_ref[:] = (s1 < s2).astype(jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def brief_bits_pallas(img_blur: jnp.ndarray, uv: jnp.ndarray,
                      angle: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """(K, BITS) comparison bits; bit-equal to the jnp reference's
    ``a < b`` for keypoints at least PATCH_R+1 px inside the image."""
    H, W = img_blur.shape
    K = uv.shape[0]
    Kp = -(-K // TILE_K) * TILE_K
    pad = (0, Kp - K)

    cx = jnp.pad(uv[:, 0], pad)
    cy = jnp.pad(uv[:, 1], pad)
    ca = jnp.pad(jnp.cos(angle), pad)
    sa = jnp.pad(jnp.sin(angle), pad)
    # TRUE window corners; the kernel aligns them down (slice) and
    # rolls the residue away
    x0 = (jnp.round(cx) - PS // 2).astype(jnp.int32).clip(0, W - PS)
    y0 = (jnp.round(cy) - PS // 2).astype(jnp.int32).clip(0, H - PS)

    # pad the transposed image so every aligned slice is in-bounds
    px_ = max(0, ((W - PS) // 8) * 8 + PSX - W)
    py_ = max(0, ((H - PS) // 128) * 128 + PSY2 - H)
    imgT = jnp.pad(img_blur.T, ((0, px_), (0, py_)))

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    bits = pl.pallas_call(
        _brief_kernel,
        grid=(Kp // TILE_K,),
        in_specs=[smem] * 6 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((TILE_K, BITS), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Kp, BITS), jnp.float32),
        interpret=interpret,
    )(cx[None], cy[None], ca[None], sa[None], x0[None], y0[None],
      imgT, jnp.asarray(_PATTERN))
    return bits[:K]


@partial(jax.jit, static_argnames=("interpret",))
def brief_descriptors_pallas(img_blur: jnp.ndarray, uv: jnp.ndarray,
                             angle: jnp.ndarray,
                             interpret: bool = False) -> jnp.ndarray:
    """Drop-in fused replacement for frontend.brief_descriptors."""
    bits = brief_bits_pallas(img_blur, uv, angle, interpret=interpret)
    K = bits.shape[0]
    w = bits.astype(jnp.uint32).reshape(K, DESC_WORDS, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None,
                                                                  None]
    return jnp.sum(w * weights, axis=-1, dtype=jnp.uint32)
