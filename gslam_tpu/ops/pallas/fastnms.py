"""Fused FAST-9/16 corner score + 3x3 NMS in one Pallas pass.

The jnp reference (gslam_tpu.ops.frontend.fast_score + nms) materializes
16 rolled copies and ~50 (16, H, W) intermediates through HBM.  This
kernel fuses the whole detector, gridded over ROW STRIPES so the live
set stays well under the ~16 MB scoped-VMEM budget at any image size
(a whole-image formulation OOMs the compiler's VMEM stack on 480x640):

* the image is padded by a 4-row halo top/bottom and tiled into
  (STRIPE + 8, W) extended stripes — FAST needs a 3-pixel circle,
  NMS one more row, so 4 halo rows make every interior output row
  self-contained;
* circle samples come from static VMEM rolls of the stripe; vertical
  wrap-around touches only halo rows (dropped), horizontal wrap only
  the 3-column border the FAST border mask zeroes anyway;
* the contiguous-arc test is unrolled over the 16 start positions
  (VPU elementwise); 3x3 NMS via 8 neighbor rolls; one (STRIPE, W)
  store per stripe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslam_tpu.ops.frontend import FAST_OFFSETS

STRIPE = 64      # output rows per grid step
HALO = 4         # circle radius 3 + 1 NMS row


def _roll(x, shift: int, axis: int):
    """pltpu.roll requires non-negative shifts; normalize."""
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis)


def _fast_nms_kernel(img_ref, out_ref, raw_ref, *, threshold: float,
                     arc: int, H: int, W: int):
    i = pl.program_id(0)
    # overlapping halo window sliced from the (unblocked) VMEM image —
    # BlockSpec blocks cannot overlap, so the stripe is cut in-kernel
    ext = img_ref[pl.ds(i * STRIPE, STRIPE + 2 * HALO), :]

    # circle samples via static rolls (VMEM shuffles)
    diffs = []
    for (dx, dy) in FAST_OFFSETS:
        shifted = _roll(_roll(ext, -int(dy), 0), -int(dx), 1)
        diffs.append(shifted - ext)

    # contiguous-arc test, unrolled over the 16 start positions
    ext_d = diffs + diffs[:arc]
    score_b = jnp.zeros_like(ext)
    score_d = jnp.zeros_like(ext)
    for s in range(16):
        okb = None
        okd = None
        sb = jnp.zeros_like(ext)
        sd = jnp.zeros_like(ext)
        for k in range(arc):
            d = ext_d[s + k]
            bb = d > threshold
            dd = d < -threshold
            okb = bb if okb is None else (okb & bb)
            okd = dd if okd is None else (okd & dd)
            sb = sb + (d - threshold)
            sd = sd + (-d - threshold)
        score_b = jnp.maximum(score_b, jnp.where(okb, sb, 0.0))
        score_d = jnp.maximum(score_d, jnp.where(okd, sd, 0.0))
    score = jnp.maximum(score_b, score_d)

    # border mask in GLOBAL image coordinates (circle radius 3);
    # stripe row r maps to image row i*STRIPE + r - HALO
    rows = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 0) \
        + i * STRIPE - HALO
    xs = jax.lax.broadcasted_iota(jnp.int32, ext.shape, 1)
    border = ((rows >= 3) & (rows < H - 3) & (xs >= 3) & (xs < W - 3))
    score = jnp.where(border, score, 0.0)

    # 3x3 NMS via 8 neighbor rolls
    mx = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            mx = jnp.maximum(mx, _roll(_roll(score, -dy, 0), -dx, 1))
    nms = jnp.where((score >= mx) & (score > 0), score, 0.0)
    out_ref[:] = nms[HALO:HALO + STRIPE]
    # pre-NMS score map: consumers use it for subpixel refinement —
    # emitting it here saves a FULL second jnp FAST pass (measured
    # 1.43 ms/frame at 640x480, 38% of the round-3 tracking step)
    raw_ref[:] = score[HALO:HALO + STRIPE]


@partial(jax.jit, static_argnames=("threshold", "arc", "interpret"))
def fast_nms_pallas(img: jnp.ndarray, threshold: float = 0.06,
                    arc: int = 9, interpret: bool = False) -> jnp.ndarray:
    """NMS'd FAST score map; gold-equal to nms(fast_score(img))."""
    return fast_nms_raw_pallas(img, threshold=threshold, arc=arc,
                               interpret=interpret)[0]


@partial(jax.jit, static_argnames=("threshold", "arc", "interpret"))
def fast_nms_raw_pallas(img: jnp.ndarray, threshold: float = 0.06,
                        arc: int = 9, interpret: bool = False):
    """(nms_score, raw_score) in ONE pass; gold-equal to
    (nms(fast_score(img)), fast_score(img))."""
    H, W = img.shape
    n = -(-H // STRIPE)
    # pad to n*STRIPE rows + HALO on each side (zeros are inert: the
    # global border mask kills everything within 3 px of the true edge)
    imgp = jnp.zeros((n * STRIPE + 2 * HALO, W), img.dtype)
    imgp = jax.lax.dynamic_update_slice(imgp, img, (HALO, 0))
    stripe_spec = pl.BlockSpec((STRIPE, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    out, raw = pl.pallas_call(
        partial(_fast_nms_kernel, threshold=threshold, arc=arc, H=H, W=W),
        grid=(n,),
        out_shape=(jax.ShapeDtypeStruct((n * STRIPE, W), img.dtype),
                   jax.ShapeDtypeStruct((n * STRIPE, W), img.dtype)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(stripe_spec, stripe_spec),
        interpret=interpret,
    )(imgp)
    return out[:H], raw[:H]
