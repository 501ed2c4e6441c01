"""Fused FAST-9/16 corner score + 3x3 NMS in one Pallas pass.

The jnp reference (gslam_tpu.ops.frontend.fast_score + nms) materializes
16 rolled copies and ~50 (16, H, W) intermediates through HBM; this
kernel keeps the whole image and every intermediate in VMEM and writes
only the final NMS'd score map.  VPU elementwise throughout; images up
to ~1.5 MP fit the single-block VMEM budget (the SLAM frontend operates
on <= 1280x960 pyramid levels).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslam_tpu.ops.frontend import FAST_OFFSETS


def _roll(x, shift: int, axis: int):
    """pltpu.roll requires non-negative shifts; normalize."""
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis)


def _fast_nms_kernel(img_ref, out_ref, *, threshold: float, arc: int):
    img = img_ref[:]
    H, W = img.shape

    # circle samples via static rolls (VMEM shuffles)
    diffs = []
    for (dx, dy) in FAST_OFFSETS:
        shifted = _roll(_roll(img, -int(dy), 0), -int(dx), 1)
        diffs.append(shifted - img)

    # contiguous-arc test, unrolled over the 16 start positions
    ext = diffs + diffs[:arc]
    score_b = jnp.zeros_like(img)
    score_d = jnp.zeros_like(img)
    for s in range(16):
        okb = None
        okd = None
        sb = jnp.zeros_like(img)
        sd = jnp.zeros_like(img)
        for k in range(arc):
            d = ext[s + k]
            bb = d > threshold
            dd = d < -threshold
            okb = bb if okb is None else (okb & bb)
            okd = dd if okd is None else (okd & dd)
            sb = sb + (d - threshold)
            sd = sd + (-d - threshold)
        score_b = jnp.maximum(score_b, jnp.where(okb, sb, 0.0))
        score_d = jnp.maximum(score_d, jnp.where(okd, sd, 0.0))
    score = jnp.maximum(score_b, score_d)

    # border (circle radius 3)
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    border = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    score = jnp.where(border, score, 0.0)

    # 3x3 NMS via 8 neighbor rolls
    mx = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            mx = jnp.maximum(mx, _roll(_roll(score, -dy, 0), -dx, 1))
    out_ref[:] = jnp.where((score >= mx) & (score > 0), score, 0.0)


@partial(jax.jit, static_argnames=("threshold", "arc", "interpret"))
def fast_nms_pallas(img: jnp.ndarray, threshold: float = 0.06,
                    arc: int = 9, interpret: bool = False) -> jnp.ndarray:
    """NMS'd FAST score map; gold-equal to nms(fast_score(img))."""
    H, W = img.shape
    return pl.pallas_call(
        partial(_fast_nms_kernel, threshold=threshold, arc=arc),
        out_shape=jax.ShapeDtypeStruct((H, W), img.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img)
