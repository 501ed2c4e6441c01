"""ORB-style feature frontend: FAST + orientation + rotated BRIEF.

The reference frames feature extraction as SLAM-plugin code (ORB pyramid
FAST+BRIEF in ORB-SLAM-style plugins; cf. SURVEY.md section 3.2 "HOT
LOOP").  This is the TPU-first formulation:

* FAST-9/16 corner test vectorized over the whole image with 16 rolled
  copies (VPU elementwise, no gather);
* corner *score* = SAD over the contiguous arc (OpenCV-style sum of
  |p_i - p| - t over qualifying arc);
* NMS as a 3x3 max-pool compare (reduce_window);
* keypoint selection as one global top_k — fixed K, validity-masked,
  shape-stable under jit;
* orientation by intensity centroid, computed as two 2D convolutions
  (x- and y-moment kernels) over the image — MXU work, then a gather;
* rotated BRIEF-256: a seeded Gaussian point-pair pattern (generated,
  not copied), rotated per-keypoint, sampled bilinearly from the blurred
  image, packed to 8 uint32 words.

Everything takes/returns fixed-shape arrays and is jit/vmap-safe.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gslam_tpu.map.arena import DESC_WORDS

# 16-pixel Bresenham circle of radius 3 (standard FAST)
FAST_OFFSETS = np.array([
    (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
    (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2),
    (-1, 3)], np.int32)  # (dy, dx)... stored as (dx, dy) pairs below

PATCH_R = 15          # orientation / descriptor patch radius
BRIEF_BITS = DESC_WORDS * 32


class Features(NamedTuple):
    """Fixed-capacity keypoint set for one image."""

    uv: jnp.ndarray       # (K, 2) float32 pixel coords (x, y)
    score: jnp.ndarray    # (K,) response
    angle: jnp.ndarray    # (K,) radians
    desc: jnp.ndarray     # (K, DESC_WORDS) uint32
    valid: jnp.ndarray    # (K,) bool
    count: jnp.ndarray    # () int32


# ---------------------------------------------------------------------------
# blur & pyramid


def _gauss_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def _sep_filter(img: jnp.ndarray, krow, kcol) -> jnp.ndarray:
    """Separable filter as fused shift-multiply-adds (SAME padding).

    ``lax.conv_general_dilated`` with single-channel spatial kernels is
    off the MXU fast path on TPU (measured ~ms for 1-D taps at 480x640
    — it shuffles layouts instead of fusing); a static unrolled sum of
    shifted slices compiles to one fused VPU pass over the image."""
    krow = np.asarray(krow)
    kcol = np.asarray(kcol)
    rr = len(krow) // 2
    rc = len(kcol) // 2
    H, W = img.shape
    p = jnp.pad(img, ((0, 0), (rr, rr)))
    out = krow[0] * p[:, 0:W]
    for j in range(1, len(krow)):
        if krow[j] != 0.0:
            out = out + krow[j] * p[:, j:j + W]
    p = jnp.pad(out, ((rc, rc), (0, 0)))
    out = kcol[0] * p[0:H, :]
    for j in range(1, len(kcol)):
        if kcol[j] != 0.0:
            out = out + kcol[j] * p[j:j + H, :]
    return out


@partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0,
                  radius: int = 4) -> jnp.ndarray:
    """Separable Gaussian blur, SAME padding. img (H, W) f32."""
    k = _gauss_kernel1d(sigma, radius)
    return _sep_filter(img, k, k)


def image_pyramid(img: jnp.ndarray, n_levels: int = 4,
                  scale: float = 1.25) -> list:
    """List of downscaled images (level 0 = input). Shapes are static."""
    out = [img]
    H, W = img.shape
    for i in range(1, n_levels):
        h = int(round(H / scale ** i))
        w = int(round(W / scale ** i))
        out.append(jax.image.resize(img, (h, w), "linear"))
    return out


# ---------------------------------------------------------------------------
# FAST


def fast_score(img: jnp.ndarray, threshold: float = 0.06,
               arc: int = 9) -> jnp.ndarray:
    """FAST-N/16 corner score map (0 where not a corner).

    16 rolled copies of the image give the circle samples for every pixel
    at once; a corner needs >= `arc` contiguous circle pixels all
    brighter (or all darker) than center +/- threshold.  Score is the
    OpenCV-style SAD margin: max over qualifying arcs of
    sum(|p_i - p| - t).
    """
    shifted = jnp.stack(
        [jnp.roll(img, (-int(dy), -int(dx)), (0, 1))
         for (dx, dy) in FAST_OFFSETS], 0)  # (16, H, W)
    diff = shifted - img[None]
    bright = diff > threshold
    dark = diff < -threshold
    db = jnp.concatenate([bright, bright[:arc]], 0)
    dd = jnp.concatenate([dark, dark[:arc]], 0)
    mb = jnp.concatenate([diff, diff[:arc]], 0) - threshold
    md = -jnp.concatenate([diff, diff[:arc]], 0) - threshold

    def arc_all(x):  # (16+arc, H, W) -> (16, H, W): AND over arc window
        w = jnp.stack([x[s:s + arc] for s in range(16)], 0)  # (16, arc, H, W)
        return jnp.all(w, axis=1)

    def arc_sum(x):
        w = jnp.stack([x[s:s + arc] for s in range(16)], 0)
        return jnp.sum(w, axis=1)

    okb = arc_all(db)
    okd = arc_all(dd)
    sb = jnp.where(okb, arc_sum(mb), 0.0)
    sd = jnp.where(okd, arc_sum(md), 0.0)
    score = jnp.maximum(sb.max(0), sd.max(0))
    # zero the border (circle radius 3)
    H, W = img.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    border = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(border, score, 0.0)


def nms(score: jnp.ndarray, radius: int = 1) -> jnp.ndarray:
    """Non-maximum suppression: keep local maxima in (2r+1)^2 windows."""
    w = 2 * radius + 1
    mx = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max, (w, w), (1, 1),
                               "SAME")
    return jnp.where((score >= mx) & (score > 0), score, 0.0)


@partial(jax.jit, static_argnames=("max_kps", "border"))
def select_keypoints(score: jnp.ndarray, max_kps: int = 512,
                     border: int = PATCH_R + 1,
                     raw_score: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                jnp.ndarray]:
    """Top-K maxima -> (uv (K,2), score (K,), valid (K,), count).

    With `raw_score` (the pre-NMS response map), maxima are refined to
    subpixel by a 1D quadratic fit per axis — integer-pixel keypoints
    alias by up to 0.7 px, which dominates PnP/BA residuals otherwise.
    """
    H, W = score.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    ok = ((ys >= border) & (ys < H - border)
          & (xs >= border) & (xs < W - border))
    s = jnp.where(ok, score, 0.0).reshape(-1)
    # hierarchical top-k: a single global top_k over H*W is a full-sort
    # hotspot on TPU; chunk-local top-k (vmapped, VPU-friendly) followed
    # by a small global top_k is ~10x faster.  Exact unless one chunk
    # holds > k_chunk NMS survivors (3x3 NMS caps density well below
    # that for real images).
    n = s.shape[0]
    chunk = 2048
    pad = (-n) % chunk
    sp = jnp.pad(s, (0, pad), constant_values=0.0).reshape(-1, chunk)
    k_chunk = min(64, max_kps)
    cv, ci = jax.lax.top_k(sp, k_chunk)                  # (B, k)
    base = (jnp.arange(sp.shape[0], dtype=jnp.int32) * chunk)[:, None]
    cand_idx = (ci + base).reshape(-1)
    cand_val = cv.reshape(-1)
    val, sel = jax.lax.top_k(cand_val, max_kps)
    idx = cand_idx[sel]
    yi = (idx // W).astype(jnp.int32)
    xi = (idx % W).astype(jnp.int32)
    y = yi.astype(jnp.float32)
    x = xi.astype(jnp.float32)
    if raw_score is not None:
        r = raw_score

        def parab(cm, c0, cp):
            denom = cm - 2.0 * c0 + cp
            off = 0.5 * (cm - cp) / jnp.where(jnp.abs(denom) < 1e-9,
                                              1e-9, denom)
            return off.clip(-0.5, 0.5)

        dx = parab(r[yi, xi - 1], r[yi, xi], r[yi, xi + 1])
        dy = parab(r[yi - 1, xi], r[yi, xi], r[yi + 1, xi])
        x = x + dx
        y = y + dy
    valid = val > 0
    uv = jnp.stack([x, y], -1)
    return uv, val, valid, valid.sum().astype(jnp.int32)


# ---------------------------------------------------------------------------
# orientation (intensity centroid, via moment convolutions)


@partial(jax.jit, static_argnames=("radius",))
def orientation_map(img: jnp.ndarray, radius: int = PATCH_R
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image centroid moments (m10, m01) over a SQUARE patch via
    SEPARABLE convolutions.

    The reference (and classic ORB) integrates over a circular disc;
    a dense (2r+1)^2 single-channel convolution is catastrophically
    slow on TPU (measured 116 ms for r=15 at 480x640 — XLA has no
    efficient path for big single-channel spatial filters).  A square
    patch factorizes: m10 = (x-ramp * ones^T) ==> conv_x(x·) then
    conv_y(1·) — two length-31 1-D convs, ~60x faster.  Both frames
    use the same estimator, so the disc->square change cancels in
    matching; orientation estimates differ from the disc version by
    <~5 deg on natural patches.
    """
    r = radius
    ramp = np.arange(-r, r + 1, dtype=np.float32)
    ones = np.ones((2 * r + 1,), np.float32)
    # slot j maps to offset j - r: the raw ramp IS sum_dx dx * I(y, x+dx)
    m10 = _sep_filter(img, ramp, ones)
    m01 = _sep_filter(img, ones, ramp)
    return m10, m01


def compute_orientations(img: jnp.ndarray, uv: jnp.ndarray,
                         radius: int = PATCH_R) -> jnp.ndarray:
    """Per-keypoint patch orientation (K,) radians."""
    m10, m01 = orientation_map(img, radius=radius)
    xi = uv[:, 0].astype(jnp.int32)
    yi = uv[:, 1].astype(jnp.int32)
    return jnp.arctan2(m01[yi, xi], m10[yi, xi])


# ---------------------------------------------------------------------------
# rotated BRIEF


def brief_pattern(bits: int = BRIEF_BITS, radius: int = PATCH_R,
                  seed: int = 42) -> np.ndarray:
    """(bits, 4) sampling pairs [x1, y1, x2, y2], Gaussian(0, r/5)^2
    clipped to the patch (original BRIEF G-II construction; generated
    from a fixed seed, NOT copied from OpenCV's learned table)."""
    rng = np.random.default_rng(seed)
    p = rng.normal(0.0, radius / 5.0, size=(bits, 4))
    return np.clip(p, -(radius - 2), radius - 2).astype(np.float32)


_PATTERN = brief_pattern()


def _bilinear(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
              ) -> jnp.ndarray:
    H, W = img.shape
    x0 = jnp.floor(x).astype(jnp.int32).clip(0, W - 2)
    y0 = jnp.floor(y).astype(jnp.int32).clip(0, H - 2)
    fx = (x - x0).clip(0.0, 1.0)
    fy = (y - y0).clip(0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _sample_nearest(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                    ) -> jnp.ndarray:
    """Rounded-pixel sampling via ONE flat gather.

    Classic ORB samples the blurred patch at rounded rotated offsets
    (nearest, not bilinear) — besides matching the reference, this is
    4x fewer random gathers, and a single flat jnp.take lowers to one
    gather HLO the TPU handles far better than four 2-D fancy-index
    gathers."""
    H, W = img.shape
    xi = jnp.round(x).astype(jnp.int32).clip(0, W - 1)
    yi = jnp.round(y).astype(jnp.int32).clip(0, H - 1)
    return jnp.take(img.reshape(-1), yi * W + xi, axis=0)


def brief_descriptors(img_blur: jnp.ndarray, uv: jnp.ndarray,
                      angle: jnp.ndarray) -> jnp.ndarray:
    """Rotated BRIEF from the *blurred* image -> (K, DESC_WORDS) uint32."""
    pat = jnp.asarray(_PATTERN)  # (B, 4)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (K,)
    # rotate both endpoints: (K, B)
    x1 = pat[None, :, 0] * ca[:, None] - pat[None, :, 1] * sa[:, None]
    y1 = pat[None, :, 0] * sa[:, None] + pat[None, :, 1] * ca[:, None]
    x2 = pat[None, :, 2] * ca[:, None] - pat[None, :, 3] * sa[:, None]
    y2 = pat[None, :, 2] * sa[:, None] + pat[None, :, 3] * ca[:, None]
    cx = uv[:, 0:1]
    cy = uv[:, 1:2]
    # both endpoints in one fused gather (halves gather launches)
    xs = jnp.concatenate([cx + x1, cx + x2], axis=1)   # (K, 2B)
    ys = jnp.concatenate([cy + y1, cy + y2], axis=1)
    s = _sample_nearest(img_blur, xs, ys)
    B = pat.shape[0]
    a, b = s[:, :B], s[:, B:]
    bits = (a < b)  # (K, B)
    K = bits.shape[0]
    w = bits.reshape(K, DESC_WORDS, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    return jnp.sum(w * weights, axis=-1, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# full extraction


@partial(jax.jit, static_argnames=("max_kps", "threshold", "use_pallas"))
def extract_features(img: jnp.ndarray, max_kps: int = 512,
                     threshold: float = 0.06,
                     use_pallas: bool = False) -> Features:
    """Single-scale ORB-style extraction (pyramid handled by caller).

    detect (FAST+NMS) -> select top-K -> orient (centroid) -> describe
    (rotated BRIEF on blurred image).  One fused jitted graph.
    ``use_pallas=True`` swaps the detector for the fused Pallas kernel
    (TPU-compiled path; the jnp reference remains the gold).
    """
    if use_pallas:
        from gslam_tpu.ops.pallas.fastnms import fast_nms_raw_pallas

        # one fused pass yields BOTH maps — recomputing the raw map
        # for subpixel interp through jnp fast_score cost 1.43 ms/frame
        # (measured r4), 38% of the whole round-3 tracking step
        score, raw = fast_nms_raw_pallas(img, threshold=threshold)
    else:
        raw = fast_score(img, threshold)
        score = nms(raw)
    uv, val, valid, count = select_keypoints(score, max_kps=max_kps,
                                             raw_score=raw)
    angle = compute_orientations(img, uv)
    blur = gaussian_blur(img, sigma=2.0)
    if use_pallas:
        from gslam_tpu.ops.pallas.brief import brief_descriptors_pallas

        # one-hot MXU selection kernel: bit-equal to the jnp gather
        # path for valid keypoints, ~10x faster (the flat 512x512
        # sample gather was half the round-3 tracking step)
        desc = brief_descriptors_pallas(blur, uv, angle)
    else:
        desc = brief_descriptors(blur, uv, angle)
    desc = jnp.where(valid[:, None], desc, 0)
    return Features(uv=uv, score=val, angle=jnp.where(valid, angle, 0.0),
                    desc=desc, valid=valid, count=count)


def extract_features_pyramid(img: jnp.ndarray, max_kps: int = 512,
                             threshold: float = 0.06, n_levels: int = 4,
                             scale: float = 1.25,
                             use_pallas: bool = False) -> Features:
    """Multi-scale ORB-style extraction over an image pyramid.

    Keypoints are budgeted per level in proportion to level area
    (ORB-style), detected and described at level resolution (scale
    invariance), and returned with uv mapped back to level-0 pixels.
    Level index is recoverable from the descriptor budget split; shapes
    are static per (image shape, n_levels) so each level compiles once.
    """
    pyr = image_pyramid(img, n_levels=n_levels, scale=scale)
    areas = np.asarray([lvl.shape[0] * lvl.shape[1] for lvl in pyr],
                       np.float64)
    ks = np.maximum(8, np.round(max_kps * areas / areas.sum())
                    .astype(int))
    # fix rounding so sum == max_kps
    ks[0] += max_kps - int(ks.sum())

    parts = []
    for l, lvl in enumerate(pyr):
        f = extract_features(lvl, max_kps=int(ks[l]), threshold=threshold,
                             use_pallas=use_pallas)
        s = jnp.float32(scale ** l)
        parts.append(f._replace(uv=f.uv * s))
    return Features(
        uv=jnp.concatenate([p.uv for p in parts]),
        score=jnp.concatenate([p.score for p in parts]),
        angle=jnp.concatenate([p.angle for p in parts]),
        desc=jnp.concatenate([p.desc for p in parts]),
        valid=jnp.concatenate([p.valid for p in parts]),
        count=sum(p.count for p in parts),
    )
