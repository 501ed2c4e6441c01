"""Fused jittable tracking step — the flagship forward function.

One XLA graph for the per-frame hot path of KeyframeSLAM (SURVEY 3.2):
extract (FAST + NMS + top-K + orientation + BRIEF) -> match against the
local-map descriptor slab (+/-1 GEMM Hamming) -> batched PnP RANSAC ->
GN pose refine.  Used by the driver's compile check (__graft_entry__)
and by bench.py for the frames/s/chip metric.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.camera import pinhole_unproject
from gslam_tpu.estimation.pnp import find_pnp_ransac
from gslam_tpu.ops.frontend import extract_features
from gslam_tpu.ops.matching import match_descriptors


@partial(jax.jit, static_argnames=("max_kps", "threshold", "ransac_b",
                                   "use_pallas"))
def track_forward(image: jnp.ndarray, cam_params: jnp.ndarray,
                  map_xyz: jnp.ndarray, map_desc: jnp.ndarray,
                  map_valid: jnp.ndarray, key: jax.Array,
                  max_kps: int = 512, threshold: float = 0.06,
                  ransac_b: int = 256, use_pallas: bool = False
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(pose_cw (7,), n_inliers, n_features) for one frame.

    image: (H, W) float32 grayscale in [0, 1]
    cam_params: (4,) pinhole [fx, fy, cx, cy]
    map_xyz/(M,3), map_desc/(M,8) uint32, map_valid/(M,): local map slab
    use_pallas: route FAST+NMS and the Hamming matcher through the fused
    TPU kernels (ops/pallas); False keeps the portable jnp path.
    """
    feats = extract_features(image, max_kps=max_kps, threshold=threshold,
                             use_pallas=use_pallas)
    if use_pallas:
        from gslam_tpu.ops.pallas.matcher import match_hamming_pallas

        m = match_hamming_pallas(map_desc, map_valid, feats.desc,
                                 feats.valid)
    else:
        m = match_descriptors(map_desc, map_valid, feats.desc,
                              feats.valid)
    rays = pinhole_unproject(cam_params, feats.uv[m.idx.clip(0)])[:, :2]
    T, inl, n = find_pnp_ransac(key, map_xyz, rays, m.valid,
                                threshold=2e-5, B=ransac_b)
    return T, n, feats.count


def example_inputs(H: int = 480, W: int = 640, M: int = 2048,
                   max_kps: int = 512):
    """Deterministic example args for compile checks / benchmarks.

    The local map is built *from the example image itself* (extract
    once, unproject keypoints at synthetic depths), so matching and PnP
    operate on a self-consistent problem: the benchmark exercises the
    full inlier path, not a degenerate zero-inlier RANSAC.
    """
    import numpy as np

    rng = np.random.default_rng(0)
    img = np.full((H, W), 0.1, np.float32)
    for _ in range(600):
        y = rng.integers(8, H - 8)
        x = rng.integers(8, W - 8)
        img[y - 1:y + 2, x - 1:x + 2] = rng.uniform(0.6, 1.0)
    fx = W * 0.8
    cam = np.asarray([fx, fx, W / 2, H / 2], np.float32)

    # build the example map on the CPU backend: benchmark/compile-check
    # consumers then only compile ONE graph (track_forward) for the
    # accelerator — compiles are expensive on remote-compile backends
    with jax.default_device(jax.devices("cpu")[0]):
        feats = extract_features(jnp.asarray(img), max_kps=max_kps)
        feats = jax.tree_util.tree_map(np.asarray, feats)
    uv = np.asarray(feats.uv)
    # synthetic smooth depth field -> 3D map points in the camera frame
    # of the example view (== world frame for the benchmark)
    z = 4.0 + 1.5 * np.sin(uv[:, 0] / 90.0) * np.cos(uv[:, 1] / 70.0)
    x3 = (uv[:, 0] - W / 2) / fx * z
    y3 = (uv[:, 1] - H / 2) / fx * z
    xyz = np.zeros((M, 3), np.float32)
    desc = np.zeros((M, 8), np.uint32)
    valid = np.zeros(M, bool)
    k = min(max_kps, M)
    xyz[:k] = np.stack([x3, y3, z], -1)[:k]
    desc[:k] = np.asarray(feats.desc)[:k]
    valid[:k] = np.asarray(feats.valid)[:k]
    # fill the rest with distractors
    nrest = M - k
    xyz[k:] = np.stack([rng.uniform(-2, 2, nrest),
                        rng.uniform(-1.5, 1.5, nrest),
                        rng.uniform(3, 9, nrest)], -1)
    desc[k:] = rng.integers(0, 2**31, (nrest, 8)).astype(np.uint32)
    valid[k:] = True
    return (jnp.asarray(img), jnp.asarray(cam), jnp.asarray(xyz),
            jnp.asarray(desc), jnp.asarray(valid), jax.random.PRNGKey(0))
