"""Undistorter: precomputed remap camera -> pinhole camera.

Reference: ``GSLAM/core/Undistorter.h`` — a remap table built once from
(distorted camera, target pinhole camera), applied per frame by dataset
players.  TPU formulation: the table is a (H, W, 2) source-coordinate
array computed with the camera models' unproject/project (any of the
four models); application is one vectorized bilinear gather, jitted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gslam_tpu.core.camera import Camera


class Undistorter:
    def __init__(self, cam_in: Camera, cam_out: Camera | None = None):
        """Build the remap table cam_in -> cam_out (default: pinhole
        with cam_in's fx/fy/cx/cy and no distortion)."""
        if cam_out is None:
            cam_out = Camera.pinhole(cam_in.width, cam_in.height,
                                     cam_in.fx, cam_in.fy, cam_in.cx,
                                     cam_in.cy)
        self.cam_in = cam_in
        self.cam_out = cam_out
        H, W = cam_out.height, cam_out.width
        yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                              jnp.arange(W, dtype=jnp.float32),
                              indexing="ij")
        uv_out = jnp.stack([xx, yy], -1).reshape(-1, 2)
        rays = cam_out.unproject(uv_out)
        uv_src, valid = cam_in.project(rays)
        self.map_xy = np.asarray(uv_src.reshape(H, W, 2))
        self.valid = np.asarray(valid.reshape(H, W))

    def undistort(self, img: jnp.ndarray) -> jnp.ndarray:
        """Remap one (H, W) image (bilinear; invalid pixels -> 0)."""
        return _remap(jnp.asarray(img), jnp.asarray(self.map_xy),
                      jnp.asarray(self.valid))


@jax.jit
def _remap(img: jnp.ndarray, map_xy: jnp.ndarray,
           valid: jnp.ndarray) -> jnp.ndarray:
    H, W = img.shape
    x = map_xy[..., 0].clip(0.0, W - 1.001)
    y = map_xy[..., 1].clip(0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    out = ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
           + (v10 * (1 - fx) + v11 * fx) * fy)
    return jnp.where(valid, out, 0.0)
