"""Direct (photometric) odometry — the SVO/DSO model-family analog.

The reference integrates *direct* SLAM systems (SVO, DSO) as plugins
through its SLAM contract (``GSLAM/core/GSLAM.h``; SURVEY section 2 row
23 lists the out-of-tree wrapper family).  Those are CPU sparse-patch
methods with per-pixel pointer chasing; the TPU re-design tracks a
fixed-size slab of high-gradient pixels with coarse-to-fine photometric
Gauss-Newton where every stage is a dense batched op:

* keyframe: top-K gradient-magnitude pixels with valid depth (one
  ``top_k`` over the gradient image), back-projected once to a static
  (K, 3) point slab in keyframe-camera coordinates; reference
  intensities pre-sampled per pyramid level;
* tracking: per level (coarse -> fine) a ``lax.scan`` of GN iterations —
  warp the slab with the current SE3, bilinear-gather intensity +
  gradient, Huber-weighted 6x6 normal equations, left-multiplicative
  update.  One jitted function per level shape; no data-dependent
  control flow on device.

Depth comes from the frame (RGB-D / synthetic / stereo-derived), i.e.
this is a DVO-style direct odometry; monocular depth bootstrap is the
feature pipeline's job (models/keyframe_slam).

RGB-D dense mode (``use_depth_residual``): adds the geometric residual
``z_warp - D_cur(u, v)`` with analytic Jacobian — the photometric +
geometric DVO/KinectFusion-family formulation — so tracking stays
constrained through textureless regions where intensity gradients
vanish.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gslam_tpu.app.registry import SLAMS
from gslam_tpu.core.camera import Camera
from gslam_tpu.core.se3 import (se3_apply, se3_exp, se3_identity,
                                se3_inverse, se3_mul)
from gslam_tpu.datasets.base import FrameData
from gslam_tpu.ops.frontend import _bilinear, gaussian_blur, image_pyramid
from gslam_tpu.opt.robust import huber_weight
from gslam_tpu.utils.timer import timer


@dataclasses.dataclass
class DirectConfig:
    n_points: int = 1024       # tracked high-gradient pixels
    n_levels: int = 3
    scale: float = 2.0
    gn_iters: int = 12         # per level
    blur_sigma: float = 1.2
    huber_delta: float = 0.08  # intensity units ([0,1] images)
    min_depth: float = 0.05
    max_depth: float = 1e3
    kf_overlap: float = 0.6    # new keyframe below this valid fraction
    kf_max_gap: int = 8
    min_valid_frac: float = 0.25  # below: tracking lost, coast
    # RGB-D dense mode: add the geometric residual z_warp - D_cur(u,v)
    # (DVO-style photometric + geometric) when frames carry depth.
    use_depth_residual: bool = True
    depth_weight: float = 10.0   # lambda: (sigma_I / sigma_D)^2
    huber_depth: float = 0.10    # meters


def _gradients(img: jnp.ndarray):
    gx = jnp.zeros_like(img)
    gy = jnp.zeros_like(img)
    gx = gx.at[:, 1:-1].set((img[:, 2:] - img[:, :-2]) * 0.5)
    gy = gy.at[1:-1, :].set((img[2:, :] - img[:-2, :]) * 0.5)
    return gx, gy


def _level_intrinsics(cam: Camera, shape, base_shape):
    """Pixel-center-correct intrinsics for a resized level."""
    sy = shape[0] / base_shape[0]
    sx = shape[1] / base_shape[1]
    return (cam.fx * sx, cam.fy * sy,
            (cam.cx + 0.5) * sx - 0.5, (cam.cy + 0.5) * sy - 0.5)


@partial(jax.jit, static_argnames=("iters", "fx", "fy", "cx", "cy",
                                   "huber", "use_depth", "huber_d"))
def _align_level(img, gx, gy, X, I_ref, valid, T_init, iters,
                 fx, fy, cx, cy, huber,
                 depth=None, dgx=None, dgy=None, depth_weight=0.0,
                 huber_d: float = 0.1, use_depth: bool = False):
    """GN alignment of point slab X (kf-cam coords) to one pyramid
    level: photometric residual I_cur(warp) - I_ref, plus (RGB-D dense
    mode) the geometric residual z_warp - D_cur(warp) with analytic
    Jacobian dz/dxi - grad(D) . d(u,v)/dxi.  Returns
    (T_ck, valid_frac, mean_abs_photo_residual)."""
    H, W = img.shape

    def residual_system(T):
        pc = se3_apply(T, X)
        x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
        front = z > 1e-3
        iz = 1.0 / jnp.where(front, z, 1.0)
        u = fx * x * iz + cx
        v = fy * y * iz + cy
        inb = (front & valid & (u >= 1.0) & (u <= W - 2.0)
               & (v >= 1.0) & (v <= H - 2.0))
        Ic = _bilinear(img, u, v)
        gu = _bilinear(gx, u, v)
        gv = _bilinear(gy, u, v)
        r = Ic - I_ref
        iz2 = iz * iz
        zero = jnp.zeros_like(x)
        Ju = fx * jnp.stack([iz, zero, -x * iz2, -x * y * iz2,
                             1.0 + x * x * iz2, -y * iz], -1)
        Jv = fy * jnp.stack([zero, iz, -y * iz2, -(1.0 + y * y * iz2),
                             x * y * iz2, x * iz], -1)
        J = gu[:, None] * Ju + gv[:, None] * Jv          # (K, 6)
        w = huber_weight(jnp.abs(r), huber) * inb
        out = [(r, J, w)]
        if use_depth:
            # nearest sampling: bilinear across a depth discontinuity
            # invents phantom surfaces; gate out discontinuities and
            # gross disagreements entirely (standard DVO practice —
            # they also dominate with sparse/structured-light depth)
            ui = jnp.round(u).astype(jnp.int32).clip(0, W - 1)
            vi = jnp.round(v).astype(jnp.int32).clip(0, H - 1)
            Dc = depth[vi, ui]
            du = dgx[vi, ui]
            dv_ = dgy[vi, ui]
            r_d = z - Dc
            d_ok = (inb & (Dc > 1e-3) & jnp.isfinite(Dc)
                    & jnp.isfinite(du) & jnp.isfinite(dv_)
                    & (du * du + dv_ * dv_ < 0.25)
                    & (jnp.abs(r_d) < 0.5))
            # gated values must be SCRUBBED, not just zero-weighted:
            # NaN depth would poison the normal equations via NaN*0
            r_d = jnp.where(d_ok, r_d, 0.0)
            du = jnp.where(d_ok, du, 0.0)
            dv_ = jnp.where(d_ok, dv_, 0.0)
            # dz/dxi (left twist): [0, 0, 1, y, -x, 0]
            Jz = jnp.stack([zero, zero, jnp.ones_like(x), y, -x, zero],
                           -1)
            J_d = Jz - du[:, None] * Ju - dv_[:, None] * Jv
            w_d = (depth_weight * huber_weight(jnp.abs(r_d), huber_d)
                   * d_ok)
            out.append((r_d, J_d, w_d))
        return out, inb

    def gn_step(T, _):
        terms, _ = residual_system(T)
        Hm = 1e-6 * jnp.eye(6)
        b = jnp.zeros(6)
        for r, J, w in terms:
            Jw = J * w[:, None]
            Hm = Hm + Jw.T @ J
            b = b + Jw.T @ r
        dx = -jnp.linalg.solve(Hm, b)
        return se3_mul(se3_exp(dx), T), None

    T, _ = jax.lax.scan(gn_step, T_init, None, length=iters)
    terms, inb = residual_system(T)
    r = terms[0][0]
    n = jnp.maximum(inb.sum(), 1)
    frac = inb.sum() / jnp.maximum(valid.sum(), 1)
    err = jnp.sum(jnp.where(inb, jnp.abs(r), 0.0)) / n
    return T, frac, err


@partial(jax.jit, static_argnames=("n_points", "min_depth", "max_depth",
                                   "fx", "fy", "cx", "cy"))
def _select_points(img, depth, n_points, min_depth, max_depth,
                   fx, fy, cx, cy):
    """Top-K gradient pixels with valid depth -> (X_kf (K,3), valid)."""
    gx, gy = _gradients(img)
    mag = gx * gx + gy * gy
    H, W = img.shape
    dok = (depth > min_depth) & (depth < max_depth) & jnp.isfinite(depth)
    # keep away from the border so bilinear gathers stay in-bounds
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    edge = (xx >= 2) & (xx < W - 2) & (yy >= 2) & (yy < H - 2)
    score = jnp.where(dok & edge, mag, -1.0).reshape(-1)
    val, idx = jax.lax.top_k(score, n_points)
    u = (idx % W).astype(jnp.float32)
    v = (idx // W).astype(jnp.float32)
    z = depth.reshape(-1)[idx]
    X = jnp.stack([(u - cx) / fx * z, (v - cy) / fy * z, z], -1)
    return X, val > 0.0


class DirectOdometry:
    """Reference SLAM contract (valid()/track(frame)) — direct method."""

    def __init__(self, camera: Camera,
                 config: Optional[DirectConfig] = None):
        self.camera = camera
        self.cfg = config or DirectConfig()
        self.pose_wc = se3_identity()
        self.velocity = se3_identity()       # T_c(t) <- c(t-1)
        self.kf_pose_cw = None               # (7,) of current keyframe
        self.kf_X = None                     # (K, 3) kf-cam points
        self.kf_valid = None
        self.kf_refs: List[jnp.ndarray] = []  # per-level intensities
        self.kf_shapes: List[tuple] = []
        self.frames_since_kf = 0
        self.trajectory: List[np.ndarray] = []
        self.timestamps: List[float] = []
        self.stats: List[dict] = []

    def valid(self) -> bool:
        return True

    # ------------------------------------------------------------------
    def _pyramid(self, image: np.ndarray):
        img = gaussian_blur(jnp.asarray(image), sigma=self.cfg.blur_sigma,
                            radius=3)
        return image_pyramid(img, n_levels=self.cfg.n_levels,
                             scale=self.cfg.scale)

    def _make_keyframe(self, frame: FrameData, pyr) -> bool:
        c = self.cfg
        if frame.depth is None:
            return False
        base = pyr[0].shape
        X, ok = _select_points(pyr[0], jnp.asarray(frame.depth),
                               c.n_points, c.min_depth, c.max_depth,
                               self.camera.fx, self.camera.fy,
                               self.camera.cx, self.camera.cy)
        self.kf_X, self.kf_valid = X, ok
        self.kf_refs = []
        self.kf_shapes = []
        for lvl in pyr:
            fxl, fyl, cxl, cyl = _level_intrinsics(self.camera,
                                                   lvl.shape, base)
            z = X[:, 2]
            u = fxl * X[:, 0] / z + cxl
            v = fyl * X[:, 1] / z + cyl
            self.kf_refs.append(_bilinear(lvl, u, v))
            self.kf_shapes.append(lvl.shape)
        self.kf_pose_cw = se3_inverse(self.pose_wc)
        self.frames_since_kf = 0
        return True

    # ------------------------------------------------------------------
    def track(self, frame: FrameData) -> np.ndarray:
        c = self.cfg
        with timer.section("direct/pyramid"):
            pyr = self._pyramid(frame.image)
            timer.block(pyr[0])

        frac = 0.0
        err = 0.0
        if self.kf_X is None:
            self._make_keyframe(frame, pyr)
        else:
            # init: constant velocity in the current-camera chain
            # T_c(t-1)<-kf = T_c(t-1)<-w o T_w<-kf
            T_ck_prev = se3_mul(se3_inverse(self.pose_wc),
                                se3_inverse(self.kf_pose_cw))
            T = se3_mul(self.velocity, T_ck_prev)
            base = self.kf_shapes[0]
            use_d = c.use_depth_residual and frame.depth is not None
            with timer.section("direct/align"):
                for li in range(len(pyr) - 1, -1, -1):
                    lvl = pyr[li]
                    gx, gy = _gradients(lvl)
                    fxl, fyl, cxl, cyl = _level_intrinsics(
                        self.camera, lvl.shape, base)
                    dl = dgx = dgy = None
                    if use_d:
                        # nearest resize: bilinear would blur depth
                        # discontinuities into phantom surfaces
                        dl = jax.image.resize(jnp.asarray(frame.depth),
                                              lvl.shape, "nearest")
                        dgx, dgy = _gradients(dl)
                    T, fr, er = _align_level(
                        lvl, gx, gy, self.kf_X, self.kf_refs[li],
                        self.kf_valid, T, c.gn_iters,
                        fxl, fyl, cxl, cyl, c.huber_delta,
                        depth=dl, dgx=dgx, dgy=dgy,
                        depth_weight=c.depth_weight,
                        huber_d=c.huber_depth, use_depth=use_d)
                frac, err = float(fr), float(er)
                timer.block(T)
            if frac >= c.min_valid_frac:
                pose_cw = se3_mul(T, self.kf_pose_cw)
                self.velocity = se3_mul(pose_cw, self.pose_wc)
                self.pose_wc = se3_inverse(pose_cw)
                self.frames_since_kf += 1
                if (frac < c.kf_overlap
                        or self.frames_since_kf >= c.kf_max_gap):
                    self._make_keyframe(frame, pyr)
            else:
                # lost: coast on the motion model, re-anchor
                self.pose_wc = se3_inverse(se3_mul(
                    self.velocity, se3_inverse(self.pose_wc)))
                self._make_keyframe(frame, pyr)

        self.trajectory.append(np.asarray(self.pose_wc))
        self.timestamps.append(frame.timestamp)
        self.stats.append({"n_features": int(c.n_points),
                           "n_matches": int(frac * c.n_points),
                           "n_inliers": int(frac * c.n_points),
                           "photo_err": err})
        return np.asarray(self.pose_wc)

    def positions(self) -> np.ndarray:
        return np.stack([p[:3] for p in self.trajectory]) \
            if self.trajectory else np.zeros((0, 3))


@SLAMS.register("direct")
def _make_direct(camera: Camera, **kw) -> DirectOdometry:
    kw.pop("vocabulary", None)  # direct method: no BoW stage
    kw = {k: v for k, v in kw.items()
          if k in DirectConfig.__dataclass_fields__}
    cfg = DirectConfig(**kw) if kw else None
    return DirectOdometry(camera, cfg)
