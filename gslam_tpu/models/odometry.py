"""Frame-to-frame visual odometry — the minimum end-to-end slice.

BASELINE config #1: "Monocular feature detect+match+PnP odometry".
Per frame: extract (FAST+BRIEF, jitted) -> match vs previous frame
(GEMM Hamming, jitted) -> pose:

* depth mode (RGB-D / synthetic / stereo-derived depth): previous
  frame's matched keypoints are unprojected with depth to 3D, current
  pose solved by batched PnP RANSAC + GN refine — metric scale.
* mono mode: essential-matrix RANSAC + cheirality decomposition;
  translation scale fixed to a constant per step (|t| = scale_hint) —
  trajectory is up-to-scale (ATE evaluated with Sim3 alignment).

The whole device path is three jitted graphs with static shapes; the
host only chains poses.  Reference analog: a minimal SLAM plugin's
tracking front half (SURVEY 3.2) without mapping.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gslam_tpu.app.registry import SLAMS
from gslam_tpu.core.camera import Camera
from gslam_tpu.core.se3 import se3_identity, se3_inverse, se3_mul
from gslam_tpu.datasets.base import FrameData
from gslam_tpu.estimation.init2view import two_view_geometry
from gslam_tpu.estimation.pnp import find_pnp_ransac
from gslam_tpu.ops.frontend import Features, extract_features
from gslam_tpu.ops.matching import match_descriptors
from gslam_tpu.utils.timer import timer


class FrameToFrameOdometry:
    """Reference 'SLAM' contract: track(frame) -> pose (cam->world)."""

    def __init__(self, camera: Camera, max_kps: int = 512,
                 fast_threshold: float = 0.06, scale_hint: float = 0.1,
                 seed: int = 0):
        self.camera = camera
        self.max_kps = max_kps
        self.fast_threshold = fast_threshold
        self.scale_hint = scale_hint
        self.key = jax.random.PRNGKey(seed)
        self.prev: Optional[Features] = None
        self.prev_depth: Optional[np.ndarray] = None
        self.pose_wc = se3_identity()  # cam->world of last frame
        self.trajectory: List[np.ndarray] = []
        self.timestamps: List[float] = []
        self.stats: List[dict] = []

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def track(self, frame: FrameData) -> np.ndarray:
        with timer.section("odom/extract"):
            feats = extract_features(jnp.asarray(frame.image),
                                     max_kps=self.max_kps,
                                     threshold=self.fast_threshold)
            timer.block(feats)
        n_matches = 0
        n_inliers = 0
        if self.prev is not None:
            with timer.section("odom/match"):
                m = match_descriptors(self.prev.desc, self.prev.valid,
                                      feats.desc, feats.valid)
                timer.block(m)
            n_matches = int(m.count)
            if n_matches >= 12:
                T_rel = self._relative_pose(m, feats)
                if T_rel is not None:
                    T_rel, n_inliers = T_rel
                    # T_rel: prev_cam -> cur_cam; chain cam->world
                    self.pose_wc = se3_mul(self.pose_wc,
                                           se3_inverse(T_rel))
        self.prev = feats
        self.prev_depth = frame.depth
        self.trajectory.append(np.asarray(self.pose_wc))
        self.timestamps.append(frame.timestamp)
        self.stats.append({"n_features": int(feats.count),
                           "n_matches": n_matches,
                           "n_inliers": int(n_inliers)})
        return np.asarray(self.pose_wc)

    def _relative_pose(self, m, feats):
        """Matched prev->cur; returns (T prev_cam->cur_cam, inliers)."""
        uv_prev = self.prev.uv
        uv_cur = feats.uv[m.idx.clip(0)]
        valid = m.valid
        rays_prev = self.camera.unproject(uv_prev)[:, :2]
        rays_cur = self.camera.unproject(uv_cur)[:, :2]

        if self.prev_depth is not None:
            # PnP with metric depth from the previous frame
            xi = uv_prev[:, 0].astype(jnp.int32).clip(
                0, self.prev_depth.shape[1] - 1)
            yi = uv_prev[:, 1].astype(jnp.int32).clip(
                0, self.prev_depth.shape[0] - 1)
            d = jnp.asarray(self.prev_depth)[yi, xi]
            ok = valid & (d > 1e-3) & jnp.isfinite(d)
            rays3 = self.camera.unproject(uv_prev)
            pts3 = rays3 / rays3[:, 2:3] * d[:, None]  # prev cam frame
            with timer.section("odom/pnp"):
                T, inl, n = find_pnp_ransac(
                    self._next_key(), pts3, rays_cur, ok,
                    threshold=2e-5)
                timer.block(T)
            if int(n) >= 10:
                return T, int(n)
            return None
        # mono: two-view geometry with H/E model selection (planar-safe)
        with timer.section("odom/essential"):
            tv = two_view_geometry(self._next_key(), rays_prev,
                                   rays_cur, valid,
                                   sigma=1.0 / float(self.camera.fx))
            timer.block(tv.T_21)
        n = tv.n_inliers
        if int(n) < 10:
            return None
        T21 = tv.T_21
        t = T21[:3]
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9) * self.scale_hint
        return T21.at[:3].set(t), int(n)

    # -- evaluation helpers -------------------------------------------------
    def positions(self) -> np.ndarray:
        return np.stack([p[:3] for p in self.trajectory]) \
            if self.trajectory else np.zeros((0, 3))


@SLAMS.register("odometry")
def _make_odometry(camera: Camera, **kw) -> FrameToFrameOdometry:
    return FrameToFrameOdometry(camera, **kw)
