"""Stereo keyframe SLAM (KITTI odometry path — BASELINE config #3).

KeyframeSLAM with per-keypoint depth sourced from rectified left-right
descriptor matching (gslam_tpu.ops.stereo) instead of a depth image:
metric scale from the stereo baseline, same tracking/mapping/BA backend.
"""

from __future__ import annotations

import jax.numpy as jnp

from gslam_tpu.app.registry import SLAMS
from gslam_tpu.core.camera import Camera
from gslam_tpu.datasets.base import FrameData
from gslam_tpu.models.keyframe_slam import KeyframeSLAM, SLAMConfig
from gslam_tpu.ops.frontend import Features, extract_features
from gslam_tpu.ops.stereo import match_stereo, stereo_depth
from gslam_tpu.utils.timer import timer


class StereoSLAM(KeyframeSLAM):
    def __init__(self, camera: Camera, config: SLAMConfig | None = None,
                 max_disparity: float = 128.0):
        super().__init__(camera, config)
        self.max_disparity = max_disparity

    def _kp_depths(self, frame: FrameData, feats: Features):
        if frame.image_right is None or frame.stereo_baseline <= 0:
            return super()._kp_depths(frame, feats)
        c = self.cfg
        with timer.section("slam/stereo"):
            featsR = extract_features(jnp.asarray(frame.image_right),
                                      max_kps=c.max_kps,
                                      threshold=c.fast_threshold)
            disp, ok = match_stereo(
                feats.desc, feats.valid, feats.uv,
                featsR.desc, featsR.valid, featsR.uv,
                max_disparity=self.max_disparity)
            depth = stereo_depth(disp, ok, self.camera.fx,
                                 frame.stereo_baseline)
            timer.block(depth)
        return jnp.where(jnp.isfinite(depth), depth, 0.0)


@SLAMS.register("stereo")
def _make_stereo(camera: Camera, **kw) -> StereoSLAM:
    voc = kw.pop("vocabulary", None)
    cfg = SLAMConfig(**kw) if kw else None
    slam = StereoSLAM(camera, cfg)
    if voc is not None:
        from gslam_tpu.models.loop_closure import LoopCloser

        slam.loop_closer = LoopCloser(voc, slam.cfg.cap_frames,
                                      use_pallas=slam.cfg.use_pallas)
    return slam
