"""Messenger-wired SLAM pipeline (reference 3.x dataflow).

In GSLAM 3.x the SLAM plugin subscribes to the dataset frame topic and
publishes current-frame / map-update messages that evaluation and
visualization consume (SURVEY 3.2).  This wires our SLAM systems the
same way: `SLAMPipeline` subscribes to `dataset/frame`, tracks, and
publishes:

    slam/curframe   {"id", "timestamp", "pose" (7,) cam->world, stats}
    slam/map        the MapArena pytree (on keyframe insertion)
    slam/eos        final summary when the dataset signals end-of-stream

Combined with DatasetPlayer this reproduces the reference's wiring:
player thread -> bus -> SLAM -> bus -> eval/viz subscribers.
"""

from __future__ import annotations

import threading
from typing import Any, Dict, Optional

import numpy as np

from gslam_tpu.app.messenger import Messenger, messenger as global_bus
from gslam_tpu.datasets.base import EOS_TOPIC, FRAME_TOPIC, FrameData

CURFRAME_TOPIC = "slam/curframe"
MAP_TOPIC = "slam/map"
SLAM_EOS_TOPIC = "slam/eos"


class SLAMPipeline:
    """Subscribes a SLAM system to the dataset topic (queued, ordered)."""

    def __init__(self, slam, bus: Optional[Messenger] = None,
                 queue_size: int = 8):
        self.slam = slam
        self.bus = bus or global_bus
        self.done = threading.Event()
        self._n_kf_last = -1
        self._sub_frame = self.bus.subscribe(FRAME_TOPIC, queue_size,
                                             self._on_frame)
        self._sub_eos = self.bus.subscribe(EOS_TOPIC, 0, self._on_eos)

    def _on_frame(self, frame: FrameData) -> None:
        pose = self.slam.track(frame)
        msg: Dict[str, Any] = {
            "id": frame.id,
            "timestamp": frame.timestamp,
            "pose": np.asarray(pose),
        }
        if self.slam.stats:
            msg.update(self.slam.stats[-1])
        self.bus.publish(CURFRAME_TOPIC, msg)
        arena = getattr(self.slam, "arena", None)
        if arena is not None:
            n_kf = int(arena.n_frames)
            if n_kf != self._n_kf_last:
                self._n_kf_last = n_kf
                self.bus.publish(MAP_TOPIC, arena)

    def _on_eos(self, msg: Any) -> None:
        # drain our own frame queue before declaring completion
        self._sub_frame.flush(timeout=60.0)
        self.bus.publish(SLAM_EOS_TOPIC, {
            "frames": len(self.slam.trajectory),
            "positions": self.slam.positions(),
            "timestamps": np.asarray(self.slam.timestamps),
        })
        self.done.set()

    def wait(self, timeout: Optional[float] = None) -> bool:
        return self.done.wait(timeout)

    def shutdown(self) -> None:
        self._sub_frame.shutdown()
        self._sub_eos.shutdown()
