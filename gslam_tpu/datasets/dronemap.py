"""Drone-mapping dataset (reference NPU DroneMap / RTMapper analogs).

Layout (``<seq>.dronemap`` -> directory):
    images/  frame images (sorted by name)
    gps.txt  "t lat lon alt [yaw_deg]" per frame (1:1 with images)
    calib.txt  "fx fy cx cy [k1 k2 p1 p2 k3]"
GPS is attached per frame and also converted to a local-ENU ground-truth
trajectory (first fix = origin) so the eval harness can gate aerial runs
(the reference evaluates DroneMap sequences with GPS as reference).
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from gslam_tpu.app.registry import DATASETS
from gslam_tpu.core import gps as gps_mod
from gslam_tpu.core.image import to_gray_f32
from gslam_tpu.datasets.base import Dataset, FrameData
from gslam_tpu.datasets.video import _camera_for


class DroneMapDataset(Dataset):
    def _open(self, path: str) -> bool:
        root = path[:-len(".dronemap")] if path.endswith(".dronemap") \
            else path
        img_dir = os.path.join(root, "images")
        if not os.path.isdir(img_dir):
            return False
        pats = ("*.png", "*.jpg", "*.jpeg")
        self.files = sorted(f for p in pats
                            for f in glob.glob(os.path.join(img_dir, p)))
        if not self.files:
            return False
        self.gps = np.zeros((0, 4))
        gpath = os.path.join(root, "gps.txt")
        if os.path.isfile(gpath):
            rows = []
            with open(gpath) as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    v = [float(x) for x in line.split()]
                    rows.append(v[:4])
            self.gps = np.asarray(rows)
        from PIL import Image

        with Image.open(self.files[0]) as im:
            W, H = im.size
        self.camera = _camera_for(root, W, H)
        # ENU ground truth from GPS (origin = first fix)
        self.enu: Optional[np.ndarray] = None
        if len(self.gps):
            origin = self.gps[0, 1:4]
            self.enu = np.asarray(gps_mod.lla_to_enu_np(
                self.gps[:, 1:4], origin), np.float32)
        return True

    def _length(self) -> int:
        return len(self.files)

    def _grab(self, idx: int) -> Optional[FrameData]:
        if idx >= len(self.files):
            return None
        from PIL import Image

        arr = np.asarray(Image.open(self.files[idx]))
        t = self.gps[idx, 0] if idx < len(self.gps) else idx / 10.0
        gt = None
        if self.enu is not None and idx < len(self.enu):
            # position-only GT (identity orientation)
            gt = np.concatenate([self.enu[idx],
                                 [1.0, 0.0, 0.0, 0.0]]).astype(np.float32)
        return FrameData(
            id=idx, timestamp=float(t), image=to_gray_f32(arr),
            camera=self.camera,
            color=arr if arr.ndim == 3 else None,
            gps=self.gps[idx] if idx < len(self.gps) else None,
            gt_pose=gt)


@DATASETS.register("dronemap")
def _make_dronemap() -> DroneMapDataset:
    return DroneMapDataset()


# RTMapper files (reference ``.rtm``) are DroneMap-layout directories in
# this framework; register the extension for CLI parity.
DATASETS.register("rtm")(DroneMapDataset)
