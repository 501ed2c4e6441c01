"""Plain-video / image-folder datasets (reference CVMono analog).

The reference's CVMono plugin wraps OpenCV VideoCapture for ``.cvmono``
and raw video files.  Here: any video file (cv2/imageio decode) or a
directory of images, with the camera supplied by a sibling
``calib.txt`` ("fx fy cx cy [k1 k2 p1 p2 k3]") or an FOV default.
Registered extensions: cvmono, mp4, avi, mov, imgs.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import numpy as np

from gslam_tpu.app.registry import DATASETS
from gslam_tpu.core.camera import Camera
from gslam_tpu.core.image import to_gray_f32
from gslam_tpu.datasets.base import Dataset, FrameData


def _camera_for(root: str, W: int, H: int) -> Camera:
    cpath = os.path.join(root, "calib.txt")
    if os.path.isfile(cpath):
        v = [float(x) for x in open(cpath).read().split()]
        if len(v) >= 9:
            return Camera.opencv(W, H, *v[:9])
        if len(v) >= 4:
            return Camera.pinhole(W, H, *v[:4])
    return Camera.from_fov(W, H, 65.0)


class VideoDataset(Dataset):
    """One video file; frames timestamped by FPS."""

    def _open(self, path: str) -> bool:
        if path.endswith(".cvmono"):
            # .cvmono file contains the actual video path (reference
            # convention: dataset file configures the plugin)
            target = open(path).read().strip()
            if not os.path.isabs(target):
                target = os.path.join(os.path.dirname(path), target)
        else:
            target = path
        if not os.path.isfile(target):
            return False
        import cv2

        self.cap = cv2.VideoCapture(target)
        if not self.cap.isOpened():
            return False
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30.0
        self.n = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
        W = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        H = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.camera = _camera_for(os.path.dirname(target), W, H)
        return True

    def _length(self) -> int:
        return self.n

    def _grab(self, idx: int) -> Optional[FrameData]:
        ok, frame = self.cap.read()
        if not ok:
            return None
        rgb = frame[..., ::-1]  # BGR -> RGB
        return FrameData(id=idx, timestamp=idx / self.fps,
                         image=to_gray_f32(rgb), camera=self.camera,
                         color=np.ascontiguousarray(rgb))


class ImageFolderDataset(Dataset):
    """Directory of images sorted by name; ``<dir>.imgs`` or the dir."""

    def _open(self, path: str) -> bool:
        root = path[:-len(".imgs")] if path.endswith(".imgs") else path
        if not os.path.isdir(root):
            return False
        pats = ("*.png", "*.jpg", "*.jpeg", "*.bmp", "*.ppm", "*.pgm")
        self.files = sorted(f for p in pats
                            for f in glob.glob(os.path.join(root, p)))
        if not self.files:
            return False
        from PIL import Image

        with Image.open(self.files[0]) as im:
            W, H = im.size
        self.camera = _camera_for(root, W, H)
        return True

    def _length(self) -> int:
        return len(self.files)

    def _grab(self, idx: int) -> Optional[FrameData]:
        if idx >= len(self.files):
            return None
        from PIL import Image

        arr = np.asarray(Image.open(self.files[idx]))
        return FrameData(id=idx, timestamp=idx / 30.0,
                         image=to_gray_f32(arr), camera=self.camera,
                         color=arr if arr.ndim == 3 else None)


@DATASETS.register("cvmono")
def _make_cvmono() -> VideoDataset:
    return VideoDataset()


for _ext in ("mp4", "avi", "mov"):
    DATASETS.register(_ext)(VideoDataset)

DATASETS.register("imgs")(ImageFolderDataset)
