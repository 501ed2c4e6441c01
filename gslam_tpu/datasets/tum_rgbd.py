"""TUM RGB-D dataset player (reference DatasetTUMRGBD analog).

Format (public TUM RGB-D benchmark layout):
    <seq>/rgb.txt        "# comments" then "timestamp rgb/<t>.png"
    <seq>/depth.txt      "timestamp depth/<t>.png" (16-bit, /5000 m)
    <seq>/groundtruth.txt "t tx ty tz qx qy qz qw" (cam->world)
A ``.tumrgbd`` dataset path points at the sequence directory (the
extension selects this player, the stem is the directory), e.g.
``/data/fr1_desk.tumrgbd`` with the sequence in ``/data/fr1_desk/``; a
bare directory containing rgb.txt also opens.  RGB and depth are
associated by nearest timestamp (<= 20 ms), GT attached likewise.

Default camera: the benchmark's published Freiburg-1 intrinsics
(fx 517.3 fy 516.5 cx 318.6 cy 255.3 + radtan distortion), overridable
with a ``calib.txt`` holding "fx fy cx cy [k1 k2 p1 p2 k3]".
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from gslam_tpu.app.registry import DATASETS
from gslam_tpu.core.camera import Camera
from gslam_tpu.core.image import to_gray_f32
from gslam_tpu.datasets.base import Dataset, FrameData

DEPTH_SCALE = 5000.0  # 16-bit depth units per meter


def _read_list(path: str) -> List[Tuple[float, str]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1]))
    return out


def read_trajectory(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """groundtruth.txt -> (timestamps (N,), poses (N, 7) [t, q wxyz])."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            ts.append(v[0])
            # file order: tx ty tz qx qy qz qw -> ours [t, qw qx qy qz]
            poses.append([v[1], v[2], v[3], v[7], v[4], v[5], v[6]])
    return np.asarray(ts), np.asarray(poses, np.float32)


def _imread(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path))


def imread_gray_f32(path: str) -> np.ndarray:
    """Grayscale f32 decode, native C++ fast path with PIL fallback."""
    from gslam_tpu.datasets import native_loader

    if native_loader.available():
        out = native_loader.decode_gray_f32(path)
        if out is not None:
            return out
    from gslam_tpu.core.image import to_gray_f32

    return to_gray_f32(_imread(path))


def _nearest(ts_list: np.ndarray, t: float, max_dt: float
             ) -> Optional[int]:
    if len(ts_list) == 0:
        return None
    i = int(np.argmin(np.abs(ts_list - t)))
    return i if abs(ts_list[i] - t) <= max_dt else None


class TUMRGBDDataset(Dataset):
    def _open(self, path: str) -> bool:
        root = path[:-len(".tumrgbd")] if path.endswith(".tumrgbd") else path
        if not os.path.isfile(os.path.join(root, "rgb.txt")):
            return False
        self.root = root
        self.rgb = _read_list(os.path.join(root, "rgb.txt"))
        dpath = os.path.join(root, "depth.txt")
        self.depth = _read_list(dpath) if os.path.isfile(dpath) else []
        self.depth_ts = np.asarray([t for t, _ in self.depth])
        gpath = os.path.join(root, "groundtruth.txt")
        if os.path.isfile(gpath):
            self.gt_ts, self.gt_poses = read_trajectory(gpath)
        else:
            self.gt_ts = np.zeros(0)
            self.gt_poses = np.zeros((0, 7), np.float32)

        cpath = os.path.join(root, "calib.txt")
        if os.path.isfile(cpath):
            v = [float(x) for x in open(cpath).read().split()]
            if len(v) >= 8:
                self.camera = Camera.opencv(640, 480, *v[:9])
            else:
                self.camera = Camera.pinhole(640, 480, *v[:4])
        else:
            # Freiburg-1 published intrinsics
            self.camera = Camera.opencv(
                640, 480, 517.3, 516.5, 318.6, 255.3,
                0.2624, -0.9531, -0.0054, 0.0026, 1.1633)
        return True

    def _length(self) -> int:
        return len(self.rgb)

    def _grab(self, idx: int) -> Optional[FrameData]:
        if idx >= len(self.rgb):
            return None
        t, rel = self.rgb[idx]
        color = _imread(os.path.join(self.root, rel))
        gray = to_gray_f32(color)
        depth = None
        di = _nearest(self.depth_ts, t, 0.02)
        if di is not None:
            d16 = _imread(os.path.join(self.root, self.depth[di][1]))
            depth = d16.astype(np.float32) / DEPTH_SCALE
        gt = None
        gi = _nearest(self.gt_ts, t, 0.02) if len(self.gt_ts) else None
        if gi is not None:
            gt = self.gt_poses[gi]
        return FrameData(id=idx, timestamp=t, image=gray, camera=self.camera,
                         color=color if color.ndim == 3 else None,
                         depth=depth, gt_pose=gt)


@DATASETS.register("tumrgbd")
def _make_tumrgbd() -> TUMRGBDDataset:
    return TUMRGBDDataset()


class TUMMonoDataset(TUMRGBDDataset):
    """TUM monoVO flavor: images.txt ("t filename"), ATAN camera from
    camera.txt ("fx fy cx cy w" normalized, PTAM convention)."""

    def _open(self, path: str) -> bool:
        root = path[:-len(".tummono")] if path.endswith(".tummono") else path
        ipath = os.path.join(root, "images.txt")
        if not os.path.isfile(ipath):
            return False
        self.root = root
        self.rgb = _read_list(ipath)
        self.depth = []
        self.depth_ts = np.zeros(0)
        self.gt_ts = np.zeros(0)
        self.gt_poses = np.zeros((0, 7), np.float32)
        cpath = os.path.join(root, "camera.txt")
        W, H = 640, 480
        if os.path.isfile(cpath):
            v = [float(x) for x in open(cpath).read().split()[:7]]
            if len(v) >= 7:
                W, H = int(v[5]), int(v[6])
            # normalized fx fy cx cy (PTAM): scale by image size
            self.camera = Camera.atan(W, H, v[0] * W, v[1] * H,
                                      v[2] * W - 0.5, v[3] * H - 0.5, v[4])
        else:
            self.camera = Camera.from_fov(W, H, 70.0)
        return True


@DATASETS.register("tummono")
def _make_tummono() -> TUMMonoDataset:
    return TUMMonoDataset()
