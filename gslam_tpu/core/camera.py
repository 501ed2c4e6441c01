"""Camera projection models — PinHole, ATAN, OpenCV, OCAM.

Re-designs the reference's ``Camera`` facade over a ``CameraImpl``
hierarchy (``GSLAM/core/Camera.h``: PinHole; ATAN, the PTAM FOV model;
OpenCV radial-tangential k1 k2 p1 p2 k3; OCAM omnidirectional polynomial)
as batched pure functions plus a small host-side ``Camera`` descriptor.

Projection functions map camera-frame 3D points (..., 3) to pixels
(..., 2) plus a validity mask; unprojection maps pixels to unit-depth rays
(..., 3) with z = 1 (except OCAM which returns unit-norm rays).  The model
choice is static per dataset, so dispatch happens at trace time (a Python
``if``), never inside jit.

Parameter packing (first 4 always fx, fy, cx, cy except OCAM):
* pinhole: [fx, fy, cx, cy]
* atan:    [fx, fy, cx, cy, w]           (w = FOV distortion parameter)
* opencv:  [fx, fy, cx, cy, k1, k2, p1, p2, k3]
* ocam:    see OcamParams — Scaramuzza cam2world poly + world2cam inverse
           poly + affine [c, d, e] + center [cx, cy]
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

_EPS = 1e-9

# ---------------------------------------------------------------------------
# pinhole


def pinhole_project(params: jnp.ndarray, p: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    z = p[..., 2]
    valid = z > _EPS
    iz = 1.0 / jnp.where(valid, z, 1.0)
    u = fx * p[..., 0] * iz + cx
    v = fy * p[..., 1] * iz + cy
    return jnp.stack([u, v], axis=-1), valid


def pinhole_unproject(params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


# ---------------------------------------------------------------------------
# ATAN (PTAM FOV model): r_d = atan(2 r tan(w/2)) / w


def atan_project(params: jnp.ndarray, p: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    fx, fy, cx, cy, w = (params[0], params[1], params[2], params[3], params[4])
    z = p[..., 2]
    valid = z > _EPS
    iz = 1.0 / jnp.where(valid, z, 1.0)
    x, y = p[..., 0] * iz, p[..., 1] * iz
    r = jnp.sqrt((x * x + y * y).clip(_EPS * _EPS))
    tan_half = jnp.tan(w / 2.0)
    use_dist = jnp.abs(w) > 1e-6
    factor = jnp.where(
        use_dist,
        jnp.arctan(2.0 * r * tan_half) / (w * r),
        1.0)
    u = fx * factor * x + cx
    v = fy * factor * y + cy
    return jnp.stack([u, v], axis=-1), valid


def atan_unproject(params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    fx, fy, cx, cy, w = (params[0], params[1], params[2], params[3], params[4])
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy
    rd = jnp.sqrt((xd * xd + yd * yd).clip(_EPS * _EPS))
    tan_half = jnp.tan(w / 2.0)
    use_dist = jnp.abs(w) > 1e-6
    factor = jnp.where(use_dist, jnp.tan(rd * w) / (2.0 * rd * tan_half), 1.0)
    return jnp.stack([factor * xd, factor * yd, jnp.ones_like(xd)], axis=-1)


# ---------------------------------------------------------------------------
# OpenCV radial-tangential (k1 k2 p1 p2 k3)


def _opencv_distort(k: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    k1, k2, p1, p2, k3 = k[0], k[1], k[2], k[3], k[4]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return xd, yd


def opencv_project(params: jnp.ndarray, p: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k = params[4:9]
    z = p[..., 2]
    valid = z > _EPS
    iz = 1.0 / jnp.where(valid, z, 1.0)
    xd, yd = _opencv_distort(k, p[..., 0] * iz, p[..., 1] * iz)
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1), valid


def opencv_unproject(params: jnp.ndarray, uv: jnp.ndarray,
                     iters: int = 8) -> jnp.ndarray:
    """Iterative undistortion (fixed iteration count — jit-friendly)."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k = params[4:9]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy
    x, y = xd, yd
    for _ in range(iters):
        xe, ye = _opencv_distort(k, x, y)
        x = x - (xe - xd)
        y = y - (ye - yd)
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


# ---------------------------------------------------------------------------
# OCAM (Scaramuzza omnidirectional)

OCAM_POLY_N = 8      # cam2world polynomial degree bound (padded)
OCAM_INVPOLY_N = 16  # world2cam inverse polynomial degree bound (padded)


def ocam_pack(center: Sequence[float], affine_cde: Sequence[float],
              poly: Sequence[float], inv_poly: Sequence[float]) -> np.ndarray:
    """Pack OCAM calibration into a fixed-length params vector.

    Layout: [cx, cy, c, d, e, poly(OCAM_POLY_N), inv_poly(OCAM_INVPOLY_N)].
    """
    p = np.zeros(5 + OCAM_POLY_N + OCAM_INVPOLY_N, np.float32)
    p[0:2] = center
    p[2:5] = affine_cde
    p[5:5 + len(poly)] = poly
    p[5 + OCAM_POLY_N:5 + OCAM_POLY_N + len(inv_poly)] = inv_poly
    return p


def _polyval(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """sum_i coeffs[i] * x^i (Horner, low-order-first)."""
    acc = jnp.zeros_like(x)
    for c in coeffs[::-1]:
        acc = acc * x + c
    return acc


def ocam_project(params: jnp.ndarray, p: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    cx, cy = params[0], params[1]
    c, d, e = params[2], params[3], params[4]
    inv_poly = params[5 + OCAM_POLY_N:]
    norm = jnp.sqrt((p[..., 0] ** 2 + p[..., 1] ** 2).clip(_EPS * _EPS))
    # angle from optical axis measured as atan2(z, norm) per Scaramuzza
    theta = jnp.arctan2(p[..., 2], norm)
    rho = _polyval(inv_poly, theta)
    xn = p[..., 0] / norm * rho
    yn = p[..., 1] / norm * rho
    u = xn * c + yn * d + cx
    v = xn * e + yn + cy
    valid = jnp.isfinite(u) & jnp.isfinite(v)
    return jnp.stack([u, v], axis=-1), valid


def ocam_unproject(params: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels -> unit-norm rays (OCAM convention; z may be negative)."""
    cx, cy = params[0], params[1]
    c, d, e = params[2], params[3], params[4]
    poly = params[5:5 + OCAM_POLY_N]
    # invert affine [ [c, d], [e, 1] ]
    det = (c - d * e).clip(_EPS)
    up = uv[..., 0] - cx
    vp = uv[..., 1] - cy
    xn = (up - d * vp) / det
    yn = (-e * up + c * vp) / det
    rho = jnp.sqrt((xn * xn + yn * yn).clip(_EPS * _EPS))
    z = _polyval(poly, rho)
    ray = jnp.stack([xn, yn, z], axis=-1)
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True).clip(_EPS)


# ---------------------------------------------------------------------------
# host-side descriptor

_PROJECT = {
    "pinhole": pinhole_project,
    "atan": atan_project,
    "opencv": opencv_project,
    "ocam": ocam_project,
}
_UNPROJECT = {
    "pinhole": pinhole_unproject,
    "atan": atan_unproject,
    "opencv": opencv_unproject,
    "ocam": ocam_unproject,
}


@dataclasses.dataclass(frozen=True)
class Camera:
    """Host-side camera descriptor (reference ``Camera`` facade).

    Constructed from a model name + parameter vector, mirroring the
    reference's name/parameter construction; ``project``/``unproject``
    dispatch statically on the model.
    """

    model: str
    width: int
    height: int
    params: np.ndarray

    def __post_init__(self):
        if self.model not in _PROJECT:
            raise ValueError(f"unknown camera model {self.model!r}; "
                             f"have {sorted(_PROJECT)}")
        object.__setattr__(
            self, "params", np.asarray(self.params, np.float32))

    # -- reference-style constructors --------------------------------------
    @staticmethod
    def pinhole(width: int, height: int, fx: float, fy: float,
                cx: float, cy: float) -> "Camera":
        return Camera("pinhole", width, height, [fx, fy, cx, cy])

    @staticmethod
    def atan(width: int, height: int, fx: float, fy: float, cx: float,
             cy: float, w: float) -> "Camera":
        return Camera("atan", width, height, [fx, fy, cx, cy, w])

    @staticmethod
    def opencv(width: int, height: int, fx: float, fy: float, cx: float,
               cy: float, k1: float = 0, k2: float = 0, p1: float = 0,
               p2: float = 0, k3: float = 0) -> "Camera":
        return Camera("opencv", width, height,
                      [fx, fy, cx, cy, k1, k2, p1, p2, k3])

    @staticmethod
    def ocam(width: int, height: int, center, affine_cde, poly,
             inv_poly) -> "Camera":
        return Camera("ocam", width, height,
                      ocam_pack(center, affine_cde, poly, inv_poly))

    @staticmethod
    def from_fov(width: int, height: int, fov_deg: float) -> "Camera":
        """estimatePinHoleCamera-style helper: pinhole from horizontal FOV."""
        f = width / (2.0 * np.tan(np.radians(fov_deg) / 2.0))
        return Camera.pinhole(width, height, f, f, width / 2.0, height / 2.0)

    # -- operations ---------------------------------------------------------
    def project(self, p: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Camera-frame points (..., 3) -> pixels (..., 2), in-image mask."""
        uv, valid = _PROJECT[self.model](jnp.asarray(self.params), p)
        inside = ((uv[..., 0] >= 0) & (uv[..., 0] < self.width)
                  & (uv[..., 1] >= 0) & (uv[..., 1] < self.height))
        return uv, valid & inside

    def unproject(self, uv: jnp.ndarray) -> jnp.ndarray:
        """Pixels (..., 2) -> rays (..., 3) (z=1, unit-norm for ocam)."""
        return _UNPROJECT[self.model](jnp.asarray(self.params), uv)

    def is_valid(self) -> bool:
        return self.width > 0 and self.height > 0 and len(self.params) >= 4

    # fx/fy/cx/cy accessors are meaningless for ocam
    @property
    def fx(self) -> float:
        return float(self.params[0])

    @property
    def fy(self) -> float:
        return float(self.params[1])

    @property
    def cx(self) -> float:
        return float(self.params[2])

    @property
    def cy(self) -> float:
        return float(self.params[3])

    def K(self) -> np.ndarray:
        """3x3 intrinsic matrix (pinhole-equivalent part)."""
        return np.array([[self.fx, 0, self.cx],
                         [0, self.fy, self.cy],
                         [0, 0, 1]], np.float32)

    def info(self) -> str:
        return (f"{self.model} {self.width}x{self.height} "
                f"params={self.params.tolist()}")
