"""Image container helpers — the GImage analog.

The reference's ``GImage`` (``GSLAM/core/GImage.h``) is a ``cv::Mat``
workalike: elem-type codes, refcounted shallow share, ``clone()``,
zero-copy cv::Mat interop — it exists so the C++ core avoids a hard OpenCV
dependency.  In the TPU design images are plain arrays (numpy on host,
jnp on device), which already give shallow sharing (array views / device
buffers) and cheap clone; what survives here is the *type-code vocabulary*
(so dataset/serialization code can speak cv-style codes), dtype helpers,
and explicit host<->device movement with a standard layout:

* grayscale: (H, W) float32 in [0, 1] on device; uint8 on host/disk;
* color:     (H, W, 3) RGB uint8 on host; float32 on device when needed;
* depth:     (H, W) float32 meters.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

# cv-style elem type codes: code = depth + 8 * (channels - 1)
_DEPTH_TO_DTYPE = {
    0: np.uint8, 1: np.int8, 2: np.uint16, 3: np.int16,
    4: np.int32, 5: np.float32, 6: np.float64,
}
_DTYPE_TO_DEPTH = {np.dtype(v): k for k, v in _DEPTH_TO_DTYPE.items()}


def type_code(dtype, channels: int = 1) -> int:
    """(dtype, channels) -> cv-style code; GImageType<uchar,1> == CV_8UC1 == 0."""
    return _DTYPE_TO_DEPTH[np.dtype(dtype)] + 8 * (channels - 1)


def decode_type(code: int) -> Tuple[np.dtype, int]:
    return np.dtype(_DEPTH_TO_DTYPE[code % 8]), code // 8 + 1


def channels(img: np.ndarray) -> int:
    return 1 if img.ndim == 2 else img.shape[2]


def to_gray_f32(img: np.ndarray) -> np.ndarray:
    """Any host image -> (H, W) float32 in [0, 1] (BT.601 luma for color)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        scale = 1.0 / 255.0
    elif img.dtype == np.uint16:
        scale = 1.0 / 65535.0
    else:
        scale = 1.0
    if img.ndim == 3:
        img = (0.299 * img[..., 0] + 0.587 * img[..., 1]
               + 0.114 * img[..., 2])
    return (img * scale).astype(np.float32)


def to_device(img: np.ndarray, pad_to: Optional[Tuple[int, int]] = None
              ) -> jnp.ndarray:
    """Host gray f32 image -> device array, optionally zero-padded to a
    fixed (H, W) so the jitted per-frame step keeps a static shape."""
    x = np.asarray(img, np.float32)
    if pad_to is not None:
        H, W = pad_to
        out = np.zeros((H, W), np.float32)
        out[:min(H, x.shape[0]), :min(W, x.shape[1])] = \
            x[:H, :W]
        x = out
    return jnp.asarray(x)


def clone(img: np.ndarray) -> np.ndarray:
    """Deep copy (reference GImage::clone)."""
    return np.array(img, copy=True)
