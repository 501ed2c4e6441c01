"""Effective-placement probe shared by every Pallas auto-enable gate.

The kernels in :mod:`gslam_tpu.ops.pallas` use TPU-only Mosaic memory
spaces (``pltpu.VMEM`` block specs): they lower on TPU and nowhere
else, so auto-enable must gate on the platform being *exactly* ``tpu``
— not merely "not cpu" (a CUDA/ROCm backend would crash on the first
kernel launch).

The probe reads the *effective default placement*, not the backend
registry: the test environment pins ``jax_default_device`` to the CPU
client while an accelerator backend stays registered.
"""

from __future__ import annotations

import jax


def effective_platform() -> str:
    dev = jax.config.jax_default_device
    return dev.platform if dev is not None else jax.devices()[0].platform


def pallas_supported() -> bool:
    """True iff Mosaic kernels can lower for the effective placement."""
    return effective_platform() == "tpu"
