"""Logging facade.

The reference bundles a mini-glog (``LOG(INFO)/CHECK_*`` macros,
``GSLAM/core/Glog.h``, merged into Svar in 3.x).  Python's stdlib logging
plus ``check_*`` helpers covers the same surface.
"""

from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(levelname).1s%(asctime)s %(name)s] %(message)s"
_configured = False


def get_logger(name: str = "gslam_tpu") -> logging.Logger:
    global _configured
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%m%d %H:%M:%S"))
        root = logging.getLogger("gslam_tpu")
        root.addHandler(handler)
        root.setLevel(os.environ.get("GSLAM_LOGLEVEL", "INFO"))
        root.propagate = False
        _configured = True
    return logging.getLogger(name)


def check(cond: bool, msg: str = "") -> None:
    """``CHECK()`` analog: raise on failure instead of aborting."""
    if not cond:
        raise AssertionError(f"CHECK failed: {msg}")


def check_eq(a, b, msg: str = "") -> None:
    if a != b:
        raise AssertionError(f"CHECK_EQ failed: {a!r} != {b!r} {msg}")


def check_near(a, b, tol: float = 1e-6, msg: str = "") -> None:
    if abs(a - b) > tol:
        raise AssertionError(f"CHECK_NEAR failed: |{a!r} - {b!r}| > {tol} {msg}")
