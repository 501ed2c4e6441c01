"""Run metrics: per-frame JSON-line emission + device memory accounting.

Replaces the reference's ``MemoryMetric`` (malloc interception,
``GSLAM/core/MemoryMetric.h``) and the per-frame resource capture of its
evaluation module.  On TPU the relevant memory is HBM, reported by
``Device.memory_stats()``; host RSS comes from ``/proc/self/status`` so the
final report table keeps the same columns as the reference benchmark
(per-frame ms, CPU%, memory MB).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, IO, List, Optional


def device_memory_stats() -> Dict[str, int]:
    """Live HBM usage of the first addressable device (bytes), best-effort."""
    import jax

    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


_T_WALL0 = time.perf_counter()
_T_CPU0 = time.process_time()


def cpu_percent() -> float:
    """Mean process CPU utilization since import (%; >100 on
    multithreaded hosts — same semantics as the reference's CPU column
    from its evaluation module)."""
    dw = time.perf_counter() - _T_WALL0
    dc = time.process_time() - _T_CPU0
    return 100.0 * dc / max(dw, 1e-9)


def host_rss_bytes() -> int:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return 0


class MetricsRegistry:
    """Accumulates per-frame metric rows and optionally streams JSON lines.

    Row keys are free-form (track_ms, n_features, n_matches, n_inliers,
    ba_iters, ate_so_far, ...); the eval harness (:mod:`gslam_tpu.eval`)
    consumes the accumulated rows for the final report.
    """

    def __init__(self, stream: Optional[IO[str]] = None):
        self.rows: List[Dict[str, Any]] = []
        self._stream = stream
        self._t0 = time.perf_counter()

    def emit(self, **kv: Any) -> Dict[str, Any]:
        row = {"t": time.perf_counter() - self._t0, **kv}
        self.rows.append(row)
        if self._stream is not None:
            self._stream.write(json.dumps(row) + "\n")
            self._stream.flush()
        return row

    def column(self, key: str) -> List[Any]:
        return [r[key] for r in self.rows if key in r]

    def summary(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {"n_rows": len(self.rows)}
        for key in {k for r in self.rows for k in r} - {"t"}:
            vals = [v for v in self.column(key) if isinstance(v, (int, float))]
            if vals:
                out[key] = {
                    "mean": sum(vals) / len(vals),
                    "min": min(vals),
                    "max": max(vals),
                    "count": len(vals),
                }
        return out
