"""Final evaluation report: the reference benchmark's output table.

Combines trajectory metrics with the Timer stats and memory accounting
so runs are comparable with the reference's published table shape
(ATE/RPE + per-frame ms + CPU% + memory MB; SURVEY section 5.5).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

from gslam_tpu.eval.trajectory import TrajectoryMetrics
from gslam_tpu.utils.metrics import (cpu_percent, device_memory_stats,
                                     host_rss_bytes)
from gslam_tpu.utils.timer import Timer, timer as global_timer


class EvalReport:
    def __init__(self, name: str, traj: Optional[TrajectoryMetrics] = None,
                 timer: Optional[Timer] = None,
                 extra: Optional[Dict[str, Any]] = None):
        self.name = name
        self.traj = traj
        self.timer = timer or global_timer
        self.extra = dict(extra or {})

    def to_dict(self) -> Dict[str, Any]:
        mem = device_memory_stats()
        d: Dict[str, Any] = {
            "sequence": self.name,
            "host_rss_mb": host_rss_bytes() / 1e6,
            "device_hbm_mb": mem.get("bytes_in_use", 0) / 1e6,
            "cpu_percent": cpu_percent(),
            **self.extra,
        }
        if self.traj is not None:
            d.update(ate_rmse=self.traj.ate_rmse,
                     rpe_rmse=self.traj.rpe_rmse,
                     rpe_mean=self.traj.rpe_mean,
                     n_matched=self.traj.n_matched,
                     scale=self.traj.scale)
        d["timing"] = self.timer.stats()
        return d

    def json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=float)

    def table(self) -> str:
        d = self.to_dict()
        lines = [f"=== {self.name} ==="]
        if self.traj is not None:
            lines.append(
                f"ATE RMSE: {d['ate_rmse']:.4f} m   "
                f"RPE RMSE: {d['rpe_rmse']:.4f} m   "
                f"matched: {d['n_matched']}   scale: {d['scale']:.4f}")
        lines.append(f"host RSS: {d['host_rss_mb']:.1f} MB   "
                     f"device HBM: {d['device_hbm_mb']:.1f} MB   "
                     f"CPU: {d['cpu_percent']:.0f}%")
        for k, v in self.extra.items():
            lines.append(f"{k}: {v}")
        lines.append(self.timer.table())
        return "\n".join(lines)
