"""Evaluation harness: trajectory accuracy (ATE/RPE) + resource report.

Re-designs the reference's evaluation module (SURVEY.md section 2 row 26
and 3.5: subscribe to per-frame poses, associate timestamps with ground
truth, Umeyama SE3/SIM3 alignment, ATE RMSE + RPE, plus per-frame
latency / CPU / memory tables — the GSLAM paper's benchmark instrument).
"""

from gslam_tpu.eval.trajectory import (
    associate, align_trajectory, ate_rmse, rpe, TrajectoryMetrics,
    evaluate_trajectory,
)
from gslam_tpu.eval.report import EvalReport
