"""Nonlinear optimization backend: BA with Schur complement, motion-only
refinement, pose-graph optimization, robust kernels.

TPU-native re-design of the reference ``Optimizer`` service
(``GSLAM/core/Optimizer.h``: 'BundleGraph' with 'KeyFrameEstimzation' /
'MapPointEstimation' / 'BundleEdge' structs, optimize() for local/global
BA, optimizePose motion-only, pose-graph over SE3/SIM3 edges, robust
kernels, LM config via Svar).  The upstream default implementation is a
CPU LM/graph solver plugin; here the entire LM iteration is one jitted
graph: batched analytic Jacobians, per-point 3x3 landmark elimination,
and the reduced camera system formed as ONE dense GEMM
(S = Hcc - W Hpp^-1 W^T with W kept dense in block layout — MXU work),
solved by Cholesky.  Landmark-sharded distribution of the same reduction
lives in :mod:`gslam_tpu.parallel`.
"""

from gslam_tpu.opt.robust import huber_weight, cauchy_weight, tukey_weight
from gslam_tpu.opt.ba import (
    BundleProblem, bundle_adjust, build_problem_from_arena, ba_cost,
    write_back_to_arena, global_bundle_adjust,
)
from gslam_tpu.opt.pose_graph import PoseGraph, optimize_pose_graph
