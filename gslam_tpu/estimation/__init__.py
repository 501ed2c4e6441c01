"""Robust multi-view geometry — batched RANSAC on the device.

TPU-native re-design of the reference ``Estimator`` service
(``GSLAM/core/Estimator.h``: 2D-2D 'findHomography' / 'findFundamental' /
'findEssentialMatrix'; 2D-3D PnP RANSAC; 3D-3D 'findSIM3' /
'findAffine3D' / 'findPlane'; 'trianglate' — upstream spelling).  The
default upstream implementation wraps OpenCV's sequential RANSAC; here
RANSAC is *batched*: B minimal samples drawn with Gumbel top-k, B
hypotheses fit with one vmapped SVD, all B x N residuals scored as dense
VPU math, argmax inliers — no data-dependent control flow, one jitted
graph.
"""

from gslam_tpu.estimation.ransac import ransac_sample_indices, run_ransac
from gslam_tpu.estimation.epipolar import (
    find_fundamental, find_essential, decompose_essential, triangulate,
    sampson_distance, essential_from_rt,
)
from gslam_tpu.estimation.homography import find_homography
from gslam_tpu.estimation.pnp import find_pnp_ransac
from gslam_tpu.estimation.alignment import (
    umeyama_alignment, find_sim3, find_affine3d, find_plane,
)
