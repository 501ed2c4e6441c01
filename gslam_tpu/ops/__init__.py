"""Device ops: the framework's hot loops, TPU-first.

These are the kernels the reference delegates to C++/SIMD plugin code
(ORB-style frontend; Hamming matching; vocabulary transform — SURVEY.md
section 2 rows 16-18 and the feature frontend of SLAM plugins).  Each op
has a pure-jnp implementation (`*_ref` semantics, XLA-fused, MXU-friendly
formulations: moments as convolutions, Hamming distance as a +/-1 GEMM,
covisibility as a Gram matrix) and, for the hottest, a Pallas kernel in
:mod:`gslam_tpu.ops.pallas` gold-tested against the jnp version.
"""

from gslam_tpu.ops.frontend import (
    gaussian_blur, image_pyramid, fast_score, nms, select_keypoints,
    orientation_map, compute_orientations, brief_pattern,
    brief_descriptors, extract_features, extract_features_pyramid,
    Features,
)
from gslam_tpu.ops.matching import (
    unpack_descriptors, hamming_matrix, match_descriptors, match_frames,
)
