"""Math & geometry core: Lie groups, camera models, geodesy, image helpers.

TPU-native replacement for the reference's L1 layer
(``GSLAM/core/Point.h``, ``SO3.h``, ``SE3.h``, ``SIM3.h``, ``Camera.h``,
``GPS.h``): instead of templated C++ value types, every transform is a
packed jnp array in the last axis and every operation is a pure function
that broadcasts over arbitrary leading batch dimensions — so a whole arena
of keyframe poses composes/projects in one fused XLA op.

Conventions (used everywhere in gslam_tpu):
* quaternion: shape (..., 4), order (w, x, y, z), unit norm;
* SE3:  shape (..., 7)  = [tx, ty, tz, qw, qx, qy, qz];
* SIM3: shape (..., 8)  = [tx, ty, tz, qw, qx, qy, qz, s]  (scale s > 0);
* twists: se3 tangent (..., 6) = [rho(3), phi(3)] (translation first),
  sim3 tangent (..., 7) = [rho(3), phi(3), sigma];
* points: (..., 3) row vectors; transforms act on the left: ``y = T * x``.
"""

from gslam_tpu.core import so3, se3, sim3, camera, gps, image  # noqa: F401
from gslam_tpu.core.so3 import (
    quat_identity, quat_mul, quat_conj, quat_normalize, quat_rotate,
    so3_exp, so3_log, quat_to_matrix, matrix_to_quat,
)
from gslam_tpu.core.se3 import (
    se3_identity, se3_mul, se3_inverse, se3_apply, se3_exp, se3_log,
    se3_to_matrix, matrix_to_se3,
)
from gslam_tpu.core.sim3 import (
    sim3_identity, sim3_mul, sim3_inverse, sim3_apply, sim3_exp, sim3_log,
    sim3_from_se3, sim3_to_se3,
)
