"""SLAM systems ("models"): the reference's SLAM-plugin layer, rebuilt.

The reference defines a plugin contract (``GSLAM/core/GSLAM.h``:
'SLAM::track(FramePtr)', 'getMap()', plugins like ORB-SLAM/SVO/DSO
wrappers living out-of-tree) and ships no SLAM itself.  This package
ships complete TPU-native SLAM systems built from gslam_tpu components:

* :mod:`odometry` — frame-to-frame visual odometry (mono E-based or
  depth/PnP-based), the minimum end-to-end slice (BASELINE config #1);
* :mod:`keyframe_slam` — full keyframe SLAM: track-vs-local-map, keyframe
  promotion, depth/triangulated point creation, local BA over the
  covisibility window (configs #2-#4), with hooks for loop closure;
* :mod:`stereo` — stereo depth frontend for KITTI-style input (config #3);
* :mod:`direct` — direct photometric odometry (the SVO/DSO plugin-family
  analog): coarse-to-fine pyramid GN over a high-gradient pixel slab.

All device math is jitted with static shapes; the host makes only
scalarized decisions (keyframe promotion, init) between steps —
SURVEY section 7 "hard parts".
"""

from gslam_tpu.models.keyframe_slam import KeyframeSLAM, SLAMConfig
from gslam_tpu.models.odometry import FrameToFrameOdometry
from gslam_tpu.app.registry import SLAMS
