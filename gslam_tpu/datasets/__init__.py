"""Dataset IO: format parsers, playback, synthetic sequences.

TPU-native re-design of the reference dataset layer
(``GSLAM/core/Dataset.h``: 'Dataset::open(path)' dispatching on the
dataset-path extension via 'REGISTER_DATASET(Class, "ext")';
'grabFrame()' streaming fully-populated frames; 'DatasetPlayer' with
play/pause/step — plus per-format plugins for TUM RGB-D, TUM Mono, KITTI
odometry, EuRoC MAV, drone-mapping and plain-video datasets, SURVEY
section 2 rows 14-15).  Loaders are host-side (numpy + PIL/cv2 decode),
produce fixed-layout FrameData, and prefetch to device asynchronously;
extension dispatch is preserved through gslam_tpu.app.registry.DATASETS.
"""

from gslam_tpu.datasets.base import Dataset, FrameData, DatasetPlayer
from gslam_tpu.datasets import synthetic  # registers ".synth"
from gslam_tpu.datasets import tum_rgbd   # registers ".tumrgbd"
from gslam_tpu.datasets import kitti      # registers ".kitti"
from gslam_tpu.datasets import euroc      # registers ".euroc"
from gslam_tpu.datasets import video      # registers ".cvmono" etc.
from gslam_tpu.app.registry import open_dataset
