"""Host-side utilities: timing, logging, metrics, RNG helpers.

TPU-native replacements for the reference's foundation layer
(``GSLAM/core/Timer.h``, ``GSLAM/core/Glog.h`` mini-glog,
``GSLAM/core/MemoryMetric.h``, ``GSLAM/core/Random.h``).
"""

from gslam_tpu.utils.timer import Timer, timer, TicToc
from gslam_tpu.utils.logging import get_logger
from gslam_tpu.utils.metrics import MetricsRegistry, device_memory_stats
