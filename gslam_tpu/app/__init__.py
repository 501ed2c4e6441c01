"""Application layer: config system, component registry, host event bus, CLI.

TPU-native replacement for the reference's Svar (``GSLAM/core/Svar.h``:
dynamic config/flags/plugin-registry/FFI) and Messenger
(``GSLAM/core/Messenger.h``: in-process typed pub/sub).  dlopen plugins
become registry entries; the pub/sub bus survives as a *host-side* wiring
layer only (dataset -> SLAM -> eval -> viz) — device dataflow is jitted
function composition, not topics.
"""

from gslam_tpu.app.config import Svar, svar, parse_args
from gslam_tpu.app.registry import Registry, DATASETS, ESTIMATORS, OPTIMIZERS, SLAMS
from gslam_tpu.app.messenger import Messenger, Publisher, Subscriber, messenger
