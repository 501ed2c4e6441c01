"""gslam_tpu — a TPU-native general SLAM engine.

A from-scratch re-design of the capabilities of the reference framework
``zdzhaoyong/GSLAM`` (a C++11 header-only general SLAM framework; see
SURVEY.md for the full structural analysis) in JAX/XLA/Pallas:

* the unified ``Map`` / ``MapFrame`` / ``MapPoint`` data model becomes a
  fixed-capacity structure-of-arrays arena pytree (:mod:`gslam_tpu.map`);
* geometry (`SO3/SE3/SIM3`, four camera models, GPS frames — reference
  ``GSLAM/core/SO3.h`` / ``SE3.h`` / ``SIM3.h`` / ``Camera.h`` / ``GPS.h``)
  becomes pure-jnp vmappable functions (:mod:`gslam_tpu.core`);
* the feature frontend / matcher / vocabulary hot loops become MXU/VPU
  friendly batched ops and Pallas kernels (:mod:`gslam_tpu.ops`);
* robust estimation (reference ``GSLAM/core/Estimator.h``) becomes batched
  vmapped RANSAC (:mod:`gslam_tpu.estimation`);
* bundle adjustment / pose-graph optimization (reference
  ``GSLAM/core/Optimizer.h``) becomes an LM core with dense-in-blocks Schur
  reduction (:mod:`gslam_tpu.opt`), distributed over a device mesh via
  ``shard_map`` + ``psum`` (:mod:`gslam_tpu.parallel`);
* datasets (TUM RGB-D / TUM mono / KITTI / EuRoC / video — reference
  ``GSLAM/core/Dataset.h`` + dataset plugins) become host-side loaders with
  extension-dispatch preserved (:mod:`gslam_tpu.datasets`);
* the evaluation harness (ATE/RPE + timing/memory, reference paper benchmark
  module) is :mod:`gslam_tpu.eval`;
* Svar (config/flags/registry, reference ``GSLAM/core/Svar.h``) and
  Messenger (in-process pub/sub, reference ``GSLAM/core/Messenger.h``)
  become a typed config system + component registry + host event bus
  (:mod:`gslam_tpu.app`).
"""

__version__ = "0.1.0"
