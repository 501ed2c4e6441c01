"""Distribution: device meshes, sharded map arenas, distributed Schur BA.

No upstream counterpart (the reference is single-process multi-threaded
C++ with zero distributed communication — SURVEY section 2 "parallelism
strategies"); this package is new TPU-first design per SURVEY 5.7/5.8:

* meshes built over ICI with named axes ('pt' = landmark shards, the
  data-parallel analog; 'obs' = observation-slot shards, the
  tensor-parallel analog);
* global BA as a distributed Schur complement: each landmark's 3x3
  block is inverted where it lives, partial reduced camera systems are
  formed shard-locally as dense GEMMs and combined with ``psum`` over
  ICI, every device solves the (small, replicated) reduced system
  identically, and landmark updates are back-substituted shard-locally;
* multi-host launch via ``jax.distributed.initialize`` (DCN for
  control), SPMD collectives over ICI via ``shard_map``.
"""

from gslam_tpu.parallel.mesh import (make_dp_mesh, make_mesh,
                                     shard_points_spec)
from gslam_tpu.parallel.dist_ba import distributed_bundle_adjust
from gslam_tpu.parallel.tracking import sharded_track_batch
