"""The world model: fixed-capacity SoA arenas for frames/points/observations.

TPU-native re-design of the reference's L2 data model:
``Map`` / ``HashMap`` (``GSLAM/core/Map.h``, ``HashMap.h`` — mutex-guarded
``unordered_map`` stores), ``MapFrame`` (``GSLAM/core/MapFrame.h``) and
``MapPoint`` (``GSLAM/core/MapPoint.h``).  Instead of a shared mutable
container, the map is one immutable pytree of fixed-capacity arrays,
threaded functionally through jitted steps; ids are arena slots; erasure
is mask clearing; the covisibility graph is a GEMM over the observation
incidence matrix.
"""

from gslam_tpu.map.arena import (
    MapArena, make_arena, insert_frame, insert_points, add_observations,
    erase_frame, erase_points, covisibility_matrix, covisibility_topk,
    frame_point_ids, save_arena, load_arena, arena_stats, cull_points,
    compact_arena,
)
