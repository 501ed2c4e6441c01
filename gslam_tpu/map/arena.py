"""Fixed-capacity SoA map arenas + functional insert/erase/query ops.

Replaces the reference's pointer-graph map (``GSLAM/core/Map.h``:
insert/erase frames & points by id, id allocation, save/load;
``MapFrame::addObservation/getObservations``; covisibility
``FrameConnection`` edges) with a design XLA can compile:

* every store is a fixed-capacity array with a validity mask;
* an id IS its arena slot; allocation is a counter bump + masked
  ``dynamic_update_slice`` — no host round-trip inside jit;
* observations are a flat edge list (frame, point, kp) — BA gathers it
  directly; per-point/per-frame groupings are ``segment_sum``s;
* the covisibility graph is not stored: it is the Gram matrix of the
  frame x point incidence matrix, i.e. one bf16 GEMM on the MXU
  (reference walks per-point observation maps in C++);
* erase = clearing masks (slots are reclaimed by ``compact`` offline).

Capacities are static (jit shape stability); overflow drops writes and
raises a saturating ``overflow`` flag the host can poll.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# descriptor: 256-bit binary (ORB-style), packed as 8 x uint32
DESC_WORDS = 8


class MapArena(struct.PyTreeNode):
    """The whole SLAM world state as one pytree (see module docstring).

    Shapes (capacities F frames, K keypoints/frame, P points, E obs):
      frames : pose (F,8) Sim3 [t,q,s]; time (F,); valid (F,); flags (F,);
               camera index (F,); kp uv (F,K,2); kp meta (F,K,4) =
               [size, angle, response, octave]; kp depth (F,K) (RGB-D /
               stereo; 0 = none); descriptors (F,K,DESC_WORDS) uint32;
               kp_count (F,)
      points : xyz (P,3); normal (P,3); color (P,3); descriptor
               (P,DESC_WORDS) uint32; valid (P,); ref_frame (P,)
      obs    : frame (E,), point (E,), kp (E,), valid (E,)
      counters: n_frames, n_points, n_obs, overflow
    """

    # frames
    frame_pose: jnp.ndarray
    frame_time: jnp.ndarray
    frame_valid: jnp.ndarray
    frame_flags: jnp.ndarray
    frame_camera: jnp.ndarray
    frame_kp_uv: jnp.ndarray
    frame_kp_meta: jnp.ndarray
    frame_kp_depth: jnp.ndarray
    frame_desc: jnp.ndarray
    frame_kp_count: jnp.ndarray
    # points
    point_xyz: jnp.ndarray
    point_normal: jnp.ndarray
    point_color: jnp.ndarray
    point_desc: jnp.ndarray
    point_valid: jnp.ndarray
    point_ref_frame: jnp.ndarray
    # per-landmark tracking statistics (reference MapPoint
    # IncreaseVisible/IncreaseFound): frames where the point was
    # predicted visible vs actually matched as a tracking inlier
    point_visible: jnp.ndarray
    point_found: jnp.ndarray
    # observations
    obs_frame: jnp.ndarray
    obs_point: jnp.ndarray
    obs_kp: jnp.ndarray
    obs_valid: jnp.ndarray
    # counters (scalars)
    n_frames: jnp.ndarray
    n_points: jnp.ndarray
    n_obs: jnp.ndarray
    overflow: jnp.ndarray

    # static capacities
    cap_frames: int = struct.field(pytree_node=False)
    cap_kps: int = struct.field(pytree_node=False)
    cap_points: int = struct.field(pytree_node=False)
    cap_obs: int = struct.field(pytree_node=False)


def make_arena(cap_frames: int = 256, cap_kps: int = 512,
               cap_points: int = 16384, cap_obs: int = 65536) -> MapArena:
    F, K, P, E = cap_frames, cap_kps, cap_points, cap_obs
    f32, i32 = jnp.float32, jnp.int32
    pose0 = jnp.zeros((F, 8), f32).at[:, 3].set(1.0).at[:, 7].set(1.0)
    return MapArena(
        frame_pose=pose0,
        frame_time=jnp.zeros((F,), f32),
        frame_valid=jnp.zeros((F,), bool),
        frame_flags=jnp.zeros((F,), i32),
        frame_camera=jnp.zeros((F,), i32),
        frame_kp_uv=jnp.zeros((F, K, 2), f32),
        frame_kp_meta=jnp.zeros((F, K, 4), f32),
        frame_kp_depth=jnp.zeros((F, K), f32),
        frame_desc=jnp.zeros((F, K, DESC_WORDS), jnp.uint32),
        frame_kp_count=jnp.zeros((F,), i32),
        point_xyz=jnp.zeros((P, 3), f32),
        point_normal=jnp.zeros((P, 3), f32),
        point_color=jnp.zeros((P, 3), f32),
        point_desc=jnp.zeros((P, DESC_WORDS), jnp.uint32),
        point_valid=jnp.zeros((P,), bool),
        point_ref_frame=jnp.zeros((P,), i32),
        point_visible=jnp.zeros((P,), i32),
        point_found=jnp.zeros((P,), i32),
        obs_frame=jnp.zeros((E,), i32),
        obs_point=jnp.zeros((E,), i32),
        obs_kp=jnp.zeros((E,), i32),
        obs_valid=jnp.zeros((E,), bool),
        n_frames=jnp.zeros((), i32),
        n_points=jnp.zeros((), i32),
        n_obs=jnp.zeros((), i32),
        overflow=jnp.zeros((), bool),
        cap_frames=F, cap_kps=K, cap_points=P, cap_obs=E,
    )


# ---------------------------------------------------------------------------
# insertion (all jit-safe; ids are slots)


def insert_frame(arena: MapArena, pose: jnp.ndarray, time: jnp.ndarray,
                 kp_uv: jnp.ndarray, kp_meta: jnp.ndarray,
                 desc: jnp.ndarray, kp_count: jnp.ndarray,
                 kp_depth: Optional[jnp.ndarray] = None,
                 camera: int | jnp.ndarray = 0,
                 flags: int | jnp.ndarray = 0,
                 ) -> Tuple[MapArena, jnp.ndarray]:
    """Insert one frame; returns (arena, frame_id).

    ``kp_uv`` (K,2) / ``kp_meta`` (K,4) / ``desc`` (K,DESC_WORDS) must be
    padded to the arena's keypoint capacity; ``kp_count`` is the live
    count.  On overflow the write is dropped and ``overflow`` set.
    """
    fid = arena.n_frames
    ok = fid < arena.cap_frames
    slot = jnp.where(ok, fid, arena.cap_frames - 1)

    def wr(buf, val):
        new = buf.at[slot].set(val)
        return jnp.where(ok, new, buf) if buf.ndim == 1 else \
            jax.lax.select(ok, new, buf)

    if kp_depth is None:
        kp_depth = jnp.zeros((arena.cap_kps,), jnp.float32)
    arena = arena.replace(
        frame_pose=wr(arena.frame_pose, pose.astype(jnp.float32)),
        frame_time=wr(arena.frame_time, jnp.asarray(time, jnp.float32)),
        frame_valid=wr(arena.frame_valid, jnp.asarray(True)),
        frame_flags=wr(arena.frame_flags, jnp.asarray(flags, jnp.int32)),
        frame_camera=wr(arena.frame_camera, jnp.asarray(camera, jnp.int32)),
        frame_kp_uv=wr(arena.frame_kp_uv, kp_uv),
        frame_kp_meta=wr(arena.frame_kp_meta, kp_meta),
        frame_kp_depth=wr(arena.frame_kp_depth, kp_depth),
        frame_desc=wr(arena.frame_desc, desc),
        frame_kp_count=wr(arena.frame_kp_count,
                          jnp.asarray(kp_count, jnp.int32)),
        n_frames=jnp.where(ok, fid + 1, fid),
        overflow=arena.overflow | ~ok,
    )
    return arena, jnp.where(ok, fid, -1)


def insert_points(arena: MapArena, xyz: jnp.ndarray, desc: jnp.ndarray,
                  valid: jnp.ndarray, ref_frame: jnp.ndarray,
                  normal: Optional[jnp.ndarray] = None,
                  color: Optional[jnp.ndarray] = None,
                  ) -> Tuple[MapArena, jnp.ndarray]:
    """Batch-insert N candidate points (mask `valid` selects real ones).

    Valid entries are compacted to the front (sort by ~valid) and written
    contiguously at ``n_points``; returns per-input point ids (-1 where
    invalid/dropped).  This is the XLA version of N ``insertMapPoint``
    calls: one sort + one scatter.
    """
    N = xyz.shape[0]
    valid = valid.astype(bool)
    order = jnp.argsort(~valid)  # valid entries first, stable
    xyz_s = xyz[order]
    desc_s = desc[order]
    ref_s = jnp.broadcast_to(jnp.asarray(ref_frame, jnp.int32), (N,))[order]
    normal_s = (jnp.zeros_like(xyz) if normal is None else normal)[order]
    color_s = (jnp.zeros_like(xyz) if color is None else color)[order]
    n_new = valid.sum()

    base = arena.n_points
    # slot for the i-th sorted entry
    idx = jnp.arange(N, dtype=jnp.int32)
    want = idx < n_new
    fits = (base + idx) < arena.cap_points
    write = want & fits
    slots = jnp.where(write, base + idx, arena.cap_points - 1)

    def scat(buf, val, keep_invalid_row=False):
        # write rows where `write`; others rewrite their own current value
        safe_val = jnp.where(write[(...,) + (None,) * (val.ndim - 1)],
                             val, buf[slots])
        return buf.at[slots].set(safe_val)

    zeros_i = jnp.zeros((N,), jnp.int32)
    arena = arena.replace(
        point_xyz=scat(arena.point_xyz, xyz_s.astype(jnp.float32)),
        point_desc=scat(arena.point_desc, desc_s),
        point_normal=scat(arena.point_normal, normal_s.astype(jnp.float32)),
        point_color=scat(arena.point_color, color_s.astype(jnp.float32)),
        point_ref_frame=scat(arena.point_ref_frame, ref_s),
        point_visible=scat(arena.point_visible, zeros_i),
        point_found=scat(arena.point_found, zeros_i),
        point_valid=arena.point_valid.at[slots].set(
            jnp.where(write, True, arena.point_valid[slots])),
        n_points=jnp.minimum(base + n_new, arena.cap_points),
        overflow=arena.overflow | jnp.any(want & ~fits),
    )
    # map back to input order: the i-th input (if valid) went to sorted
    # position rank_i = cumsum(valid)[i]-1 -> slot base + rank_i
    rank = jnp.cumsum(valid) - 1
    ids = jnp.where(valid & ((base + rank) < arena.cap_points),
                    base + rank, -1)
    return arena, ids.astype(jnp.int32)


def add_observations(arena: MapArena, frame_id: jnp.ndarray,
                     point_ids: jnp.ndarray, kp_ids: jnp.ndarray,
                     valid: jnp.ndarray) -> MapArena:
    """Append N observation edges (frame, point, kp) where valid."""
    N = point_ids.shape[0]
    valid = valid.astype(bool) & (point_ids >= 0)
    order = jnp.argsort(~valid)
    pt_s = point_ids[order]
    kp_s = kp_ids[order]
    n_new = valid.sum()
    base = arena.n_obs
    idx = jnp.arange(N, dtype=jnp.int32)
    want = idx < n_new
    fits = (base + idx) < arena.cap_obs
    write = want & fits
    slots = jnp.where(write, base + idx, arena.cap_obs - 1)

    def scat(buf, val):
        return buf.at[slots].set(jnp.where(write, val, buf[slots]))

    return arena.replace(
        obs_frame=scat(arena.obs_frame,
                       jnp.broadcast_to(jnp.asarray(frame_id, jnp.int32),
                                        (N,))),
        obs_point=scat(arena.obs_point, pt_s.astype(jnp.int32)),
        obs_kp=scat(arena.obs_kp, kp_s.astype(jnp.int32)),
        obs_valid=scat(arena.obs_valid, write),
        n_obs=jnp.minimum(base + n_new, arena.cap_obs),
        overflow=arena.overflow | jnp.any(want & ~fits),
    )


# ---------------------------------------------------------------------------
# erasure (mask clearing; reference Map::eraseMapFrame/eraseMapPoint)


def erase_points(arena: MapArena, point_ids: jnp.ndarray) -> MapArena:
    pv = arena.point_valid.at[point_ids.clip(0)].set(
        jnp.where(point_ids >= 0, False, arena.point_valid[point_ids.clip(0)]))
    ov = arena.obs_valid & pv[arena.obs_point]
    return arena.replace(point_valid=pv, obs_valid=ov)


def erase_frame(arena: MapArena, frame_id: jnp.ndarray) -> MapArena:
    fv = arena.frame_valid.at[frame_id].set(False)
    ov = arena.obs_valid & (arena.obs_frame != frame_id)
    return arena.replace(frame_valid=fv, obs_valid=ov)


# ---------------------------------------------------------------------------
# covisibility graph (reference FrameConnection / getParents-getChildren)


def _incidence(arena: MapArena) -> jnp.ndarray:
    """(F, P) observation incidence in bf16 (exact for 0/1)."""
    M = jnp.zeros((arena.cap_frames, arena.cap_points), jnp.bfloat16)
    w = arena.obs_valid.astype(jnp.bfloat16)
    return M.at[arena.obs_frame, arena.obs_point].add(
        w, mode="drop").clip(0, 1)


def covisibility_matrix(arena: MapArena) -> jnp.ndarray:
    """(F, F) shared-landmark counts — one MXU GEMM, diagonal zeroed."""
    M = _incidence(arena)
    C = jnp.dot(M, M.T, preferred_element_type=jnp.float32)
    C = C * (1.0 - jnp.eye(arena.cap_frames, dtype=C.dtype))
    both = jnp.outer(arena.frame_valid, arena.frame_valid)
    return jnp.where(both, C, 0.0).astype(jnp.int32)


def covisibility_row(arena: MapArena, frame_id: jnp.ndarray
                     ) -> jnp.ndarray:
    """(cap_frames,) shared-landmark counts of one frame vs all others
    (one GEMV on the incidence matrix; self entry zeroed)."""
    M = _incidence(arena)
    row = jnp.dot(M[frame_id], M.T, preferred_element_type=jnp.float32)
    row = row.at[frame_id].set(0.0)
    return jnp.where(arena.frame_valid, row, 0.0).astype(jnp.int32)


def covisibility_topk(arena: MapArena, frame_id: jnp.ndarray, k: int,
                      min_common: int = 15
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k covisible neighbours of one frame: (ids, counts); -1 pad."""
    M = _incidence(arena)
    row = jnp.dot(M[frame_id], M.T, preferred_element_type=jnp.float32)
    row = row.at[frame_id].set(0.0)
    row = jnp.where(arena.frame_valid, row, 0.0)
    counts, ids = jax.lax.top_k(row, k)
    good = counts >= min_common
    return (jnp.where(good, ids, -1).astype(jnp.int32),
            jnp.where(good, counts, 0).astype(jnp.int32))


def frame_point_ids(arena: MapArena, frame_id: jnp.ndarray,
                    max_points: int) -> jnp.ndarray:
    """Point ids observed by a frame, padded with -1 (getObservations)."""
    hit = arena.obs_valid & (arena.obs_frame == frame_id)
    # stable compaction of matching obs_point entries to the front
    order = jnp.argsort(~hit)
    pts = jnp.where(hit[order], arena.obs_point[order], -1)
    return pts[:max_points].astype(jnp.int32)


def covis_union_ids(arena: MapArena, frame_id: jnp.ndarray,
                    slab_size: int, window: int,
                    min_common: int = 5) -> jnp.ndarray:
    """Union of point ids observed by `frame_id` and its top-`window`
    covisible neighbours, deduped, packed largest-id-first into a fixed
    (slab_size,) slot array (-1 = empty).  jit-safe (static shapes).

    This is the single shared implementation of the local-map /
    BA-window point selection (reference: the covisibility-window
    gather of ``GSLAM/core/MapFrame.h`` getParents/getChildren +
    getObservations); tracking, BA and dedup all go through it so the
    selection logic cannot diverge.
    """
    ids = frame_point_ids(arena, frame_id, slab_size)
    nbr, _ = covisibility_topk(arena, frame_id, k=window,
                               min_common=min_common)
    all_ids = [ids]
    for i in range(nbr.shape[0]):
        all_ids.append(jnp.where(
            nbr[i] >= 0,
            frame_point_ids(arena, nbr[i].clip(0), slab_size), -1))
    cat = jnp.concatenate(all_ids)
    srt = jnp.sort(cat)
    uniq = jnp.where((srt != jnp.roll(srt, 1))
                     | (jnp.arange(srt.shape[0]) == 0), srt, -1)
    return jnp.sort(uniq)[::-1][:slab_size].astype(jnp.int32)


def cull_points(arena: MapArena, min_obs: int = 2,
                min_age_frames: int = 3) -> MapArena:
    """Erase low-quality landmarks (standard SLAM map maintenance):
    points older than `min_age_frames` keyframes that never accumulated
    `min_obs` observations.  One masked update, jit-safe."""
    obs_count = jnp.zeros((arena.cap_points,), jnp.int32).at[
        arena.obs_point].add(arena.obs_valid.astype(jnp.int32))
    age = arena.n_frames - arena.point_ref_frame
    bad = (arena.point_valid & (obs_count < min_obs)
           & (age >= min_age_frames))
    pv = arena.point_valid & ~bad
    ov = arena.obs_valid & pv[arena.obs_point]
    return arena.replace(point_valid=pv, obs_valid=ov)


def cull_by_found_ratio(arena: MapArena, min_visible: int = 10,
                        min_ratio: float = 0.1) -> MapArena:
    """Erase landmarks the tracker repeatedly fails to find (the
    reference MapPoint GetFoundRatio cull): points predicted visible in
    >= ``min_visible`` tracked frames but matched in < ``min_ratio`` of
    them are junk (duplicates, depth errors, moving objects).  Unlike
    an observation-count cull this never touches landmarks that simply
    left the field of view — their ``visible`` count stops growing —
    so sparse-keyframe maps keep their old views for loop closure."""
    vis = arena.point_visible
    bad = (arena.point_valid & (vis >= min_visible)
           & (arena.point_found < min_ratio * vis))
    pv = arena.point_valid & ~bad
    ov = arena.obs_valid & pv[arena.obs_point]
    return arena.replace(point_valid=pv, obs_valid=ov)


def refresh_points(arena: MapArena, max_obs: int = 8) -> MapArena:
    """Refresh per-landmark statistics from current observations
    (reference MapPoint semantics — viewing normal, representative
    descriptor; ``GSLAM/core/MapPoint.h``-analog, SURVEY 2 row 11):

    * ``point_normal``: mean unit camera->point viewing direction over
      all observing keyframes;
    * ``point_desc``: the observation descriptor with minimum total
      Hamming distance to the point's other observations (the
      min-sum-distance medoid — ORB-SLAM's "distinctive descriptor");
    * ``point_color``: mean keypoint response channel is NOT an image
      colour — colour refresh happens at insertion (see
      ``insert_points``'s ``color``).

    One jitted pass: observations are packed per-point (rank-within-
    group, same trick as the BA window builder) then reduced batched.
    """
    P = arena.cap_points
    E = arena.obs_frame.shape[0]
    O = max_obs

    e_ok = arena.obs_valid
    e_pt = jnp.where(e_ok, arena.obs_point, P)
    order = jnp.argsort(e_pt, stable=True)
    pt_sorted = e_pt[order]
    pos = jnp.arange(E)
    first_of_group = jnp.full((P + 1,), E, jnp.int32).at[pt_sorted].min(
        pos.astype(jnp.int32))
    slot = (pos - first_of_group[pt_sorted]).astype(jnp.int32)
    ok_sorted = e_ok[order] & (slot < O)
    tgt_p = jnp.where(ok_sorted, pt_sorted, P)
    tgt_o = jnp.where(ok_sorted, slot, 0)

    # (P, O) packed observation tables
    f_sorted = arena.obs_frame[order]
    k_sorted = arena.obs_kp[order]
    desc_e = arena.frame_desc[f_sorted, k_sorted]       # (E, W)
    obs_desc = jnp.zeros((P + 1, O, desc_e.shape[-1]), jnp.uint32) \
        .at[tgt_p, tgt_o].set(desc_e)[:P]
    obs_ok = jnp.zeros((P + 1, O), bool).at[tgt_p, tgt_o].set(
        ok_sorted)[:P]

    # viewing normals: camera centre = (pose_cw)^-1 translation
    from gslam_tpu.core.se3 import se3_inverse

    centers = se3_inverse(arena.frame_pose[:, :7])[:, :3]  # (F, 3)
    c_e = centers[f_sorted]                                # (E, 3)
    obs_ctr = jnp.zeros((P + 1, O, 3)).at[tgt_p, tgt_o].set(c_e)[:P]
    d = arena.point_xyz[:, None, :] - obs_ctr              # (P, O, 3)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True),
                        1e-9)
    n_obs = obs_ok.sum(-1)
    normal = jnp.sum(jnp.where(obs_ok[..., None], d, 0.0), axis=1)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)
    has = (n_obs > 0) & arena.point_valid
    new_normal = jnp.where(has[:, None], normal, arena.point_normal)

    # medoid descriptor: pairwise Hamming (P, O, O), min row-sum
    x = obs_desc[:, :, None, :] ^ obs_desc[:, None, :, :]
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    ham = ((x * jnp.uint32(0x01010101)) >> 24).sum(-1).astype(jnp.int32)
    pair_ok = obs_ok[:, :, None] & obs_ok[:, None, :]
    total = jnp.where(pair_ok, ham, 0).sum(-1)             # (P, O)
    total = jnp.where(obs_ok, total, jnp.int32(1 << 30))
    best = jnp.argmin(total, axis=-1)                      # (P,)
    best_desc = jnp.take_along_axis(
        obs_desc, best[:, None, None], axis=1)[:, 0]
    new_desc = jnp.where(has[:, None], best_desc, arena.point_desc)

    return arena.replace(point_normal=new_normal, point_desc=new_desc)


def redundant_frames(arena: MapArena, min_others: int = 3,
                     frac: float = 0.9) -> jnp.ndarray:
    """(F,) mask of redundant keyframes (ORB-SLAM KeyFrameCulling
    analog): a frame is redundant when >= ``frac`` of its observed
    landmarks are seen by at least ``min_others`` OTHER keyframes.
    The caller decides which to erase (never the newest)."""
    obs_count = jnp.zeros((arena.cap_points,), jnp.int32).at[
        arena.obs_point].add(arena.obs_valid.astype(jnp.int32))
    well_seen = obs_count[arena.obs_point] >= (min_others + 1)
    per_f = jnp.zeros((arena.cap_frames,), jnp.int32)
    n_red = per_f.at[arena.obs_frame].add(
        (arena.obs_valid & well_seen).astype(jnp.int32))
    n_tot = per_f.at[arena.obs_frame].add(
        arena.obs_valid.astype(jnp.int32))
    return (arena.frame_valid & (n_tot > 0)
            & (n_red >= frac * n_tot))


def compact_arena(arena: MapArena) -> Tuple[MapArena, jnp.ndarray]:
    """Reclaim erased point/observation slots (host-side maintenance).

    Valid points move to the front (stable order); the observation edge
    list is rewritten with remapped point ids and compacted likewise.
    Returns (arena, old_to_new point id map; -1 for erased).  Frame
    slots are never moved (frame ids are stable handles).
    """
    P = arena.cap_points
    order = jnp.argsort(~arena.point_valid, stable=True)
    n_new = arena.point_valid.sum().astype(jnp.int32)
    old2new = jnp.full((P,), -1, jnp.int32).at[order].set(
        jnp.arange(P, dtype=jnp.int32))
    old2new = jnp.where(arena.point_valid, old2new, -1)

    def take(buf):
        return buf[order]

    # remap + compact observations
    new_pt = jnp.where(arena.obs_valid, old2new[arena.obs_point], -1)
    ov = arena.obs_valid & (new_pt >= 0)
    oorder = jnp.argsort(~ov, stable=True)
    n_obs = ov.sum().astype(jnp.int32)

    arena = arena.replace(
        point_xyz=take(arena.point_xyz),
        point_normal=take(arena.point_normal),
        point_color=take(arena.point_color),
        point_desc=take(arena.point_desc),
        point_valid=take(arena.point_valid),
        point_ref_frame=take(arena.point_ref_frame),
        point_visible=take(arena.point_visible),
        point_found=take(arena.point_found),
        obs_frame=arena.obs_frame[oorder],
        obs_point=new_pt.clip(0)[oorder],
        obs_kp=arena.obs_kp[oorder],
        obs_valid=ov[oorder],
        n_points=n_new,
        n_obs=n_obs,
    )
    return arena, old2new


# ---------------------------------------------------------------------------
# save / load / stats (reference Map::save / Map::load)


def save_arena(arena: MapArena, path: str) -> None:
    """Snapshot to one .npz (the pytree IS the checkpoint; SURVEY 5.4)."""
    data = {f.name: np.asarray(getattr(arena, f.name))
            for f in dataclasses.fields(arena)
            if f.name not in ("cap_frames", "cap_kps", "cap_points",
                              "cap_obs")}
    data["_caps"] = np.asarray([arena.cap_frames, arena.cap_kps,
                                arena.cap_points, arena.cap_obs])
    np.savez_compressed(path, **data)


def load_arena(path: str) -> MapArena:
    z = np.load(path)
    caps = z["_caps"]
    kw = {k: jnp.asarray(z[k]) for k in z.files if k != "_caps"}
    # checkpoints written before the tracking-statistics fields existed
    P = int(caps[2])
    for name in ("point_visible", "point_found"):
        kw.setdefault(name, jnp.zeros((P,), jnp.int32))
    return MapArena(cap_frames=int(caps[0]), cap_kps=int(caps[1]),
                    cap_points=P, cap_obs=int(caps[3]), **kw)


def arena_stats(arena: MapArena) -> dict:
    """Host-side summary (frameNum/pointNum analogs)."""
    return {
        "n_frames": int(arena.n_frames),
        "n_points": int(arena.n_points),
        "n_obs": int(arena.n_obs),
        "valid_frames": int(np.asarray(arena.frame_valid).sum()),
        "valid_points": int(np.asarray(arena.point_valid).sum()),
        "valid_obs": int(np.asarray(arena.obs_valid).sum()),
        "overflow": bool(arena.overflow),
    }


def merge_arenas(a: MapArena, b: MapArena,
                 transform_b: Optional[jnp.ndarray] = None,
                 cap_frames: Optional[int] = None,
                 cap_points: Optional[int] = None,
                 cap_obs: Optional[int] = None) -> MapArena:
    """Merge two maps into one arena (multi-session / multi-sequence).

    The reference's ``Map`` holds one session; city-scale multi-sequence
    runs (BASELINE config #5) need maps from separate sequences (or
    separate hosts) combined before a distributed global BA.  ``b``'s
    slots are appended after ``a``'s with frame/point indices offset;
    ``transform_b`` (Sim3 (8,), e.g. from inter-sequence loop closure /
    ``estimation.find_sim3``) maps b's world frame into a's.

    Host-side utility (rare offline op — not jit-compiled); capacities
    of the result default to the sums.
    """
    from gslam_tpu.core.sim3 import sim3_apply, sim3_mul

    if a.cap_kps != b.cap_kps:
        raise ValueError(f"kp capacity mismatch {a.cap_kps} != {b.cap_kps}")
    na_f, nb_f = int(a.n_frames), int(b.n_frames)
    na_p, nb_p = int(a.n_points), int(b.n_points)
    na_o, nb_o = int(a.n_obs), int(b.n_obs)
    F = cap_frames or (a.cap_frames + b.cap_frames)
    P = cap_points or (a.cap_points + b.cap_points)
    E = cap_obs or (a.cap_obs + b.cap_obs)
    if F < na_f + nb_f or P < na_p + nb_p or E < na_o + nb_o:
        raise ValueError("merged capacities too small for live entries")

    b_pose = b.frame_pose
    b_xyz = b.point_xyz
    b_normal = b.point_normal
    if transform_b is not None:
        from gslam_tpu.core.sim3 import sim3_inverse

        T = jnp.asarray(transform_b, jnp.float32)
        # poses are world->cam maps: rebasing b onto a's world is
        # RIGHT-composition with T^-1 (a-world -> b-world -> cam).
        # Left-multiplying T (the pre-round-5 code) moved the cameras
        # OPPOSITE to the points — the merged map had every b-sequence
        # camera on the wrong side of the world, caught by the fleet
        # keyframe-ATE gate in __graft_entry__.dryrun_multichip.
        b_pose = sim3_mul(b_pose, sim3_inverse(T)[None])
        b_xyz = sim3_apply(T[None], b_xyz)
        Ronly = T.at[:3].set(0.0).at[7].set(1.0)  # rotate normals only
        b_normal = sim3_apply(Ronly[None], b_normal)

    out = make_arena(F, a.cap_kps, P, E)

    def cat(out_buf, buf_a, buf_b, n_a, n_b):
        out_buf = out_buf.at[:n_a].set(buf_a[:n_a])
        return out_buf.at[n_a:n_a + n_b].set(buf_b[:n_b])

    def catf(name, buf_b=None):  # frame-axis field
        return cat(getattr(out, name), getattr(a, name),
                   getattr(b, name) if buf_b is None else buf_b,
                   na_f, nb_f)

    def catp(name, buf_b=None):  # point-axis field
        return cat(getattr(out, name), getattr(a, name),
                   getattr(b, name) if buf_b is None else buf_b,
                   na_p, nb_p)

    def cato(name, buf_b=None):  # obs-axis field
        return cat(getattr(out, name), getattr(a, name),
                   getattr(b, name) if buf_b is None else buf_b,
                   na_o, nb_o)

    out = out.replace(
        frame_pose=catf("frame_pose", b_pose),
        frame_time=catf("frame_time"),
        frame_valid=catf("frame_valid"),
        frame_flags=catf("frame_flags"),
        frame_camera=catf("frame_camera"),
        frame_kp_uv=catf("frame_kp_uv"),
        frame_kp_meta=catf("frame_kp_meta"),
        frame_kp_depth=catf("frame_kp_depth"),
        frame_desc=catf("frame_desc"),
        frame_kp_count=catf("frame_kp_count"),
        point_xyz=catp("point_xyz", b_xyz),
        point_normal=catp("point_normal", b_normal),
        point_color=catp("point_color"),
        point_desc=catp("point_desc"),
        point_valid=catp("point_valid"),
        point_ref_frame=catp("point_ref_frame", b.point_ref_frame + na_f),
        point_visible=catp("point_visible"),
        point_found=catp("point_found"),
        obs_frame=cato("obs_frame", b.obs_frame + na_f),
        obs_point=cato("obs_point", b.obs_point + na_p),
        obs_kp=cato("obs_kp"),
        obs_valid=cato("obs_valid"),
        n_frames=jnp.asarray(na_f + nb_f, jnp.int32),
        n_points=jnp.asarray(na_p + nb_p, jnp.int32),
        n_obs=jnp.asarray(na_o + nb_o, jnp.int32),
        overflow=a.overflow | b.overflow,
    )
    return out
