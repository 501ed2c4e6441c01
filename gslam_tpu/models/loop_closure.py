"""Loop closure: BoW retrieval + geometric verification + pose graph.

Reference pipeline (SURVEY 3.4, loop-closing thread): transform KF
descriptors to a BowVector, query the keyframe database, verify
candidates geometrically (descriptor matching + SIM3/PnP), optimize the
essential/pose graph, correct the map.

TPU formulation: the keyframe database is a dense (F, n_words) BoW
matrix — a query is one GEMV (score_l2) on the MXU; verification is the
batched PnP RANSAC; correction is the SE3/SIM3 pose-graph GN from
gslam_tpu.opt.pose_graph, with map points rigidly carried by their
reference keyframe's correction.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gslam_tpu.core.se3 import se3_inverse, se3_mul
from gslam_tpu.estimation.pnp import find_pnp_ransac
from gslam_tpu.map.arena import MapArena, frame_point_ids
from gslam_tpu.ops.matching import match_descriptors
from gslam_tpu.ops.vocab import Vocabulary, score_l2, transform
from gslam_tpu.opt.pose_graph import PoseGraph, optimize_pose_graph


class LoopCloser:
    def __init__(self, voc: Vocabulary, cap_frames: int,
                 min_score: float = 0.25, min_gap: int = 10,
                 min_inliers: int = 20, seed: int = 1,
                 use_pallas: bool = False):
        self.voc = voc
        self.use_pallas = use_pallas
        self.min_score = min_score
        self.min_gap = min_gap
        self.min_inliers = min_inliers
        self.bow_db = np.zeros((cap_frames, voc.n_words), np.float32)
        self.n_kf = 0
        self.key = jax.random.PRNGKey(seed)
        self.closed: List[Tuple[int, int]] = []

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def add_keyframe(self, kf_id: int, desc: jnp.ndarray,
                     valid: jnp.ndarray) -> None:
        bow, _ = transform(self.voc, desc, valid,
                           use_pallas=self.use_pallas)
        self.bow_db[kf_id] = np.asarray(bow)
        self.n_kf = max(self.n_kf, kf_id + 1)

    def detect(self, kf_id: int, top_k: int = 3) -> list:
        """Loop candidates for kf_id, best first (possibly empty)."""
        if self.n_kf <= self.min_gap:
            return []
        q = jnp.asarray(self.bow_db[kf_id])
        db = jnp.asarray(self.bow_db[:self.n_kf])
        scores = np.array(score_l2(q, db))
        # mask out temporally-near keyframes
        lo = max(0, kf_id - self.min_gap)
        scores[lo:] = -1.0
        order = np.argsort(-scores)[:top_k]
        return [int(i) for i in order if scores[i] >= self.min_score]

    def verify(self, arena: MapArena, camera, kf_id: int, cand_id: int,
               max_points: int = 512
               ) -> Optional[Tuple[jnp.ndarray, int]]:
        """Geometric check: current KF features vs candidate's points.

        Returns (T_cw of kf_id in the candidate's (= world) frame,
        n_inliers) or None.
        """
        pids = frame_point_ids(arena, jnp.asarray(cand_id), max_points)
        ok = (pids >= 0) & arena.point_valid[pids.clip(0)]
        xyz = arena.point_xyz[pids.clip(0)]
        pdesc = arena.point_desc[pids.clip(0)]
        fdesc = arena.frame_desc[kf_id]
        fvalid = jnp.arange(fdesc.shape[0]) < arena.frame_kp_count[kf_id]
        # BoW-guided matching (FeatureVector analog): gate candidate
        # pairs to the same vocabulary node two levels above the leaves
        if self.voc.L >= 2:
            from gslam_tpu.ops.matching import match_descriptors_word_gated

            _, wa = transform(self.voc, pdesc, ok,
                              use_pallas=self.use_pallas)
            _, wb = transform(self.voc, fdesc, fvalid,
                              use_pallas=self.use_pallas)
            m = match_descriptors_word_gated(
                pdesc, ok, wa, fdesc, fvalid, wb, ratio=0.9,
                level_div=self.voc.k ** 2)
        else:
            m = match_descriptors(pdesc, ok, fdesc, fvalid, ratio=0.9)
        uv = arena.frame_kp_uv[kf_id][m.idx.clip(0)]
        rays = camera.unproject(uv)[:, :2]
        thr = (2.0 / camera.fx) ** 2
        T, inl, n = find_pnp_ransac(self._next_key(), xyz, rays, m.valid,
                                    threshold=thr)
        if int(n) < self.min_inliers:
            return None
        return T, int(n)

    def close(self, arena: MapArena, camera, kf_id: int,
              imu_edges=None, imu_weight: float = 5.0
              ) -> Tuple[MapArena, bool]:
        """Detect + verify + pose-graph correct.  Returns (arena, did).

        imu_edges: optional [(kf_i, kf_j, dq), ...] preintegrated gyro
        deltas between consecutive keyframes (body_j -> body_i) — added
        as rotation-only edges (diagonal information), so the corrected
        graph stays consistent with inertial rotation measurements.
        """
        ver = None
        cand = None
        for cand in self.detect(kf_id):
            ver = self.verify(arena, camera, kf_id, cand)
            if ver is not None:
                break
        if ver is None:
            return arena, False
        T_loop_cw, _ = ver  # pose of kf_id implied by the loop

        F = int(arena.n_frames)
        poses_cw = arena.frame_pose[:F, :7]
        # odometry edges between consecutive KFs from current estimates
        ei = list(range(1, F))
        ej = list(range(0, F - 1))
        rel = [np.asarray(se3_mul(poses_cw[i], se3_inverse(poses_cw[j])))
               for i, j in zip(ei, ej)]
        w = [np.full(6, 1.0, np.float32) for _ in ei]
        # loop edge: measured relative pose kf_id <- cand
        Z = se3_mul(T_loop_cw, se3_inverse(poses_cw[cand]))
        ei.append(kf_id)
        ej.append(cand)
        rel.append(np.asarray(Z))
        w.append(np.full(6, 50.0, np.float32))
        if imu_edges:
            from gslam_tpu.core.imu import ImuDelta, imu_rotation_edge

            for (i, j, dq) in imu_edges:
                if i >= F or j >= F:
                    continue
                Zi, info = imu_rotation_edge(
                    ImuDelta(dq=jnp.asarray(dq), dv=jnp.zeros(3),
                             dp=jnp.zeros(3), dt=jnp.asarray(0.0)),
                    weight=imu_weight)
                ei.append(i)
                ej.append(j)
                rel.append(np.asarray(Zi))
                w.append(np.asarray(info))

        g = PoseGraph(
            poses=poses_cw,
            fixed=jnp.zeros(F, bool).at[0].set(True),
            edge_i=jnp.asarray(ei, jnp.int32),
            edge_j=jnp.asarray(ej, jnp.int32),
            edge_rel=jnp.asarray(np.stack(rel)),
            edge_valid=jnp.ones(len(ei), bool),
            edge_weight=jnp.asarray(np.stack(w)))
        out, costs = optimize_pose_graph(g, iters=15)

        # write corrected poses; carry each point rigidly with its
        # reference keyframe: X' = T_ref'^-1 * T_ref * X  (cam coords
        # preserved)
        old = poses_cw
        new = out.poses
        from gslam_tpu.core.se3 import se3_apply
        from gslam_tpu.core.sim3 import sim3_from_se3

        ref = arena.point_ref_frame.clip(0, F - 1)
        X_cam = se3_apply(old[ref], arena.point_xyz)
        X_new = se3_apply(se3_inverse(new)[ref], X_cam)
        fp = arena.frame_pose.at[:F, :7].set(new)
        arena = arena.replace(
            frame_pose=fp,
            point_xyz=jnp.where(arena.point_valid[:, None], X_new,
                                arena.point_xyz))
        self.closed.append((kf_id, cand))
        return arena, True
