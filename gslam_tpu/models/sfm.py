"""Offline global structure-from-motion — the TheiaSfM plugin-family analog.

The reference treats batch SfM as just another SLAM plugin (its
TheiaSfM wrapper consumes frames via ``SLAM::track`` and reconstructs
at the end; cf. ``GSLAM/core/GSLAM.h`` plugin contract, SURVEY §2 row
23).  This module rebuilds that capability TPU-first as a *global* SfM
pipeline — every stage is a batched device computation instead of the
reference ecosystem's incremental CPU solvers:

1. feature extraction per frame (one jitted FAST+BRIEF graph, reused);
2. exhaustive pairwise matching + two-view geometry: all pairs pushed
   through ONE vmapped jitted graph in chunks — GEMM Hamming matching,
   essential-matrix RANSAC, cheirality decomposition (MXU-batched);
3. rotation averaging: spectral relaxation of the chordal-L2 problem —
   a dense symmetric (3F, 3F) block matrix of pairwise rotations whose
   top-3 eigenvectors give the global rotations (one eigh; MXU/VPU
   friendly, no incremental graph walking);
4. translation recovery: with rotations known each pair constrains the
   camera-center difference to a known world direction; the stacked
   cross-product least-squares system is solved by a second small eigh
   (gauge: c_0 = 0, ||c|| = 1, sign by cheirality vote);
5. track building (host-side union-find over inlier matches — the only
   inherently sequential stage, microseconds of scalar work);
6. batched two-view triangulation of tracks + global bundle adjustment
   (``gslam_tpu.opt.ba``, the same Schur-reduced LM used by SLAM).

Scale is up-to-gauge (monocular): evaluate with Sim3 alignment.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gslam_tpu.app.registry import SLAMS
from gslam_tpu.core.camera import Camera
from gslam_tpu.core.se3 import se3_inverse, se3_make
from gslam_tpu.core.so3 import matrix_to_quat, quat_to_matrix
from gslam_tpu.datasets.base import FrameData
from gslam_tpu.estimation.epipolar import (_eight_point, _force_essential,
                                           decompose_essential,
                                           find_essential, sampson_distance,
                                           triangulate)
from gslam_tpu.ops.frontend import extract_features
from gslam_tpu.ops.matching import match_descriptors
from gslam_tpu.opt.ba import BundleProblem, bundle_adjust
from gslam_tpu.utils.logging import get_logger
from gslam_tpu.utils.timer import timer

log = get_logger(__name__)


class PairGeometry(NamedTuple):
    """Two-view geometry of one frame pair (i -> j)."""

    T_ji: jnp.ndarray        # (7,) relative SE3: x_j = T_ji * x_i, |t|=1
    n_inliers: jnp.ndarray   # () int32 essential-inlier count
    match_idx: jnp.ndarray   # (K,) int32 kp index in j per kp of i (-1)
    match_ok: jnp.ndarray    # (K,) bool  match is an essential inlier


@partial(jax.jit, static_argnames=("ransac_B",))
def _pair_geometry(desc_i, valid_i, rays_i, desc_j, valid_j, rays_j,
                   key, threshold, ransac_B: int = 256) -> PairGeometry:
    """Match one pair and estimate its relative pose (vmapped over pairs).

    RANSAC essential + two rounds of local optimization (refit the
    8-point LS on the 64 lowest-Sampson correspondences — LO-RANSAC
    style; an all-inlier minimal draw is rare at the ~40% inlier
    ratios wide-baseline pairs produce, the LS refit recovers it)."""
    m = match_descriptors(desc_i, valid_i, desc_j, valid_j)
    r2 = jnp.take(rays_j, jnp.maximum(m.idx, 0), axis=0)
    E, inl, _ = find_essential(key, rays_i[:, :2], r2[:, :2], m.valid,
                               threshold=threshold, B=ransac_B)
    data = jnp.concatenate([rays_i[:, :2], r2[:, :2]], -1)

    def lo_round(carry, _):
        E, inl = carry
        d = sampson_distance(E, data)
        order = jnp.argsort(jnp.where(m.valid, d, jnp.inf))[:64]
        E2 = _force_essential(_eight_point(data[order]))
        inl2 = (sampson_distance(E2, data) < threshold) & m.valid
        better = inl2.sum() > inl.sum()
        return (jnp.where(better, E2, E), jnp.where(better, inl2, inl)), None

    (E, inl), _ = jax.lax.scan(lo_round, (E, inl), None, length=2)
    ok = m.valid & inl
    T_ji, n_good = decompose_essential(E, rays_i[:, :2], r2[:, :2], ok)
    return PairGeometry(T_ji=T_ji, n_inliers=n_good.astype(jnp.int32),
                        match_idx=jnp.where(ok, m.idx, -1), match_ok=ok)


_pair_geometry_v = jax.jit(
    jax.vmap(_pair_geometry,
             in_axes=(0, 0, 0, 0, 0, 0, 0, None, None)),
    static_argnames=("ransac_B",))


def rotation_averaging(edges_ij: np.ndarray, R_rel: np.ndarray,
                       weights: np.ndarray, n_frames: int) -> jnp.ndarray:
    """Spectral chordal-L2 rotation averaging.

    edges_ij: (E, 2) int frame pairs (i, j); R_rel: (E, 3, 3) with
    R_j = R_rel @ R_i (world->cam convention); weights: (E,) >= 0.
    Returns (F, 3, 3) global rotations R_i (world->cam), gauge-free.

    Builds the symmetric (3F, 3F) connection matrix G with block
    G[j, i] = w * R_rel and takes its top-3 eigenvectors; each 3x3 row
    block is then projected to SO(3) (procrustes).  Dense eigh is exact
    and fast for F up to a few thousand; beyond that the same matrix
    supports subspace (power) iteration in pure matmuls.
    """
    F = n_frames
    i, j = edges_ij[:, 0], edges_ij[:, 1]
    w = weights[:, None, None].astype(np.float32)
    Gn = np.zeros((F, F, 3, 3), np.float32)
    np.add.at(Gn, (j, i), w * R_rel)
    np.add.at(Gn, (i, j), w * np.swapaxes(R_rel, -1, -2))
    G = jnp.asarray(Gn.transpose(0, 2, 1, 3).reshape(3 * F, 3 * F))
    _, vecs = jnp.linalg.eigh(G)
    V = vecs[:, -3:].reshape(F, 3, 3)  # block i ~ R_i @ Q
    # all blocks share det sign (det(R_i Q) = det Q); make it positive
    sign = jnp.sign(jnp.sum(jnp.sign(jnp.linalg.det(V))))
    V = V * jnp.where(sign == 0, 1.0, sign)[None, None]

    def project(M):  # nearest rotation (Procrustes)
        u, _, vt = jnp.linalg.svd(M)
        d = jnp.sign(jnp.linalg.det(u @ vt))
        return u @ jnp.diag(jnp.stack([1.0 + 0 * d, 1.0 + 0 * d, d])) @ vt

    return jax.vmap(project)(V)


def translation_recovery(edges_ij: np.ndarray, t_dir_w: np.ndarray,
                         weights: np.ndarray, n_frames: int) -> np.ndarray:
    """Camera centers from pairwise world-frame direction constraints.

    Each edge gives a unit d with (c_i - c_j) parallel to d; minimize
    sum w * ||[d]x (c_i - c_j)||^2 subject to c_0 = 0, ||c|| = 1 (the
    monocular gauge).  Solved as the smallest eigenvector of the
    reduced (3(F-1), 3(F-1)) normal matrix; the global sign is fixed by
    a cheirality vote (majority of edges must have d . (c_i - c_j) > 0).
    Returns (F, 3) float64 camera centers (unit overall scale).
    """
    F = n_frames
    E = len(edges_ij)
    d = t_dir_w / np.maximum(np.linalg.norm(t_dir_w, axis=-1, keepdims=True),
                             1e-12)
    # cross-product matrices [d]x : (E, 3, 3)
    Dx = np.zeros((E, 3, 3))
    Dx[:, 0, 1], Dx[:, 0, 2] = -d[:, 2], d[:, 1]
    Dx[:, 1, 0], Dx[:, 1, 2] = d[:, 2], -d[:, 0]
    Dx[:, 2, 0], Dx[:, 2, 1] = -d[:, 1], d[:, 0]
    sw = np.sqrt(np.maximum(weights, 0.0))[:, None, None]
    A = np.zeros((3 * E, 3 * F))
    rows = np.arange(3 * E).reshape(E, 3)
    for k, (i, j) in enumerate(edges_ij):
        A[rows[k], 3 * i:3 * i + 3] = (sw[k] * Dx[k])
        A[rows[k], 3 * j:3 * j + 3] = -(sw[k] * Dx[k])
    Ar = A[:, 3:]                       # gauge: c_0 = 0
    H = Ar.T @ Ar
    vals, vecs = np.linalg.eigh(H)
    c = np.concatenate([np.zeros(3), vecs[:, 0]]).reshape(F, 3)
    # sign by cheirality: translation direction must agree with centers
    i, j = edges_ij[:, 0], edges_ij[:, 1]
    dots = np.einsum("ek,ek->e", d, c[i] - c[j])
    if np.sum(weights * np.sign(dots)) < 0:
        c = -c
    return c


class GlobalSfM:
    """Reference 'SLAM' contract for an offline reconstructor:
    ``track(frame)`` buffers; the reconstruction runs once on demand
    (``finalize()`` / first ``positions()`` call)."""

    def __init__(self, camera: Camera, max_kps: int = 512,
                 fast_threshold: float = 0.06, min_pair_inliers: int = 30,
                 pair_chunk: int = 32, ransac_B: int = 256,
                 essential_threshold: float = 4e-6,
                 max_points: int = 4096, max_obs: int = 16,
                 ba_iters: int = 15, seed: int = 0):
        self.camera = camera
        self.max_kps = max_kps
        self.fast_threshold = fast_threshold
        self.min_pair_inliers = min_pair_inliers
        self.pair_chunk = pair_chunk
        self.ransac_B = ransac_B
        self.essential_threshold = essential_threshold
        self.max_points = max_points
        self.max_obs = max_obs
        self.ba_iters = ba_iters
        self.key = jax.random.PRNGKey(seed)
        self.frames: List[FrameData] = []
        self.stats: List[dict] = []
        self._result = None

    # -- SLAM contract ----------------------------------------------------
    def track(self, frame: FrameData) -> np.ndarray:
        self.frames.append(frame)
        self._result = None
        self.stats.append({"buffered": len(self.frames)})
        return np.array([0, 0, 0, 1, 0, 0, 0], np.float32)  # placeholder

    def positions(self) -> np.ndarray:
        return self.finalize()["centers"]

    @property
    def trajectory(self) -> List[np.ndarray]:
        self.finalize()
        return [p for p in self._result["pose_wc"]]

    # -- pipeline ----------------------------------------------------------
    def finalize(self) -> dict:
        if self._result is not None:
            return self._result
        F = len(self.frames)
        if F < 3:
            raise ValueError("global SfM needs >= 3 frames")

        with timer.section("sfm/extract"):
            feats = [extract_features(jnp.asarray(f.image),
                                      max_kps=self.max_kps,
                                      threshold=self.fast_threshold)
                     for f in self.frames]
            desc = jnp.stack([f.desc for f in feats])
            valid = jnp.stack([f.valid for f in feats])
            rays = jnp.stack([self.camera.unproject(f.uv) for f in feats])
            timer.block(rays)

        # all pairs through the vmapped two-view graph, in chunks
        pairs = np.array([(i, j) for i in range(F) for j in range(i + 1, F)],
                         np.int32)
        geoms: List[PairGeometry] = []
        with timer.section("sfm/pairs"):
            for s in range(0, len(pairs), self.pair_chunk):
                chunk = pairs[s:s + self.pair_chunk]
                i, j = chunk[:, 0], chunk[:, 1]
                self.key, sub = jax.random.split(self.key)
                keys = jax.random.split(sub, len(chunk))
                g = _pair_geometry_v(desc[i], valid[i], rays[i],
                                     desc[j], valid[j], rays[j],
                                     keys, self.essential_threshold,
                                     self.ransac_B)
                geoms.append(jax.device_get(g))
            timer.block(None)
        G = PairGeometry(*[np.concatenate([getattr(g, f) for g in geoms])
                           for f in PairGeometry._fields])

        keep = G.n_inliers >= self.min_pair_inliers
        edges = pairs[keep]
        if len(edges) < F - 1:
            log.warning("sfm: view graph weak (%d edges for %d frames)",
                        len(edges), F)
        T_rel = G.T_ji[keep]                     # (E, 7) x_j = T * x_i
        w = G.n_inliers[keep].astype(np.float64)
        w = w / w.max()

        with timer.section("sfm/rotations"):
            R_rel = np.asarray(
                jax.vmap(quat_to_matrix)(jnp.asarray(T_rel[:, 3:7])))
            R = np.asarray(rotation_averaging(edges, R_rel, w, F))
            timer.block(None)

        # world directions: t_ji = R_j (c_i - c_j)  =>  d_w = R_j^T t_ji
        with timer.section("sfm/translations"):
            Rj = R[edges[:, 1]]
            d_w = np.einsum("ekl,ek->el", Rj, T_rel[:, :3])
            centers = translation_recovery(edges, d_w, w, F)

        # world->cam poses: t = -R c
        t = -np.einsum("fkl,fl->fk", R, centers)
        q = np.asarray(jax.vmap(matrix_to_quat)(jnp.asarray(R)))
        poses_cw = np.concatenate([t, q], -1).astype(np.float32)  # (F, 7)

        with timer.section("sfm/tracks"):
            problem = self._build_tracks(poses_cw, rays, G, pairs, keep)

        with timer.section("sfm/global_ba"):
            if problem is not None:
                problem, ba_stats = bundle_adjust(problem,
                                                  iters=self.ba_iters)
                timer.block(problem.cam_pose)
                poses_cw = np.asarray(problem.cam_pose)
                log.info("sfm: global BA cost %.3g -> %.3g",
                         float(ba_stats.cost[0]),
                         float(ba_stats.cost[-1]))

        Rw = np.asarray(jax.vmap(quat_to_matrix)(jnp.asarray(poses_cw[:, 3:7])))
        centers = -np.einsum("fkl,fk->fl", Rw, poses_cw[:, :3])
        pose_wc = np.stack([np.asarray(se3_inverse(jnp.asarray(p)))
                            for p in poses_cw])
        self._result = {
            "pose_cw": poses_cw, "pose_wc": pose_wc, "centers": centers,
            "points": (np.asarray(problem.point_xyz)
                       if problem is not None else np.zeros((0, 3))),
            "n_edges": int(len(edges)), "n_frames": F,
        }
        return self._result

    # -- tracks + BA problem ------------------------------------------------
    def _build_tracks(self, poses_cw: np.ndarray, rays: jnp.ndarray,
                      G: PairGeometry, pairs: np.ndarray,
                      keep: np.ndarray) -> Optional[BundleProblem]:
        """Union-find track building over inlier matches, then batched
        two-view triangulation (extreme baseline) into a BundleProblem."""
        F, K = rays.shape[0], rays.shape[1]
        parent = np.arange(F * K)

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        midx = np.asarray(G.match_idx)
        mok = np.asarray(G.match_ok)
        for e in np.nonzero(keep)[0]:
            i, j = pairs[e]
            for ki in np.nonzero(mok[e])[0]:
                a, b = find(i * K + ki), find(j * K + int(midx[e, ki]))
                if a != b:
                    parent[a] = b
        roots = np.fromiter((find(a) for a in range(F * K)), np.int64)
        uniq, inv, cnt = np.unique(roots, return_inverse=True,
                                   return_counts=True)
        good = cnt >= 2
        track_of = np.where(good[inv], inv, -1)

        # collect per-track observations (frame, kp), bounded
        order = np.argsort(track_of, kind="stable")
        ordered = track_of[order]
        tids = np.unique(ordered[ordered >= 0])
        if len(tids) == 0:
            return None
        P = min(len(tids), self.max_points)
        O = self.max_obs
        obs_cam = np.zeros((P, O), np.int32)
        obs_kp = np.zeros((P, O), np.int32)
        obs_n = np.zeros(P, np.int32)
        remap = {int(t): n for n, t in enumerate(tids[:P])}
        for node in order[ordered >= 0]:
            t = remap.get(int(track_of[node]))
            if t is None or obs_n[t] >= O:
                continue
            obs_cam[t, obs_n[t]] = node // K
            obs_kp[t, obs_n[t]] = node % K
            obs_n[t] += 1
        valid = np.arange(O)[None, :] < obs_n[:, None]

        rays_np = np.asarray(rays)
        uv = rays_np[obs_cam, obs_kp, :2]        # (P, O, 2) normalized
        # triangulate from the two extreme observations (max index gap)
        first = np.zeros(P, np.int32)
        last = np.maximum(obs_n - 1, 0)
        Tp = jnp.asarray(poses_cw)
        Xw, depth = jax.vmap(
            lambda t1, t2, r1, r2: triangulate(t1, t2, r1[None], r2[None])
        )(Tp[obs_cam[np.arange(P), first]],
          Tp[obs_cam[np.arange(P), last]],
          jnp.asarray(uv[np.arange(P), first]),
          jnp.asarray(uv[np.arange(P), last]))
        Xw = np.asarray(Xw)[:, 0]
        depth = np.asarray(depth)[:, 0]
        pt_ok = np.isfinite(Xw).all(-1) & (depth > 1e-3) & (obs_n >= 2)
        valid &= pt_ok[:, None]

        return BundleProblem(
            cam_pose=jnp.asarray(poses_cw),
            cam_fixed=jnp.zeros(len(poses_cw), bool).at[0].set(True),
            point_xyz=jnp.asarray(np.where(pt_ok[:, None], Xw, 0.0)
                                  .astype(np.float32)),
            point_fixed=jnp.asarray(~pt_ok),
            obs_cam=jnp.asarray(obs_cam),
            obs_uv=jnp.asarray(uv.astype(np.float32)),
            obs_valid=jnp.asarray(valid),
            obs_weight=jnp.asarray(valid.astype(np.float32)),
        )


@SLAMS.register("sfm")
def _make_sfm(camera: Camera, **kw) -> GlobalSfM:
    return GlobalSfM(camera, **kw)
