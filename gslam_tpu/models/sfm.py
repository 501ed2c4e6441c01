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
from gslam_tpu.estimation.epipolar import triangulate
from gslam_tpu.estimation.init2view import two_view_geometry
from gslam_tpu.ops.frontend import extract_features
from gslam_tpu.ops.matching import match_descriptors
from gslam_tpu.opt.ba import (BundleProblem, bundle_adjust,
                              reprojection_errors)
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
                   key, sigma, ransac_B: int = 256) -> PairGeometry:
    """Match one pair and estimate its relative pose (vmapped over pairs).

    Two-view geometry with H/E model selection
    (:mod:`gslam_tpu.estimation.init2view`): essential RANSAC with
    LO refits for general scenes, homography RANSAC + Faugeras
    decomposition for planar/low-parallax pairs — the 8-point essential
    solve alone is degenerate there.  ``sigma`` is keypoint noise in
    normalized units (pixel sigma / focal)."""
    m = match_descriptors(desc_i, valid_i, desc_j, valid_j)
    r2 = jnp.take(rays_j, jnp.maximum(m.idx, 0), axis=0)
    tv = two_view_geometry(key, rays_i[:, :2], r2[:, :2], m.valid,
                           sigma=sigma, B=ransac_B)
    ok = m.valid & tv.inliers
    return PairGeometry(T_ji=tv.T_21, n_inliers=ok.sum().astype(jnp.int32),
                        match_idx=jnp.where(ok, m.idx, -1), match_ok=ok)


_pair_geometry_v = jax.jit(
    jax.vmap(_pair_geometry,
             in_axes=(0, 0, 0, 0, 0, 0, 0, None, None)),
    static_argnames=("ransac_B",))


def _edge_direction(Rji: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
                    ok: jnp.ndarray):
    """Translation direction of one edge given its relative rotation.

    Each inlier pair (x1, x2) of z=1 rays constrains the epipolar
    identity x2^T [t]x R x1 = 0, i.e. t . ((R x1) x x2) = 0: t is the
    nullvector of the stacked cross products (3x3 eigh) — no planar
    degeneracy, unlike 8-point.  Sign fixed by cheirality vote.
    Returns (t_cam_j (3,), support count).
    """
    from gslam_tpu.core.se3 import se3_make
    from gslam_tpu.core.so3 import matrix_to_quat, quat_rotate

    Rx1 = x1 @ Rji.T
    M = jnp.cross(Rx1, x2) * ok[:, None].astype(jnp.float32)
    A = M.T @ M
    _, v = jnp.linalg.eigh(A)
    t = v[:, 0]
    q = matrix_to_quat(Rji)
    eye = se3_make(jnp.zeros(3), jnp.asarray([1.0, 0.0, 0.0, 0.0]))

    def count(tt):
        T21 = se3_make(tt, q)
        X, d1 = triangulate(eye, T21, x1[:, :2], x2[:, :2])
        d2 = (quat_rotate(q, X) + tt)[..., 2]
        return jnp.sum((d1 > 0) & (d2 > 0) & ok)

    cp, cm = count(t), count(-t)
    flip = cm > cp
    return jnp.where(flip, -t, t), jnp.maximum(cp, cm)


_edge_directions_v = jax.jit(jax.vmap(_edge_direction))


def rotation_averaging(edges_ij: np.ndarray, R_rel: np.ndarray,
                       weights: np.ndarray, n_frames: int,
                       irls_rounds: int = 3,
                       huber_deg: float = 10.0) -> jnp.ndarray:
    """Spectral chordal-L2 rotation averaging with IRLS outlier damping.

    edges_ij: (E, 2) int frame pairs (i, j); R_rel: (E, 3, 3) with
    R_j = R_rel @ R_i (world->cam convention); weights: (E,) >= 0.
    Returns (F, 3, 3) global rotations R_i (world->cam), gauge-free.

    Builds the symmetric (3F, 3F) connection matrix G with block
    G[j, i] = w * R_rel and takes its top-3 eigenvectors; each 3x3 row
    block is then projected to SO(3) (procrustes).  After each solve,
    edges are reweighted by a Huber factor on their residual angle
    (angle of R_j (R_rel R_i)^T), so bad relative poses — e.g. from a
    degenerate two-view estimate — lose their vote.  Dense eigh is
    exact and fast for F up to a few thousand; beyond that the same
    matrix supports subspace (power) iteration in pure matmuls.
    """
    F = n_frames
    i, j = edges_ij[:, 0], edges_ij[:, 1]
    w0 = weights.astype(np.float32).copy()
    w = w0.copy()

    def solve(w):
        ww = w[:, None, None].astype(np.float32)
        Gn = np.zeros((F, F, 3, 3), np.float32)
        np.add.at(Gn, (j, i), ww * R_rel)
        np.add.at(Gn, (i, j), ww * np.swapaxes(R_rel, -1, -2))
        G = jnp.asarray(Gn.transpose(0, 2, 1, 3).reshape(3 * F, 3 * F))
        _, vecs = jnp.linalg.eigh(G)
        V = vecs[:, -3:].reshape(F, 3, 3)  # block i ~ R_i @ Q
        # all blocks share det sign (det(R_i Q) = det Q); make positive
        sign = jnp.sign(jnp.sum(jnp.sign(jnp.linalg.det(V))))
        V = V * jnp.where(sign == 0, 1.0, sign)[None, None]

        def project(M):  # nearest rotation (Procrustes)
            u, _, vt = jnp.linalg.svd(M)
            d = jnp.sign(jnp.linalg.det(u @ vt))
            return u @ jnp.diag(jnp.stack([1.0 + 0 * d, 1.0 + 0 * d,
                                           d])) @ vt

        return np.asarray(jax.vmap(project)(V))

    def residual_deg(R):
        res = np.einsum("ekl,eml->ekm", R[j],
                        np.einsum("ekl,elm->ekm", R_rel, R[i]))
        tr = np.clip((np.trace(res, axis1=-2, axis2=-1) - 1.0) / 2.0,
                     -1.0, 1.0)
        return np.degrees(np.arccos(tr))

    # seed with a maximum-weight spanning tree: strong (high-inlier)
    # edges are overwhelmingly the accurate ones, so composing R along
    # the tree gives a reference immune to the correlated failures of
    # weak wide-baseline pairs; edges violently disagreeing with the
    # tree are zeroed before the first spectral solve
    R_tree = np.tile(np.eye(3, dtype=np.float32), (F, 1, 1))
    visited = np.zeros(F, bool)
    visited[0] = True
    # Prim: after every attachment, re-pick the globally heaviest
    # frontier edge (greedy scan-in-order would let weak edges attach
    # frames that a stronger edge could have reached one step later)
    for _ in range(F - 1):
        vi, vj = visited[i], visited[j]
        frontier = vi ^ vj
        if not frontier.any():
            break
        e = np.argmax(np.where(frontier, w0, -1.0))
        a, b = i[e], j[e]
        if visited[a]:
            R_tree[b] = R_rel[e] @ R_tree[a]
            visited[b] = True
        else:
            R_tree[a] = R_rel[e].T @ R_tree[b]
            visited[a] = True
    if visited.all():
        ang0 = residual_deg(R_tree)
        pre = ang0 < 2.0 * huber_deg
        if pre.sum() >= F - 1:
            w0 = np.where(pre, w0, 0.0)  # base weights: IRLS respects trim
        # first solve already sees tree-referenced Geman-McClure weights,
        # so correlated bad edges can't form their own consensus
        w = w0 * huber_deg ** 2 / (huber_deg ** 2 + ang0 ** 2)

    R = solve(w)
    for _ in range(irls_rounds):
        ang = residual_deg(R)
        # Geman-McClure weights: heavy outliers (degenerate two-view
        # poses on wide-baseline pairs) are crushed, not just damped
        w = w0 * huber_deg ** 2 / (huber_deg ** 2 + ang ** 2)
        R = solve(w)
    # final hard trim of residual outliers, then one clean re-solve
    ang = residual_deg(R)
    keep = ang < 2.0 * huber_deg
    if keep.sum() >= F - 1 and (~keep).any():
        R = solve(np.where(keep, w, 0.0))
    return jnp.asarray(R)


def translation_recovery(edges_ij: np.ndarray, t_dir_w: np.ndarray,
                         weights: np.ndarray, n_frames: int,
                         iters: int = 300, s_min: float = 0.05
                         ) -> np.ndarray:
    """Camera centers from pairwise world-frame direction constraints.

    Each edge gives a unit d with (c_i - c_j) parallel (and equal in
    sign) to d.  The naive chordal objective ``min ||[d]x (c_i-c_j)||``
    is degenerate: collapsing any subset of centers to a point has zero
    cost, and its spectral minimizer routinely does exactly that on
    noisy graphs.  Instead we solve the jointly-convex scaled problem
    (Govindu-style alternation):

        min_{c, s}  sum_e w_e ||c_i - c_j - s_e d_e||^2
        s.t.  c_0 = 0,  s_e >= s_min * mean(s)   (excludes collapse)

    alternating a Laplacian solve for c (per-coordinate, SPD, tiny)
    with the closed-form scale update s_e = d_e . (c_i - c_j), clipped
    positive.  Positivity of s bakes in cheirality (the edge direction
    sign), so no separate sign vote is needed.  Returns (F, 3) float64
    centers with c_0 = 0, normalized to ||c|| = 1 (monocular gauge).
    """
    F = n_frames
    E = len(edges_ij)
    d = t_dir_w / np.maximum(np.linalg.norm(t_dir_w, axis=-1, keepdims=True),
                             1e-12)
    w0 = np.maximum(np.asarray(weights, np.float64), 0.0)
    i, j = edges_ij[:, 0], edges_ij[:, 1]

    # joint LINEAR least squares in (c, s): residual rows
    #   sqrt(w_e) (c_i - c_j - s_e d_e) = 0  (3 per edge),
    # gauge c_0 = 0 by dropping its columns, global scale pinned by the
    # penalty row  sum_e s_e = E.  Dense lstsq — the system is
    # (3E+1) x (3(F-1)+E), tiny for view graphs up to thousands of
    # frames; the IRLS loop reweights edge rows by a Huber factor on
    # the residual norm so outlier directions are shed.  (The previous
    # alternating scheme could collapse subsets of centers; the joint
    # solve has no such fixed points: the scale row forbids s -> 0 and
    # each s_e is coupled to c in ONE linear system.)
    nC = 3 * (F - 1)
    rows3 = np.arange(3 * E).reshape(E, 3)
    w = w0.copy()
    c = np.zeros((F, 3))
    s = np.ones(E)
    for _ in range(4):
        sw = np.sqrt(w)
        A = np.zeros((3 * E + 1, nC + E))
        b = np.zeros(3 * E + 1)
        for k in range(3):
            rk = rows3[:, k]
            mask_i = i >= 1
            A[rk[mask_i], 3 * (i[mask_i] - 1) + k] = sw[mask_i]
            mask_j = j >= 1
            A[rk[mask_j], 3 * (j[mask_j] - 1) + k] -= sw[mask_j]
            A[rk, nC + np.arange(E)] = -sw * d[:, k]
        scale_w = 10.0 * (sw.max() + 1e-18)
        A[-1, nC:] = scale_w
        b[-1] = scale_w * E
        x = np.linalg.lstsq(A, b, rcond=None)[0]
        c = np.concatenate([np.zeros(3), x[:nC]]).reshape(F, 3)
        s = x[nC:]
        r = np.linalg.norm(c[i] - c[j] - s[:, None] * d, axis=-1)
        mad = np.median(r) + 1e-18
        w = w0 * np.minimum(1.0, 1.5 * mad / np.maximum(r, 1e-18))
    c /= max(np.linalg.norm(c), 1e-18)
    return c


class GlobalSfM:
    """Reference 'SLAM' contract for an offline reconstructor:
    ``track(frame)`` buffers; the reconstruction runs once on demand
    (``finalize()`` / first ``positions()`` call)."""

    def __init__(self, camera: Camera, max_kps: int = 512,
                 fast_threshold: float = 0.06, min_pair_inliers: int = 30,
                 pair_chunk: int = 32, ransac_B: int = 256,
                 sigma_px: float = 1.0,
                 max_points: int = 4096, max_obs: int = 16,
                 ba_iters: int = 15, seed: int = 0):
        self.camera = camera
        self.max_kps = max_kps
        self.fast_threshold = fast_threshold
        self.min_pair_inliers = min_pair_inliers
        self.pair_chunk = pair_chunk
        self.ransac_B = ransac_B
        # keypoint noise in normalized units; generous ~1 px sigma is
        # load-bearing for H/E model selection (init2view)
        self.sigma = sigma_px / float(camera.fx)
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
                                     keys, self.sigma,
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

        # per-edge translation directions RE-derived with the averaged
        # rotations fixed: each inlier correspondence constrains
        # t . ((R_ji x1) x x2) = 0, a well-conditioned 3-DoF nullvector
        # problem with NO planar degeneracy — far better than trusting
        # the two-view t (8-point/H ambiguities).  Sign by cheirality.
        # Then world directions: t_ji = R_j (c_i - c_j) => d = R_j^T t.
        with timer.section("sfm/translations"):
            Rji = np.einsum("ekl,eml->ekm", R[edges[:, 1]], R[edges[:, 0]])
            r1_all = np.asarray(rays)                   # (F, K, 3)
            midx = np.asarray(G.match_idx)[keep]        # (E, K)
            mok = np.asarray(G.match_ok)[keep]
            x1 = r1_all[edges[:, 0]]                    # (E, K, 3)
            x2 = np.take_along_axis(r1_all[edges[:, 1]],
                                    np.maximum(midx, 0)[..., None], axis=1)
            t_cam, n_support = _edge_directions_v(
                jnp.asarray(Rji), jnp.asarray(x1), jnp.asarray(x2),
                jnp.asarray(mok))
            t_cam = np.asarray(t_cam)
            d_w = np.einsum("ekl,ek->el", R[edges[:, 1]], t_cam)
            w_t = w * np.maximum(np.asarray(n_support), 1) / np.maximum(
                mok.sum(-1), 1)
            centers = translation_recovery(edges, d_w, w_t, F)

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
                # prune observation outliers (5 sigma, then 3 sigma),
                # re-fix under-constrained points, re-optimize — wrong
                # matches that survived the pairwise gates otherwise
                # anchor the local minimum
                n0 = int(np.asarray(problem.obs_valid).sum())
                costs = [float(ba_stats.cost[0]),
                         float(ba_stats.cost[-1])]
                for k_sig in (5.0, 3.0):
                    errs, evalid = reprojection_errors(problem)
                    keep = problem.obs_valid & evalid & (
                        errs < k_sig * self.sigma)
                    problem = problem._replace(
                        obs_valid=keep,
                        point_fixed=problem.point_fixed | (
                            keep.sum(-1) < 2))
                    problem, st = bundle_adjust(problem,
                                                iters=self.ba_iters)
                    costs.append(float(st.cost[-1]))
                timer.block(problem.cam_pose)
                poses_cw = np.asarray(problem.cam_pose)
                log.info("sfm: global BA cost %s (%d/%d obs kept)",
                         " -> ".join("%.3g" % c for c in costs),
                         int(np.asarray(problem.obs_valid).sum()), n0)

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
        # gate points triangulated at/near infinity (tiny parallax):
        # finite-but-huge coordinates overflow f32 normal equations
        pt_ok = (np.isfinite(Xw).all(-1) & (depth > 1e-3)
                 & (np.linalg.norm(Xw, axis=-1) < 1e4) & (obs_n >= 2))
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
