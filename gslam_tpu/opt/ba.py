"""Bundle adjustment: Levenberg-Marquardt with GEMM-formulated Schur.

The reference describes BA problems with ``BundleGraph`` structs and
solves them in a CPU LM plugin (``GSLAM/core/Optimizer.h``: camera blocks
'KeyFrameEstimzation', landmark blocks 'MapPointEstimation', projection
edges 'BundleEdge' with information, robust kernels; called from local
mapping (SURVEY 3.3) and loop closing (3.4) — the "HOTTEST LOOP").

TPU-first formulation
---------------------
Observations live in a *per-point padded layout* (P points x O slots):
every point carries up to O observations (camera index, measurement,
validity).  This makes every LM stage a batched dense op:

* residuals/Jacobians: (P, O, 2, 6|3) einsums (analytic, no autodiff in
  the hot path; verified against jax.jacobian in tests);
* Hpp: per-point 3x3 blocks -> one batched 3x3 inverse;
* Hcc/bc: segment-sum scatter over camera ids;
* the reduced camera system S = Hcc - W Hpp^-1 W^T with W assembled as a
  DENSE (6C, 3P) block matrix -> the Schur reduction is one (6C, 3P) x
  (3P, 6C) GEMM on the MXU.  For local BA (C <= 64, P <= 8k) this is
  both simpler and faster than sparse scatter; the landmark-sharded
  distributed version (psum over shards) is gslam_tpu.parallel.
* solve: Cholesky on (6C, 6C); fixed cameras/points handled by zeroing
  their Jacobians and pinning unit diagonals;
* LM loop: lax.scan over iterations, accept/reject via lax.cond-free
  where-select, multiplicative damping update.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gslam_tpu.core.se3 import se3_apply, se3_exp, se3_mul
from gslam_tpu.core.so3 import quat_rotate, quat_to_matrix
from gslam_tpu.opt.robust import huber_weight

_EPS = 1e-12


class BundleProblem(NamedTuple):
    """BundleGraph analog, SoA + per-point padded observations."""

    cam_pose: jnp.ndarray    # (C, 7) SE3 world->cam
    cam_fixed: jnp.ndarray   # (C,) bool
    point_xyz: jnp.ndarray   # (P, 3)
    point_fixed: jnp.ndarray  # (P,) bool
    obs_cam: jnp.ndarray     # (P, O) int32
    obs_uv: jnp.ndarray      # (P, O, 2) normalized image coords
    obs_valid: jnp.ndarray   # (P, O) bool
    obs_weight: jnp.ndarray  # (P, O) information (1/sigma^2)


class BAStats(NamedTuple):
    cost: jnp.ndarray        # per-iteration chi2 (iters+1,)
    accepted: jnp.ndarray    # (iters,) bool
    final_lambda: jnp.ndarray


def _project_residual_jac(problem: BundleProblem
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                     jnp.ndarray]:
    """Residuals r (P,O,2), Jc (P,O,2,6), Jp (P,O,2,3), valid mask.

    Left-multiplicative SE3 twist convention [rho, phi]:
    d(pc)/d(twist) = [I | -hat(pc)], chain-ruled through the pinhole
    projection; Jp = dproj * R.
    """
    poses = problem.cam_pose[problem.obs_cam]          # (P, O, 7)
    pc = se3_apply(poses, problem.point_xyz[:, None])  # (P, O, 3)
    x, y = pc[..., 0], pc[..., 1]
    z = pc[..., 2]
    front = z > 1e-6
    zs = jnp.where(front, z, 1.0)
    iz = 1.0 / zs
    proj = pc[..., :2] * iz[..., None]
    r = proj - problem.obs_uv                          # (P, O, 2)

    zero = jnp.zeros_like(x)
    iz2 = iz * iz
    # rows of dproj/dtwist (2 x 6)
    Jx = jnp.stack([iz, zero, -x * iz2,
                    -x * y * iz2, 1.0 + x * x * iz2, -y * iz], -1)
    Jy = jnp.stack([zero, iz, -y * iz2,
                    -(1.0 + y * y * iz2), x * y * iz2, x * iz], -1)
    Jc = jnp.stack([Jx, Jy], -2)                       # (P, O, 2, 6)

    # dproj/dpc (2x3) @ R
    R = quat_to_matrix(poses[..., 3:7])                # (P, O, 3, 3)
    dproj = jnp.stack([
        jnp.stack([iz, zero, -x * iz2], -1),
        jnp.stack([zero, iz, -y * iz2], -1)], -2)      # (P, O, 2, 3)
    Jp = dproj @ R                                     # (P, O, 2, 3)

    valid = problem.obs_valid & front
    return r, Jc, Jp, valid


def reprojection_errors(problem: BundleProblem
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-observation reprojection error norm (P, O) + validity mask.

    For outlier pruning between BA rounds (observations behind the
    camera are reported invalid)."""
    r, _, _, valid = _project_residual_jac(problem)
    return jnp.linalg.norm(r, axis=-1), valid


def ba_cost(problem: BundleProblem, huber_delta: float = 0.01
            ) -> jnp.ndarray:
    """Total robust chi2 (for tests/monitoring)."""
    r, _, _, valid = _project_residual_jac(problem)
    e = jnp.linalg.norm(r, axis=-1)
    w = problem.obs_weight * huber_weight(e, huber_delta)
    return jnp.sum(jnp.where(valid, w * e * e, 0.0))


def schur_reduce(prob: BundleProblem, lam, huber_delta: float
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray, jnp.ndarray]:
    """Landmark-eliminated (Schur-reduced) vision normal equations.

    The numerically subtle core shared by :func:`bundle_adjust` and the
    visual-inertial LM (:mod:`gslam_tpu.opt.vi`): robust-weighted
    residual/Jacobian assembly, per-point 3x3 Hpp inversion, dense-W
    GEMM reduction.  Returns (S (6C, 6C), b_s (6C,), Wf (6C, 3P),
    Hpp_inv (P, 3, 3), bp (P, 3)) for the CURRENT state in ``prob``.
    """
    C = prob.cam_pose.shape[0]
    P = prob.point_xyz.shape[0]
    O = prob.obs_cam.shape[1]
    cam_free = ~prob.cam_fixed
    pt_free = ~prob.point_fixed

    r, Jc, Jp, valid = _project_residual_jac(prob)
    e = jnp.linalg.norm(r, axis=-1)
    w = prob.obs_weight * huber_weight(e, huber_delta)
    w = jnp.where(valid, w, 0.0)                   # (P, O)
    # zero out Jacobians of fixed blocks
    Jc = Jc * cam_free[prob.obs_cam][..., None, None]
    Jp = Jp * pt_free[:, None, None, None]

    sw = w[..., None, None]
    # per-point landmark blocks
    Hpp = jnp.einsum("poia,poib->pab", Jp * sw, Jp)  # (P, 3, 3)
    bp = jnp.einsum("poia,poi->pa", Jp * sw, r)      # (P, 3)
    # camera blocks via segment scatter
    Hcc_e = jnp.einsum("poia,poib->poab", Jc * sw, Jc)  # (P, O, 6, 6)
    bc_e = jnp.einsum("poia,poi->poa", Jc * sw, r)
    cam_flat = prob.obs_cam.reshape(-1)
    Hcc = jnp.zeros((C, 6, 6)).at[cam_flat].add(
        Hcc_e.reshape(-1, 6, 6))
    bc = jnp.zeros((C, 6)).at[cam_flat].add(bc_e.reshape(-1, 6))
    # W blocks, dense layout (6C, 3P)
    W_e = jnp.einsum("poia,poib->poab", Jc * sw, Jp)  # (P, O, 6, 3)
    Wd = jnp.zeros((C, 6, P, 3)).at[prob.obs_cam.reshape(-1),
                                    :,
                                    jnp.repeat(jnp.arange(P), O),
                                    :].add(
        W_e.reshape(-1, 6, 3))

    # damping
    Hpp = Hpp + (lam * jnp.eye(3))[None]
    # pin fixed points so the 3x3 inverse is well-defined
    Hpp = jnp.where(pt_free[:, None, None], Hpp, jnp.eye(3)[None])
    Hcc = Hcc + (lam * jnp.eye(6))[None]
    Hcc = jnp.where(cam_free[:, None, None], Hcc, jnp.eye(6)[None])

    Hpp_inv = jnp.linalg.inv(Hpp)                   # (P, 3, 3)
    bp = bp * pt_free[:, None]
    bc = bc * cam_free[:, None]

    # Schur: S = Hcc - W Hpp^-1 W^T as one GEMM
    Wf = Wd.reshape(C * 6, P * 3)
    Y = jnp.einsum("cpq,pqr->cpr",
                   Wd.reshape(C * 6, P, 3), Hpp_inv)  # (6C, P, 3)
    Yf = Y.reshape(C * 6, P * 3)
    # dense block-diagonal Hcc -> (6C, 6C)
    ii = jnp.arange(C)
    rows = jnp.broadcast_to(
        ii[:, None, None] * 6 + jnp.arange(6)[None, :, None],
        (C, 6, 6)).reshape(-1)
    cols = jnp.broadcast_to(
        ii[:, None, None] * 6 + jnp.arange(6)[None, None, :],
        (C, 6, 6)).reshape(-1)
    Hcc_d = jnp.zeros((C * 6, C * 6)).at[rows, cols].set(
        Hcc.reshape(-1))
    S = Hcc_d - jnp.dot(Yf, Wf.T,
                        preferred_element_type=jnp.float32)
    b_s = bc.reshape(-1) - Yf @ (bp.reshape(-1))
    return S, b_s, Wf, Hpp_inv, bp


@partial(jax.jit, static_argnames=("iters", "huber_delta"))
def bundle_adjust(problem: BundleProblem, iters: int = 10,
                  lm_lambda0: float = 1e-4, huber_delta: float = 0.01
                  ) -> Tuple[BundleProblem, BAStats]:
    """LM bundle adjustment; returns updated problem + stats.

    All shapes static; `iters` LM steps with accept/reject damping.
    """
    C = problem.cam_pose.shape[0]
    P = problem.point_xyz.shape[0]

    cam_free = ~problem.cam_fixed
    pt_free = ~problem.point_fixed

    def normal_equations(cam_pose, point_xyz, lam):
        prob = problem._replace(cam_pose=cam_pose, point_xyz=point_xyz)
        return schur_reduce(prob, lam, huber_delta)

    def apply_update(cam_pose, point_xyz, S, b_s, Wf, Hpp_inv, bp):
        # solve reduced camera system (solve with jitter fallback)
        dxc = -jnp.linalg.solve(
            S + 1e-8 * jnp.eye(S.shape[0]), b_s)        # (6C,)
        dxc = dxc.reshape(C, 6) * cam_free[:, None]
        # back-substitute landmarks:
        # dxp = -Hpp^-1 (bp + W^T dxc)
        Wt_dxc = (Wf.T @ dxc.reshape(-1)).reshape(P, 3)
        dxp = -jnp.einsum("pab,pb->pa", Hpp_inv, bp + Wt_dxc)
        dxp = dxp * pt_free[:, None]
        new_pose = se3_mul(se3_exp(dxc), cam_pose)
        new_xyz = point_xyz + dxp
        return new_pose, new_xyz

    def cost_of(cam_pose, point_xyz):
        prob = problem._replace(cam_pose=cam_pose, point_xyz=point_xyz)
        return ba_cost(prob, huber_delta)

    def lm_step(state, _):
        cam_pose, point_xyz, lam, cost = state
        S, b_s, Wf, Hpp_inv, bp = normal_equations(cam_pose, point_xyz, lam)
        new_pose, new_xyz = apply_update(cam_pose, point_xyz, S, b_s, Wf,
                                         Hpp_inv, bp)
        new_cost = cost_of(new_pose, new_xyz)
        # NaN poses can zero-out every observation's validity mask and
        # masquerade as cost 0, so finiteness of the STATE is part of
        # the acceptance test, not just finiteness of the cost
        accept = ((new_cost < cost) & jnp.isfinite(new_cost)
                  & jnp.isfinite(new_pose).all()
                  & jnp.isfinite(new_xyz).all())
        cam_pose = jnp.where(accept, new_pose, cam_pose)
        point_xyz = jnp.where(accept, new_xyz, point_xyz)
        cost_out = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0).clip(1e-9, 1e3)
        return (cam_pose, point_xyz, lam, cost_out), (cost_out, accept)

    cost0 = cost_of(problem.cam_pose, problem.point_xyz)
    init = (problem.cam_pose, problem.point_xyz,
            jnp.asarray(lm_lambda0, jnp.float32), cost0)
    (cam_pose, point_xyz, lam, _), (costs, accs) = jax.lax.scan(
        lm_step, init, None, length=iters)

    out = problem._replace(cam_pose=cam_pose, point_xyz=point_xyz)
    stats = BAStats(cost=jnp.concatenate([cost0[None], costs]),
                    accepted=accs, final_lambda=lam)
    return out, stats


# ---------------------------------------------------------------------------
# arena bridging (local-BA window extraction / write-back; SURVEY 3.3)


def build_problem_from_arena(arena, cam_ids: jnp.ndarray,
                             point_ids: jnp.ndarray,
                             fixed_cam_mask: jnp.ndarray,
                             camera, max_obs_per_point: int = 16
                             ) -> Tuple[BundleProblem, jnp.ndarray]:
    """Extract a BA window from the map arena.

    cam_ids (C,): arena frame slots in the window (-1 pad).
    point_ids (P,): arena point slots (-1 pad).
    Observations are gathered from the arena edge list and re-indexed to
    window-local indices in a per-point padded layout.  Keypoint pixels
    are unprojected to normalized coords with `camera` here — BA itself
    stays camera-model-agnostic.  Returns (problem, obs_found_mask).
    """
    C = cam_ids.shape[0]
    P = point_ids.shape[0]
    E = arena.obs_frame.shape[0]
    O = max_obs_per_point

    cam_ok = cam_ids >= 0
    pt_ok = point_ids >= 0

    # map arena frame slot -> window cam index (or -1)
    frame2win = jnp.full((arena.cap_frames + 1,), -1, jnp.int32)
    frame2win = frame2win.at[jnp.where(cam_ok, cam_ids, arena.cap_frames)
                             ].set(jnp.arange(C, dtype=jnp.int32))
    point2win = jnp.full((arena.cap_points + 1,), -1, jnp.int32)
    point2win = point2win.at[jnp.where(pt_ok, point_ids, arena.cap_points)
                             ].set(jnp.arange(P, dtype=jnp.int32))

    e_cam = frame2win[arena.obs_frame]
    e_pt = point2win[arena.obs_point]
    e_ok = arena.obs_valid & (e_cam >= 0) & (e_pt >= 0)

    # rank of each edge within its point: position in per-point slots
    # (segment cumulative count via sort by point)
    order = jnp.argsort(jnp.where(e_ok, e_pt, P), stable=True)
    pt_sorted = jnp.where(e_ok, e_pt, P)[order]
    ones = jnp.ones_like(pt_sorted)
    # index within group = position - first position of this group
    pos = jnp.arange(E)
    first_of_group = jnp.full((P + 1,), E, jnp.int32).at[pt_sorted].min(
        pos.astype(jnp.int32))
    first = first_of_group[pt_sorted]
    slot = (pos - first).astype(jnp.int32)

    ok_sorted = e_ok[order] & (slot < O)
    tgt_p = jnp.where(ok_sorted, pt_sorted, P)
    tgt_o = jnp.where(ok_sorted, slot, 0)

    # gather measurements for each edge
    uv_pix = arena.frame_kp_uv[arena.obs_frame, arena.obs_kp]  # (E, 2)
    rays = camera.unproject(uv_pix)[..., :2]
    rays_sorted = rays[order]
    cam_sorted = jnp.where(ok_sorted, e_cam[order], 0)

    obs_cam = jnp.zeros((P + 1, O), jnp.int32).at[tgt_p, tgt_o].set(
        cam_sorted)[:P]
    obs_uv = jnp.zeros((P + 1, O, 2)).at[tgt_p, tgt_o].set(
        rays_sorted)[:P]
    obs_valid = jnp.zeros((P + 1, O), bool).at[tgt_p, tgt_o].set(
        ok_sorted)[:P]

    cam_pose = arena.frame_pose[cam_ids.clip(0)][:, :7]
    point_xyz = arena.point_xyz[point_ids.clip(0)]

    # points with < 2 in-window observations are depth-unconstrained
    # (bearing-only): keep them fixed so BA can't slide them along rays
    n_obs_per_pt = obs_valid.sum(-1)
    under_constrained = n_obs_per_pt < 2

    problem = BundleProblem(
        cam_pose=cam_pose,
        cam_fixed=fixed_cam_mask | ~cam_ok,
        point_xyz=point_xyz,
        point_fixed=~pt_ok | under_constrained,
        obs_cam=obs_cam,
        obs_uv=obs_uv,
        obs_valid=obs_valid,
        obs_weight=jnp.ones((P, O)),
    )
    return problem, obs_valid.any(-1)


def global_bundle_adjust(arena, camera, iters: int = 10,
                         max_cams: int = 64, max_points: int = 4096,
                         max_obs_per_point: int = 16, mesh=None):
    """Global BA over the whole arena (reference: full-BundleGraph
    optimize after loop closure, SURVEY 3.4).

    Extracts every valid keyframe + landmark (up to the given caps,
    newest first), optimizes with the dense-Schur LM — distributed over
    `mesh` when given (gslam_tpu.parallel.dist_ba) — and writes back.
    Keyframe 0 is the gauge.
    """
    F = arena.cap_frames
    cam_ids = jnp.where(jnp.arange(max_cams) < arena.n_frames,
                        jnp.arange(max_cams), -1).astype(jnp.int32)
    pt_order = jnp.argsort(~arena.point_valid, stable=True)
    point_ids = jnp.where(
        jnp.arange(max_points) < arena.point_valid.sum(),
        pt_order[:max_points], -1).astype(jnp.int32)
    fixed = jnp.zeros((max_cams,), bool).at[0].set(True)
    problem, _ = build_problem_from_arena(
        arena, cam_ids, point_ids, fixed, camera,
        max_obs_per_point=max_obs_per_point)
    if mesh is not None:
        from gslam_tpu.parallel.dist_ba import distributed_bundle_adjust

        problem, costs = distributed_bundle_adjust(problem, mesh,
                                                   iters=iters)
    else:
        problem, stats = bundle_adjust(problem, iters=iters)
        costs = stats.cost
    arena = write_back_to_arena(arena, problem, cam_ids, point_ids)
    return arena, costs


def write_back_to_arena(arena, problem: BundleProblem,
                        cam_ids: jnp.ndarray, point_ids: jnp.ndarray):
    """Write optimized poses/points back into the arena (masked)."""
    from gslam_tpu.core.sim3 import sim3_from_se3

    cam_ok = cam_ids >= 0
    pose8 = sim3_from_se3(problem.cam_pose)
    fp = arena.frame_pose.at[cam_ids.clip(0)].set(
        jnp.where(cam_ok[:, None], pose8, arena.frame_pose[cam_ids.clip(0)]))
    pt_ok = (point_ids >= 0) & ~problem.point_fixed
    px = arena.point_xyz.at[point_ids.clip(0)].set(
        jnp.where(pt_ok[:, None], problem.point_xyz,
                  arena.point_xyz[point_ids.clip(0)]))
    return arena.replace(frame_pose=fp, point_xyz=px)
