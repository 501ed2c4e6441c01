"""Pose-graph optimization over SE3 or SIM3 (loop-closure backend).

Reference surface: the Optimizer's pose-graph path
(``GSLAM/core/Optimizer.h`` SE3/SIM3 relative-pose edges; used by loop
closing over the essential graph, SURVEY 3.4).  Sim3 mode implements
scale-drift-aware loop closure for monocular SLAM (Strasdat-style).

Residual per edge (i, j): r = log(Z_ij^-1 * T_i * T_j^-1) in the tangent
(6 for SE3, 7 for SIM3).  Jacobians wrt the left-multiplicative tangents
of T_i and T_j come from one ``jax.jacfwd`` at zero, vmapped over all
edges — exact, batched, and robust to the group choice.  Gauss-Newton
with multiplicative damping; the (dN, dN) normal matrix is dense
(keyframe graphs are O(10^2-10^3) nodes; bigger graphs go through the
matrix-free CG path in gslam_tpu.parallel).  Gauge freedom is removed by
the `fixed` mask (typically node 0).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gslam_tpu.core import se3, sim3


class PoseGraph(NamedTuple):
    poses: jnp.ndarray       # (N, 7) SE3 or (N, 8) SIM3
    fixed: jnp.ndarray       # (N,) bool
    edge_i: jnp.ndarray      # (E,) int32
    edge_j: jnp.ndarray      # (E,) int32
    edge_rel: jnp.ndarray    # (E, 7|8) measured Z_ij ~= T_i * T_j^-1
    edge_valid: jnp.ndarray  # (E,) bool
    edge_weight: jnp.ndarray  # (E,) scalar information, or (E, d)
    #   per-residual-dim diagonal information (reference edges carry
    #   full information matrices; the diagonal covers the practical
    #   cases: anisotropic odometry, rotation-only IMU edges)
    # optional unary position priors (GPS edges — reference GPS prior
    # edges in Optimizer.h; ENU meters on the camera *center*)
    prior_pos: jnp.ndarray | None = None     # (N, 3)
    prior_weight: jnp.ndarray | None = None  # (N,) 0 = no prior


def _group_ops(mode: str):
    if mode == "se3":
        return dict(mul=se3.se3_mul, inv=se3.se3_inverse, exp=se3.se3_exp,
                    log=se3.se3_log, dim=6)
    if mode == "sim3":
        return dict(mul=sim3.sim3_mul, inv=sim3.sim3_inverse,
                    exp=sim3.sim3_exp, log=sim3.sim3_log, dim=7)
    raise ValueError(f"mode must be se3|sim3, got {mode}")


def _edge_info(weight: jnp.ndarray, d: int) -> jnp.ndarray:
    """(E,) scalar or (E, d) diagonal information -> (E, d)."""
    if weight.ndim == 1:
        return jnp.broadcast_to(weight[:, None], (weight.shape[0], d))
    return weight


def _cam_center(poses: jnp.ndarray) -> jnp.ndarray:
    """Camera centers (N, 3) of world->cam poses: c = -R^T t."""
    from gslam_tpu.core.so3 import quat_conj, quat_rotate

    return -quat_rotate(quat_conj(poses[..., 3:7]), poses[..., :3])


def pose_graph_cost(g: PoseGraph, mode: str = "se3") -> jnp.ndarray:
    ops = _group_ops(mode)
    Ti = g.poses[g.edge_i]
    Tj = g.poses[g.edge_j]
    r = ops["log"](ops["mul"](ops["inv"](g.edge_rel),
                              ops["mul"](Ti, ops["inv"](Tj))))
    r2 = jnp.sum(r * r * _edge_info(g.edge_weight, ops["dim"]), -1)
    cost = jnp.sum(jnp.where(g.edge_valid, r2, 0.0))
    if g.prior_pos is not None:
        pr = _cam_center(g.poses) - g.prior_pos
        cost = cost + jnp.sum(g.prior_weight
                              * jnp.sum(pr * pr, -1))
    return cost


@partial(jax.jit, static_argnames=("mode", "iters", "solver",
                                   "cg_iters"))
def optimize_pose_graph(g: PoseGraph, mode: str = "se3", iters: int = 20,
                        lm_lambda0: float = 1e-6,
                        solver: str = "auto", cg_iters: int = 0
                        ) -> Tuple[PoseGraph, jnp.ndarray]:
    """Damped Gauss-Newton; returns (graph, per-iter costs (iters+1,)).

    solver:
      "dense" — assemble the (N*d, N*d) normal matrix, LU solve
        (see solve_dense for why not Cholesky).
        O(N^2 d^2) memory / O(N^3 d^3) flops: right up to a few
        hundred nodes, impossible at reference benchmark scale (KITTI
        00 tracks ~1.3k keyframes: 243 GB of H blocks).
      "pcg"  — matrix-free preconditioned CG: Hx products are two
        gathers + batched (d, d) einsums + two segment scatter-adds
        over the EDGE list, block-Jacobi (per-node d x d Cholesky)
        preconditioner.  O(E d^2) memory; pose graphs are chain +
        bounded covisibility + loop edges, so E = O(N) and the whole
        solve is linear in trajectory length.
      "auto" — dense below ~256 nodes (N*d <= 1536), else pcg.
    cg_iters: CG budget per GN step (0 = min(N*d, 128)); CG runs with
      convergence masking, so a generous budget only costs masked
      no-op lanes.
    """
    ops = _group_ops(mode)
    d = ops["dim"]
    N = g.poses.shape[0]
    E = g.edge_i.shape[0]
    free = ~g.fixed

    def edge_residual(xi, xj, Ti, Tj, Z):
        Ti_p = ops["mul"](ops["exp"](xi), Ti)
        Tj_p = ops["mul"](ops["exp"](xj), Tj)
        return ops["log"](ops["mul"](ops["inv"](Z),
                                     ops["mul"](Ti_p, ops["inv"](Tj_p))))

    zero = jnp.zeros((d,))
    jac_i = jax.vmap(
        lambda Ti, Tj, Z: jax.jacfwd(edge_residual, argnums=0)(
            zero, zero, Ti, Tj, Z))
    jac_j = jax.vmap(
        lambda Ti, Tj, Z: jax.jacfwd(edge_residual, argnums=1)(
            zero, zero, Ti, Tj, Z))

    use_pcg = solver == "pcg" or (solver == "auto" and N * d > 1536)
    K_cg = cg_iters if cg_iters > 0 else min(N * d, 128)

    def linearize(poses):
        """Shared edge/prior linearization.

        Returns r (E, d), weighted/free-masked Jacobians Jiw/Jjw and
        raw Ji/Jj (E, d, d), the block-diagonal prior Hessian Hp
        (N, d, d), and the gradient b (N, d) with fixed rows zeroed."""
        Ti = poses[g.edge_i]
        Tj = poses[g.edge_j]
        r = jax.vmap(edge_residual)(
            jnp.zeros((E, d)), jnp.zeros((E, d)), Ti, Tj, g.edge_rel)
        Ji = jac_i(Ti, Tj, g.edge_rel)  # (E, d, d)
        Jj = jac_j(Ti, Tj, g.edge_rel)
        # diagonal information applies on the residual axis 'a'
        w = (g.edge_valid[:, None]
             * _edge_info(g.edge_weight, d))[:, :, None]
        Ji = Ji * free[g.edge_i][:, None, None]
        Jj = Jj * free[g.edge_j][:, None, None]
        Jiw = Ji * w
        Jjw = Jj * w
        b = jnp.zeros((N, d))
        b = b.at[g.edge_i].add(jnp.einsum("eab,ea->eb", Jiw, r))
        b = b.at[g.edge_j].add(jnp.einsum("eab,ea->eb", Jjw, r))
        Hp = jnp.zeros((N, d, d))
        if g.prior_pos is not None:
            # unary GPS prior on camera centers: residual c(T) - pos,
            # Jacobian wrt the node tangent by jacfwd (batched)
            def prior_res(xi, T, pos):
                Tp = ops["mul"](ops["exp"](xi), T)
                return _cam_center(Tp[None])[0] - pos

            Jp = jax.vmap(lambda T, pos: jax.jacfwd(prior_res, 0)(
                zero, T, pos))(poses, g.prior_pos)       # (N, 3, d)
            rp = _cam_center(poses) - g.prior_pos        # (N, 3)
            wp = (g.prior_weight * free)[:, None, None]
            Hp = jnp.einsum("nab,nac->nbc", Jp * wp, Jp)
            b = b + jnp.einsum("nab,na->nb", Jp * wp, rp)
        b = b * free[:, None]
        return r, Jiw, Jjw, Ji, Jj, Hp, b

    def solve_dense(lin, lam):
        r, Jiw, Jjw, Ji, Jj, Hp, b = lin
        H = jnp.zeros((N, N, d, d))
        H = H.at[g.edge_i, g.edge_i].add(
            jnp.einsum("eab,eac->ebc", Jiw, Ji))
        H = H.at[g.edge_j, g.edge_j].add(
            jnp.einsum("eab,eac->ebc", Jjw, Jj))
        H = H.at[g.edge_i, g.edge_j].add(
            jnp.einsum("eab,eac->ebc", Jiw, Jj))
        H = H.at[g.edge_j, g.edge_i].add(
            jnp.einsum("eab,eac->ebc", Jjw, Ji))
        H = H.at[jnp.arange(N), jnp.arange(N)].add(Hp)
        Hd = H.transpose(0, 2, 1, 3).reshape(N * d, N * d)
        # damping + pin fixed nodes.  NOTE: LU, not Cholesky — the
        # damped H is SPD in exact arithmetic but spans ~12 decades in
        # f32 (edge informations O(1), LM floor 1e-6); f32 Cholesky
        # breaks down exactly on the loop-closure correction graphs
        # (measured: the kidnapped-recovery instrument fails with
        # cho_solve here and passes with LU), so the factorization
        # robustness is worth the 2x flops.
        diag_boost = jnp.where(jnp.repeat(free, d), lam, 1.0)
        Hd = Hd + jnp.diag(diag_boost + 1e-10)
        bf = b.reshape(-1)
        return -jnp.linalg.solve(Hd, bf).reshape(N, d)

    def solve_pcg(lin, lam):
        """Matrix-free block-Jacobi PCG on (H + damping) dx = -b."""
        r0, Jiw, Jjw, Ji, Jj, Hp, b = lin
        diagvec = jnp.where(free, lam, 1.0)[:, None] + 1e-10  # (N, 1)

        def hvp(x):
            xi = x[g.edge_i]
            xj = x[g.edge_j]
            y = (jnp.einsum("eab,eb->ea", Ji, xi)
                 + jnp.einsum("eab,eb->ea", Jj, xj))     # residual space
            z = jnp.zeros((N, d))
            z = z.at[g.edge_i].add(jnp.einsum("eab,ea->eb", Jiw, y))
            z = z.at[g.edge_j].add(jnp.einsum("eab,ea->eb", Jjw, y))
            z = z + jnp.einsum("nbc,nc->nb", Hp, x)
            return z + x * diagvec

        # block-Jacobi preconditioner: per-node (d, d) diagonal blocks
        Hd_blk = jnp.zeros((N, d, d))
        Hd_blk = Hd_blk.at[g.edge_i].add(
            jnp.einsum("eab,eac->ebc", Jiw, Ji))
        Hd_blk = Hd_blk.at[g.edge_j].add(
            jnp.einsum("eab,eac->ebc", Jjw, Jj))
        # scale-aware jitter: the blocks are SPD but can span ~7
        # decades in f32 (cond near 1/eps_f32); any SPD M is a valid
        # preconditioner, so buying factorization margin costs nothing
        tr = jnp.trace(Hd_blk, axis1=1, axis2=2)[:, None, None]
        Hd_blk = Hd_blk + Hp \
            + (diagvec[:, :, None] + 1e-5 * tr / d) * jnp.eye(d)[None]
        L_blk = jnp.linalg.cholesky(Hd_blk)       # batched (N, d, d)

        def minv(x):
            y = jax.vmap(lambda L, v: jax.scipy.linalg.solve_triangular(
                L, v, lower=True))(L_blk, x)
            return jax.vmap(
                lambda L, v: jax.scipy.linalg.solve_triangular(
                    L.T, v, lower=False))(L_blk, y)

        rhs = -b
        x = jnp.zeros((N, d))
        res = rhs                       # r = rhs - H @ 0
        z = minv(res)
        p = z
        rz = jnp.vdot(res, z)
        tol2 = 1e-12 * jnp.maximum(jnp.vdot(rhs, rhs), 1e-30)

        def cg_step(state, _):
            x, res, p, rz, done = state
            Ap = hvp(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-30)
            x1 = x + alpha * p
            res1 = res - alpha * Ap
            z1 = minv(res1)
            rz1 = jnp.vdot(res1, z1)
            beta = rz1 / jnp.maximum(rz, 1e-30)
            p1 = z1 + beta * p
            conv = jnp.vdot(res1, res1) < tol2
            keep = ~done
            return (jnp.where(keep, x1, x), jnp.where(keep, res1, res),
                    jnp.where(keep, p1, p), jnp.where(keep, rz1, rz),
                    done | conv), None

        (x, *_), _ = jax.lax.scan(
            cg_step, (x, res, p, rz, jnp.bool_(False)), None,
            length=K_cg)
        return x

    def cost_of(poses):
        return pose_graph_cost(g._replace(poses=poses), mode)

    def gn_step(state, _):
        poses, lam, cost = state
        lin = linearize(poses)
        dx = solve_pcg(lin, lam) if use_pcg else solve_dense(lin, lam)
        dx = dx * free[:, None]
        new_poses = ops["mul"](ops["exp"](dx), poses)
        new_cost = cost_of(new_poses)
        accept = (new_cost < cost) & jnp.isfinite(new_cost)
        poses = jnp.where(accept, new_poses, poses)
        cost_out = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 8.0).clip(1e-9, 1e6)
        return (poses, lam, cost_out), cost_out

    cost0 = cost_of(g.poses)
    (poses, _, _), costs = jax.lax.scan(
        gn_step, (g.poses, jnp.asarray(lm_lambda0, jnp.float32), cost0),
        None, length=iters)
    return (g._replace(poses=poses),
            jnp.concatenate([cost0[None], costs]))
