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


@partial(jax.jit, static_argnames=("mode", "iters"))
def optimize_pose_graph(g: PoseGraph, mode: str = "se3", iters: int = 20,
                        lm_lambda0: float = 1e-6
                        ) -> Tuple[PoseGraph, jnp.ndarray]:
    """Damped Gauss-Newton; returns (graph, per-iter costs (iters+1,))."""
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

    def normal_equations(poses, lam):
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

        H = jnp.zeros((N, N, d, d))
        H = H.at[g.edge_i, g.edge_i].add(
            jnp.einsum("eab,eac->ebc", Ji * w, Ji))
        H = H.at[g.edge_j, g.edge_j].add(
            jnp.einsum("eab,eac->ebc", Jj * w, Jj))
        H = H.at[g.edge_i, g.edge_j].add(
            jnp.einsum("eab,eac->ebc", Ji * w, Jj))
        H = H.at[g.edge_j, g.edge_i].add(
            jnp.einsum("eab,eac->ebc", Jj * w, Ji))
        b = jnp.zeros((N, d))
        b = b.at[g.edge_i].add(jnp.einsum("eab,ea->eb", Ji * w, r))
        b = b.at[g.edge_j].add(jnp.einsum("eab,ea->eb", Jj * w, r))

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
            H = H.at[jnp.arange(N), jnp.arange(N)].add(
                jnp.einsum("nab,nac->nbc", Jp * wp, Jp))
            b = b + jnp.einsum("nab,na->nb", Jp * wp, rp)

        Hd = H.transpose(0, 2, 1, 3).reshape(N * d, N * d)
        # damping + pin fixed nodes
        diag_boost = jnp.where(jnp.repeat(free, d), lam, 1.0)
        Hd = Hd + jnp.diag(diag_boost + 1e-10)
        b = b.reshape(-1) * jnp.repeat(free, d)
        return Hd, b

    def cost_of(poses):
        return pose_graph_cost(g._replace(poses=poses), mode)

    def gn_step(state, _):
        poses, lam, cost = state
        Hd, b = normal_equations(poses, lam)
        dx = -jnp.linalg.solve(Hd, b).reshape(N, d)
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
