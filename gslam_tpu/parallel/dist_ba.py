"""Distributed Schur-complement bundle adjustment.

Global BA sharded over the device mesh (SURVEY 5.7 / BASELINE config #5):

* landmarks (and their padded observation slots) are sharded over the
  'pt' mesh axis — each landmark's 3x3 Hpp block is built and inverted
  on the shard that owns it;
* observation slots are additionally sharded over the 'obs' axis
  (per-point partial Hpp/bp summed with psum over 'obs');
* each shard forms its partial reduced camera system
  S_shard = Hcc_shard - W_shard Hpp^-1 W_shard^T  as one dense GEMM,
  combined with ``psum`` over the whole mesh (rides ICI);
* the (6C, 6C) reduced system is solved identically on every device
  (replicated data => no communication), and landmark updates
  back-substitute shard-locally.

The camera state is replicated; only O(C^2) floats cross the
interconnect per iteration, independent of the number of landmarks —
the same structure that makes Schur BA scale on CPU clusters, mapped to
SPMD collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gslam_tpu.core.se3 import se3_exp, se3_mul
from gslam_tpu.opt.ba import BundleProblem, _project_residual_jac
from gslam_tpu.opt.robust import huber_weight


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@partial(jax.jit, static_argnames=("mesh", "iters", "huber_delta"))
def distributed_bundle_adjust(problem: BundleProblem, mesh: Mesh,
                              iters: int = 10, lm_lambda0: float = 1e-4,
                              huber_delta: float = 0.01
                              ) -> Tuple[BundleProblem, jnp.ndarray]:
    """LM BA with the Schur reduction distributed over `mesh`.

    Returns (updated problem, per-iteration costs).  P is padded to a
    multiple of the 'pt' axis size, O to a multiple of the 'obs' size.
    """
    n_pt = mesh.shape["pt"]
    n_obs = mesh.shape["obs"]
    C = problem.cam_pose.shape[0]

    # pad landmark axis and observation axis to mesh multiples
    pad_pt = lambda x: _pad_to(x, 0, n_pt)
    prob = BundleProblem(
        cam_pose=problem.cam_pose,
        cam_fixed=problem.cam_fixed,
        point_xyz=pad_pt(problem.point_xyz),
        point_fixed=pad_pt(problem.point_fixed | jnp.zeros(
            problem.point_fixed.shape, bool)),
        obs_cam=_pad_to(pad_pt(problem.obs_cam), 1, n_obs),
        obs_uv=_pad_to(pad_pt(problem.obs_uv), 1, n_obs),
        obs_valid=_pad_to(pad_pt(problem.obs_valid), 1, n_obs),
        obs_weight=_pad_to(pad_pt(problem.obs_weight), 1, n_obs),
    )
    P_pad = prob.point_xyz.shape[0]
    O_pad = prob.obs_cam.shape[1]
    # padded landmarks are fixed & observation-less
    pad_mask = jnp.arange(P_pad) >= problem.point_xyz.shape[0]
    prob = prob._replace(
        point_fixed=prob.point_fixed | pad_mask,
        obs_valid=prob.obs_valid & ~pad_mask[:, None])

    cam_free = ~prob.cam_fixed
    in_specs = (
        P(),                 # cam_pose (replicated)
        P("pt"),             # point_xyz shard
        P("pt"),             # point_fixed shard
        P("pt", "obs"),      # obs_cam
        P("pt", "obs"),      # obs_uv
        P("pt", "obs"),      # obs_valid
        P("pt", "obs"),      # obs_weight
    )
    out_specs = (P(), P("pt"), P())

    def shard_fn(cam_pose, point_xyz, point_fixed, obs_cam, obs_uv,
                 obs_valid, obs_weight):
        pt_free = ~point_fixed

        def residual_jac(cam_pose, point_xyz):
            p = BundleProblem(cam_pose, prob.cam_fixed, point_xyz,
                              point_fixed, obs_cam, obs_uv, obs_valid,
                              obs_weight)
            return _project_residual_jac(p)

        def cost_of(cam_pose, point_xyz):
            r, _, _, valid = residual_jac(cam_pose, point_xyz)
            e = jnp.linalg.norm(r, axis=-1)
            w = obs_weight * huber_weight(e, huber_delta)
            local = jnp.sum(jnp.where(valid, w * e * e, 0.0))
            return jax.lax.psum(local, ("pt", "obs"))

        def lm_step(state, _):
            cam_pose, point_xyz, lam, cost = state
            r, Jc, Jp, valid = residual_jac(cam_pose, point_xyz)
            e = jnp.linalg.norm(r, axis=-1)
            w = obs_weight * huber_weight(e, huber_delta)
            w = jnp.where(valid, w, 0.0)
            Jc = Jc * cam_free[obs_cam][..., None, None]
            Jp = Jp * pt_free[:, None, None, None]
            sw = w[..., None, None]

            # landmark blocks: partial over 'obs' shard -> psum('obs')
            Hpp = jax.lax.psum(
                jnp.einsum("poia,poib->pab", Jp * sw, Jp), "obs")
            bp = jax.lax.psum(
                jnp.einsum("poia,poi->pa", Jp * sw, r), "obs")
            Hpp = Hpp + (lam * jnp.eye(3))[None]
            Hpp = jnp.where(pt_free[:, None, None], Hpp,
                            jnp.eye(3)[None])
            Hpp_inv = jnp.linalg.inv(Hpp)
            bp = bp * pt_free[:, None]

            # camera blocks: local scatter -> psum(all)
            Pl = point_xyz.shape[0]
            Ol = obs_cam.shape[1]
            cam_flat = obs_cam.reshape(-1)
            Hcc = jnp.zeros((C, 6, 6)).at[cam_flat].add(
                jnp.einsum("poia,poib->poab", Jc * sw,
                           Jc).reshape(-1, 6, 6))
            bc = jnp.zeros((C, 6)).at[cam_flat].add(
                jnp.einsum("poia,poi->poa", Jc * sw, r).reshape(-1, 6))
            Hcc = jax.lax.psum(Hcc, ("pt", "obs"))
            bc = jax.lax.psum(bc, ("pt", "obs"))
            Hcc = Hcc + (lam * jnp.eye(6))[None]
            Hcc = jnp.where(cam_free[:, None, None], Hcc,
                            jnp.eye(6)[None])
            bc = bc * cam_free[:, None]

            # dense local W (6C, 3P_local): per-point W blocks are sums
            # over ALL of the point's observations, so the 'obs'-shard
            # partials must be psum'd BEFORE the Schur product (the
            # product has cross-pairs between obs on different shards)
            W_e = jnp.einsum("poia,poib->poab", Jc * sw, Jp)
            Wd = jnp.zeros((C, 6, Pl, 3)).at[
                obs_cam.reshape(-1), :,
                jnp.repeat(jnp.arange(Pl), Ol), :].add(
                W_e.reshape(-1, 6, 3))
            Wd = jax.lax.psum(Wd, "obs")
            Wf = Wd.reshape(C * 6, Pl * 3)
            Y = jnp.einsum("cpq,pqr->cpr", Wd.reshape(C * 6, Pl, 3),
                           Hpp_inv)
            Yf = Y.reshape(C * 6, Pl * 3)
            S_part = jnp.dot(Yf, Wf.T,
                             preferred_element_type=jnp.float32)
            b_part = Yf @ bp.reshape(-1)
            # Wd is now replicated over 'obs': reduce over 'pt' only
            S_red = jax.lax.psum(S_part, "pt")
            b_red = jax.lax.psum(b_part, "pt")

            ii = jnp.arange(C)
            rows = jnp.broadcast_to(
                ii[:, None, None] * 6 + jnp.arange(6)[None, :, None],
                (C, 6, 6)).reshape(-1)
            cols = jnp.broadcast_to(
                ii[:, None, None] * 6 + jnp.arange(6)[None, None, :],
                (C, 6, 6)).reshape(-1)
            Hcc_d = jnp.zeros((C * 6, C * 6)).at[rows, cols].set(
                Hcc.reshape(-1))
            S = Hcc_d - S_red
            b_s = bc.reshape(-1) - b_red

            # replicated solve (identical on every device)
            dxc = -jnp.linalg.solve(S + 1e-8 * jnp.eye(C * 6), b_s)
            dxc = dxc.reshape(C, 6) * cam_free[:, None]

            # shard-local landmark back-substitution: the per-point sum
            # W^T dxc = sum_o W_e[p,o]^T dxc[cam_po] spans ALL obs
            # slots of the point -> psum over the 'obs' axis
            Wt_dxc = jax.lax.psum(
                jnp.einsum("poab,poa->pb", W_e, dxc[obs_cam]), "obs")
            dxp = -jnp.einsum("pab,pb->pa", Hpp_inv, bp + Wt_dxc)
            dxp = dxp * pt_free[:, None]

            new_pose = se3_mul(se3_exp(dxc), cam_pose)
            new_xyz = point_xyz + dxp
            new_cost = cost_of(new_pose, new_xyz)
            accept = (new_cost < cost) & jnp.isfinite(new_cost)
            cam_pose = jnp.where(accept, new_pose, cam_pose)
            point_xyz = jnp.where(accept, new_xyz, point_xyz)
            cost_out = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0).clip(1e-9, 1e3)
            return (cam_pose, point_xyz, lam, cost_out), cost_out

        cost0 = cost_of(cam_pose, point_xyz)
        init = (cam_pose, point_xyz,
                jnp.asarray(lm_lambda0, jnp.float32), cost0)
        (cam_pose, point_xyz, lam, _), costs = jax.lax.scan(
            lm_step, init, None, length=iters)
        return cam_pose, point_xyz, jnp.concatenate([cost0[None], costs])

    fn = shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    cam_pose, point_xyz, costs = fn(
        prob.cam_pose, prob.point_xyz, prob.point_fixed, prob.obs_cam,
        prob.obs_uv, prob.obs_valid, prob.obs_weight)

    P_orig = problem.point_xyz.shape[0]
    out = problem._replace(cam_pose=cam_pose,
                           point_xyz=point_xyz[:P_orig])
    return out, costs
