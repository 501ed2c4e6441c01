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


@partial(jax.jit, static_argnames=("mesh", "iters", "huber_delta"))
def distributed_bundle_adjust_ring(problem: BundleProblem, mesh: Mesh,
                                   iters: int = 10,
                                   lm_lambda0: float = 1e-4,
                                   huber_delta: float = 0.01
                                   ) -> Tuple[BundleProblem, jnp.ndarray]:
    """Ring-exchange variant of the distributed Schur BA (SURVEY
    5.7/5.8's ring-attention analog).

    Differences from :func:`distributed_bundle_adjust`:

    * the CAMERA state is sharded too — each 'pt' shard owns a
      contiguous block of C/n cameras (the psum variant replicates all
      cameras on every device);
    * camera blocks travel the ring via ``jax.lax.ppermute``: at ring
      step k, the block owned by shard (i+k) mod n visits shard i,
      which accumulates the residual/Jacobian contributions of its
      LOCAL landmarks' observations into that block's normal-equation
      pieces.  The traveling block carries its partially-summed
      Hcc/bc with it, so after a full revolution every block arrives
      home fully reduced — an all-reduce expressed as neighbor
      exchanges that ride ICI ring links;
    * only the (6C, 6C) reduced camera system is ring-all-reduced and
      solved replicated (it is tiny and independent of landmark count).

    Requires a 1-D mesh with axis 'pt'; C is padded to a multiple of
    the shard count.  Numerically equivalent to the psum variant up to
    f32 summation order (parity-tested in tests/test_parallel.py).
    """
    n = mesh.shape["pt"]
    C = problem.cam_pose.shape[0]
    C_pad = C + ((-C) % n)
    Cl = C_pad // n

    pad_c = lambda x: _pad_to(x, 0, n)
    cam_pose_p = pad_c(problem.cam_pose)
    # padded cameras: identity quaternion, fixed
    if C_pad > C:
        cam_pose_p = cam_pose_p.at[C:, 3].set(1.0)
    cam_fixed_p = pad_c(problem.cam_fixed) | (jnp.arange(C_pad) >= C)

    pad_pt = lambda x: _pad_to(x, 0, n)
    P_orig = problem.point_xyz.shape[0]
    point_xyz = pad_pt(problem.point_xyz)
    point_fixed = pad_pt(problem.point_fixed) \
        | (jnp.arange(point_xyz.shape[0]) >= P_orig)
    obs_cam = pad_pt(problem.obs_cam)
    obs_uv = pad_pt(problem.obs_uv)
    obs_valid = pad_pt(problem.obs_valid) \
        & (jnp.arange(point_xyz.shape[0]) < P_orig)[:, None]
    obs_weight = pad_pt(problem.obs_weight)

    in_specs = (P("pt"), P("pt"), P("pt"), P("pt"), P("pt"), P("pt"),
                P("pt"))
    out_specs = (P("pt"), P("pt"), P())

    def shard_fn(cam_block, point_xyz, point_fixed, obs_cam, obs_uv,
                 obs_valid, obs_weight):
        i = jax.lax.axis_index("pt")
        pt_free = ~point_fixed
        fwd = [(k, (k + 1) % n) for k in range(n)]   # send to the right

        def ring_poses(cam_block):
            """All-gather the camera state via n-1 neighbor exchanges
            (each step moves one block one hop around the ring)."""
            full = jnp.zeros((C_pad, 7)).at[:, 3].set(1.0)
            blk = cam_block
            owner = i
            for k in range(n):
                full = jax.lax.dynamic_update_slice(
                    full, blk, (owner * Cl, 0))
                if k < n - 1:
                    blk = jax.lax.ppermute(blk, "pt", fwd)
                    owner = (owner - 1) % n
            return full

        def residual_jac(cam_full, point_xyz):
            p = BundleProblem(cam_full, cam_fixed_p, point_xyz,
                              point_fixed, obs_cam, obs_uv, obs_valid,
                              obs_weight)
            return _project_residual_jac(p)

        def cost_of(cam_block, point_xyz):
            cam_full = ring_poses(cam_block)
            r, _, _, valid = residual_jac(cam_full, point_xyz)
            e = jnp.linalg.norm(r, axis=-1)
            w = obs_weight * huber_weight(e, huber_delta)
            local = jnp.sum(jnp.where(valid, w * e * e, 0.0))
            # ring all-reduce of the scalar cost (no psum)
            acc = local
            v = local
            for _ in range(n - 1):
                v = jax.lax.ppermute(v, "pt", fwd)
                acc = acc + v
            return acc

        cam_free_p = ~cam_fixed_p

        def lm_step(state, _):
            cam_block, point_xyz, lam, cost = state
            cam_full = ring_poses(cam_block)
            r, Jc, Jp, valid = residual_jac(cam_full, point_xyz)
            e = jnp.linalg.norm(r, axis=-1)
            w = obs_weight * huber_weight(e, huber_delta)
            w = jnp.where(valid, w, 0.0)
            Jc = Jc * cam_free_p[obs_cam][..., None, None]
            Jp = Jp * pt_free[:, None, None, None]
            sw = w[..., None, None]

            Hpp = jnp.einsum("poia,poib->pab", Jp * sw, Jp)
            bp = jnp.einsum("poia,poi->pa", Jp * sw, r)
            tr = (Hpp[..., 0, 0] + Hpp[..., 1, 1] + Hpp[..., 2, 2]) / 3
            Hpp = Hpp + ((lam + 1e-5 * tr)[..., None, None]
                         * jnp.eye(3))
            Hpp = jnp.where(pt_free[:, None, None], Hpp,
                            jnp.eye(3)[None])
            Hpp_inv = jnp.linalg.inv(Hpp)
            bp = bp * pt_free[:, None]

            # per-camera blocks from LOCAL landmarks via one-hot GEMM
            onehot = (obs_cam.reshape(-1)[:, None]
                      == jnp.arange(C_pad)[None, :]).astype(jnp.float32)
            Hcc_l = jnp.dot(
                onehot.T,
                jnp.einsum("poia,poib->poab", Jc * sw,
                           Jc).reshape(-1, 36),
                preferred_element_type=jnp.float32).reshape(C_pad, 6, 6)
            bc_l = jnp.dot(
                onehot.T,
                jnp.einsum("poia,poi->poa", Jc * sw, r).reshape(-1, 6),
                preferred_element_type=jnp.float32)

            # ring reduce: each shard's camera block travels home
            # accumulating every shard's local contribution.  Here the
            # traveling payload is the per-block slice of (Hcc, bc):
            # start with MY contribution to the block owned by my right
            # neighbor's ... simplest equivalent: ring all-reduce the
            # (C_pad, ...) partials by neighbor exchange
            def ring_sum(x):
                acc = x
                v = x
                for _ in range(n - 1):
                    v = jax.lax.ppermute(v, "pt", fwd)
                    acc = acc + v
                return acc

            Hcc = ring_sum(Hcc_l)
            bc = ring_sum(bc_l)
            Hcc = Hcc + (lam * jnp.eye(6))[None]
            Hcc = jnp.where(cam_free_p[:, None, None], Hcc,
                            jnp.eye(6)[None])
            bc = bc * cam_free_p[:, None]

            # local Schur correction, ring-all-reduced
            W_e = jnp.einsum("poia,poib->poab", Jc * sw, Jp)
            G3 = onehot.reshape(point_xyz.shape[0], -1, C_pad)
            Wp = jnp.einsum("poc,poab->pcab", G3, W_e)
            Wf = Wp.transpose(1, 2, 0, 3).reshape(C_pad * 6, -1)
            Y = jnp.einsum("cpab,pbd->cpad",
                           Wp.transpose(1, 0, 2, 3), Hpp_inv)
            Yf = Y.transpose(0, 2, 1, 3).reshape(C_pad * 6, -1)
            S_part = jnp.dot(Yf, Wf.T,
                             preferred_element_type=jnp.float32)
            b_part = Yf @ bp.reshape(-1)
            S_red = ring_sum(S_part)
            b_red = ring_sum(b_part)

            ii = jnp.arange(C_pad)
            Hcc_d = jnp.zeros((C_pad, 6, C_pad, 6)).at[ii, :, ii, :] \
                .set(Hcc).reshape(C_pad * 6, C_pad * 6)
            S = Hcc_d - S_red
            b_s = bc.reshape(-1) - b_red
            dxc = -jnp.linalg.solve(S + 1e-8 * jnp.eye(C_pad * 6), b_s)
            dxc = dxc.reshape(C_pad, 6) * cam_free_p[:, None]

            Wt_dxc = jnp.einsum("poab,poa->pb", W_e, dxc[obs_cam])
            dxp = -jnp.einsum("pab,pb->pa", Hpp_inv, bp + Wt_dxc)
            dxp = dxp * pt_free[:, None]

            new_full = se3_mul(se3_exp(dxc), cam_full)
            new_block = jax.lax.dynamic_slice(new_full, (i * Cl, 0),
                                              (Cl, 7))
            new_xyz = point_xyz + dxp
            new_cost = cost_of(new_block, new_xyz)
            accept = (new_cost < cost) & jnp.isfinite(new_cost)
            cam_block = jnp.where(accept, new_block, cam_block)
            point_xyz = jnp.where(accept, new_xyz, point_xyz)
            cost_out = jnp.where(accept, new_cost, cost)
            lam = jnp.where(accept, lam * 0.5, lam * 4.0).clip(1e-9, 1e3)
            return (cam_block, point_xyz, lam, cost_out), cost_out

        cost0 = cost_of(cam_block, point_xyz)
        init = (cam_block, point_xyz,
                jnp.asarray(lm_lambda0, jnp.float32), cost0)
        (cam_block, point_xyz, lam, _), costs = jax.lax.scan(
            lm_step, init, None, length=iters)
        return cam_block, point_xyz, jnp.concatenate([cost0[None], costs])

    fn = shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_vma=False)
    cam_out, point_out, costs = fn(
        cam_pose_p, point_xyz, point_fixed, obs_cam, obs_uv, obs_valid,
        obs_weight)
    out = problem._replace(cam_pose=cam_out[:C],
                           point_xyz=point_out[:P_orig])
    return out, costs
