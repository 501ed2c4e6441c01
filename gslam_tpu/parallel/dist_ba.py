"""Distributed Schur-complement bundle adjustment.

Global BA sharded over the device mesh (SURVEY 5.7 / BASELINE config #5):

* landmarks (and their padded observation slots) are sharded over the
  'pt' mesh axis — each landmark's 3x3 Hpp block is built and inverted
  on the shard that owns it;
* observation slots are additionally sharded over the 'obs' axis
  (per-point partial Hpp/bp/W summed with psum over 'obs');
* each shard forms its partial reduced camera system
  S_shard = Hcc_shard - W_shard Hpp^-1 W_shard^T through the SAME
  scatter-free one-hot-GEMM core as the single-device path
  (:func:`gslam_tpu.opt.ba.schur_partials` — no ``.at[].add`` anywhere:
  scatter-adds serialize on TPU and dominated the round-2 profile),
  combined with ``psum`` over the whole mesh (rides ICI);
* the (6C, 6C) reduced system is solved identically on every device
  (replicated data => no communication), and landmark updates
  back-substitute shard-locally.

The camera state is replicated; only O(C^2) floats cross the
interconnect per iteration, independent of the number of landmarks —
the same structure that makes Schur BA scale on CPU clusters, mapped to
SPMD collectives.

The ring variant (:func:`distributed_bundle_adjust_ring`) additionally
shards the camera state and moves the reduced system with an explicit
reduce-scatter + all-gather ``ppermute`` schedule whose per-hop payload
is one destination shard's camera-block ROWS — 2(n-1)/n x the data of
one full matrix, vs the (n-1) x of a naive ring all-reduce.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.scipy.linalg import cho_factor, cho_solve
from jax.sharding import Mesh, PartitionSpec as P

from gslam_tpu.core.se3 import se3_exp, se3_mul
from gslam_tpu.opt.ba import (BundleProblem, _project_residual_jac,
                              assemble_schur, schur_partials,
                              schur_wt_dxc)
from gslam_tpu.opt.robust import huber_weight


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    n = x.shape[axis]
    pad = (-n) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _solve_spd(S: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """-(S + eps I)^-1 b via Cholesky (S is SPD: damped + pinned)."""
    fac = cho_factor(S + 1e-8 * jnp.eye(S.shape[0]), lower=True)
    return -cho_solve(fac, b)


def _shard_cost(prob: BundleProblem, huber_delta: float) -> jnp.ndarray:
    """Shard-local robust chi2 (caller reduces across the mesh)."""
    r, _, _, valid = _project_residual_jac(prob)
    e = jnp.linalg.norm(r, axis=-1)
    w = prob.obs_weight * huber_weight(e, huber_delta)
    return jnp.sum(jnp.where(valid, w * e * e, 0.0))


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

        def local_prob(cam_pose, point_xyz):
            return BundleProblem(cam_pose, prob.cam_fixed, point_xyz,
                                 point_fixed, obs_cam, obs_uv,
                                 obs_valid, obs_weight)

        def cost_of(cam_pose, point_xyz):
            local = _shard_cost(local_prob(cam_pose, point_xyz),
                                huber_delta)
            return jax.lax.psum(local, ("pt", "obs"))

        def lm_step(state, _):
            cam_pose, point_xyz, lam, cost = state
            # shared scatter-free core; per-point partials complete
            # over the 'obs' shard INSIDE (Hpp inversion and the Schur
            # cross terms need whole points)
            Hcc_l, bc_l, S_l, bcorr_l, W, Hpp_inv, bp = schur_partials(
                local_prob(cam_pose, point_xyz), lam, huber_delta,
                n_cams=C, obs_psum=lambda x: jax.lax.psum(x, "obs"))
            # camera-system partials reduce over the whole mesh (the
            # obs-axis devices each computed the full per-point W, so
            # their S partials are identical: average over 'obs')
            Hcc = jax.lax.psum(Hcc_l, ("pt", "obs"))
            bc = jax.lax.psum(bc_l, ("pt", "obs"))
            S_corr = jax.lax.psum(S_l, "pt")
            b_corr = jax.lax.psum(bcorr_l, "pt")
            S, b_s = assemble_schur(Hcc, bc, S_corr, b_corr, lam,
                                    cam_free)

            # replicated solve (identical on every device)
            dxc = _solve_spd(S, b_s).reshape(C, 6) * cam_free[:, None]

            # shard-local landmark back-substitution: the per-point sum
            # W^T dxc = sum_o W_e[p,o]^T dxc[cam_po] spans ALL obs
            # slots of the point -> psum over the 'obs' axis
            Wt_dxc = jax.lax.psum(schur_wt_dxc(W, dxc.reshape(-1)),
                                  "obs")
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


@partial(jax.jit, static_argnames=("mesh", "iters", "huber_delta",
                                   "backend", "interpret"))
def distributed_bundle_adjust_ring(problem: BundleProblem, mesh: Mesh,
                                   iters: int = 10,
                                   lm_lambda0: float = 1e-4,
                                   huber_delta: float = 0.01,
                                   backend: str = "jnp",
                                   interpret: bool = False
                                   ) -> Tuple[BundleProblem, jnp.ndarray]:
    """Ring-exchange variant of the distributed Schur BA (SURVEY
    5.7/5.8's ring-attention analog).

    Differences from :func:`distributed_bundle_adjust`:

    * the CAMERA state is sharded too — each 'pt' shard owns a
      contiguous block of C/n cameras (the psum variant replicates all
      cameras on every device);
    * every collective is an explicit ``jax.lax.ppermute`` neighbor
      exchange riding ICI ring links: the camera state all-gathers by
      circulating blocks, and the reduced camera system moves with a
      REDUCE-SCATTER schedule — at each of the n-1 hops a shard
      forwards the partially-summed camera-block ROWS destined for a
      single owner and adds its local partial, so the per-hop payload
      is (6C/n, 6C), not the naive ring-all-reduce's full (6C, 6C);
    * the fully-summed row blocks then all-gather (same O(C/n)-rows
      payload) for the replicated tiny solve.  Total bytes moved per
      iteration: 2(n-1)/n x |S|, the classic ring all-reduce optimum.

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
        if backend == "pallas":
            # each shard's whole Schur reduction runs in the fused VMEM
            # kernel — the distributed path is as fast per shard as the
            # single-device one, and the kernel's partial outputs ARE
            # the reduce-scatter payload (partials_from_outs)
            from gslam_tpu.ops.pallas import schur as _ps

            inv_prep = _ps._prep_invariant(
                BundleProblem(jnp.zeros((C_pad, 7)), cam_fixed_p,
                              point_xyz, point_fixed, obs_cam, obs_uv,
                              obs_valid, obs_weight), _ps.TILE_P)

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

        def ring_sum_scalar(local):
            acc = local
            v = local
            for _ in range(n - 1):
                v = jax.lax.ppermute(v, "pt", fwd)
                acc = acc + v
            return acc

        def row_chunk(x, c):
            """Camera-block row slice [c*6Cl, (c+1)*6Cl) of a (6C, ...)
            partial (c is traced: dynamic slice)."""
            return jax.lax.dynamic_slice_in_dim(x, c * 6 * Cl, 6 * Cl,
                                                axis=0)

        def ring_reduce_scatter_rows(x):
            """Reduce-scatter over camera-block rows: shard i ends with
            the FULLY summed rows it owns; each hop carries one
            (6Cl, ...) chunk.  Chunk c starts at shard c+1 and hops
            right, accumulating the local partial of every shard it
            visits; after n-1 hops it is home and complete."""
            acc = row_chunk(x, (i - 1) % n)
            for t in range(1, n):
                acc = jax.lax.ppermute(acc, "pt", fwd)
                acc = acc + row_chunk(x, (i - 1 - t) % n)
            return acc                                 # my rows, summed

        def ring_allgather_rows(rows):
            """Inverse: circulate each shard's (6Cl, ...) summed rows
            so every shard reconstructs the full matrix."""
            full = jnp.zeros((6 * C_pad,) + rows.shape[1:], rows.dtype)
            blk = rows
            owner = i
            for k in range(n):
                full = jax.lax.dynamic_update_slice_in_dim(
                    full, blk, owner * 6 * Cl, axis=0)
                if k < n - 1:
                    blk = jax.lax.ppermute(blk, "pt", fwd)
                    owner = (owner - 1) % n
            return full

        def local_prob(cam_full, point_xyz):
            return BundleProblem(cam_full, cam_fixed_p, point_xyz,
                                 point_fixed, obs_cam, obs_uv,
                                 obs_valid, obs_weight)

        def cost_of(cam_block, point_xyz):
            cam_full = ring_poses(cam_block)
            if backend == "pallas":
                local = _ps._cost_call(
                    inv_prep, _ps._pose_rt(cam_full),
                    _ps._points_t(point_xyz, inv_prep["Pp"]),
                    C=C_pad, huber_delta=huber_delta,
                    tile_p=_ps.TILE_P, interpret=interpret)
            else:
                local = _shard_cost(local_prob(cam_full, point_xyz),
                                    huber_delta)
            return ring_sum_scalar(local)

        cam_free_p = ~cam_fixed_p

        def lm_step(state, _):
            cam_block, point_xyz, lam, cost = state
            cam_full = ring_poses(cam_block)
            # shared scatter-free core (obs unsharded on this mesh)
            if backend == "pallas":
                outs = _ps._schur_call(
                    inv_prep, _ps._pose_rt(cam_full),
                    _ps._points_t(point_xyz, inv_prep["Pp"]), lam,
                    C=C_pad, huber_delta=huber_delta,
                    tile_p=_ps.TILE_P, interpret=interpret)
                Hcc_l, bvec_l, S_l, W, Hpp_inv, bp = \
                    _ps.partials_from_outs(outs, point_xyz.shape[0],
                                           obs_cam.shape[1], C_pad,
                                           obs_cam)
            else:
                Hcc_l, bc_l, S_l, bcorr_l, W, Hpp_inv, bp = \
                    schur_partials(local_prob(cam_full, point_xyz),
                                   lam, huber_delta, n_cams=C_pad)
                bvec_l = bc_l - bcorr_l
            # bundle the small (C, 6, 6+6+1) camera-block partials into
            # the same reduce-scatter payload as the S rows: rows of
            # [S_corr | Hcc | bc - b_corr] laid out as extra columns
            extra = jnp.concatenate(
                [Hcc_l.reshape(C_pad * 6, 6),
                 bvec_l.reshape(C_pad * 6, 1)], axis=1)
            payload = jnp.concatenate([S_l, extra], axis=1)
            mine = ring_reduce_scatter_rows(payload)   # (6Cl, 6C+7)
            full = ring_allgather_rows(mine)           # (6C, 6C+7)
            S_corr = full[:, :6 * C_pad]
            Hcc = full[:, 6 * C_pad:6 * C_pad + 6].reshape(C_pad, 6, 6)
            bvec = full[:, 6 * C_pad + 6].reshape(C_pad, 6)

            # assemble: damp/pin Hcc, S = Hcc_d - S_corr (b_corr is
            # already folded into bvec)
            Hcc = Hcc + (lam * jnp.eye(6))[None]
            Hcc = jnp.where(cam_free_p[:, None, None], Hcc,
                            jnp.eye(6)[None])
            ii = jnp.arange(C_pad)
            Hcc_d = jnp.zeros((C_pad, 6, C_pad, 6)).at[ii, :, ii, :] \
                .set(Hcc).reshape(C_pad * 6, C_pad * 6)
            S = Hcc_d - S_corr
            b_s = (bvec * cam_free_p[:, None]).reshape(-1)
            dxc = _solve_spd(S, b_s).reshape(C_pad, 6) \
                * cam_free_p[:, None]

            Wt_dxc = schur_wt_dxc(W, dxc.reshape(-1))
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
