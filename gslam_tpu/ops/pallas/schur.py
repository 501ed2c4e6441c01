"""Fused residual->Schur bundle-adjustment kernel (the HOTTEST LOOP).

The reference solves BA in a CPU LM plugin (``GSLAM/core/Optimizer.h``,
SURVEY 3.3); our jnp formulation (:func:`gslam_tpu.opt.ba.schur_reduce`)
is already scatter-free, but XLA materializes dozens of small
(P, O, 2|3|6)-shaped intermediates between fused groups and pads their
minor dims to 128 lanes in HBM — BASELINE.md's roofline puts the jnp
path at ~48 MB of HBM traffic per LM iteration against a ~60 us
bandwidth floor (measured 420 us/iter: ~7x off).

This kernel performs the ENTIRE residual -> robust weight -> Jacobian ->
Hpp/bp -> Hpp^-1 -> Hcc/bc -> W -> S = Hcc - W Hpp^-1 W^T pipeline in
one pass with every intermediate resident in VMEM:

* observations arrive OBSERVATION-PLANE layout: each scalar component
  (u, v, weight, camera id) is an (O, P) array so a grid tile is a
  clean (O, TP) sublane x lane block — no minor-dim padding anywhere;
* camera poses enter as 12 R|t scalar components in SMEM; the per-
  observation "gather" is C fused multiply-adds against a one-hot
  (C, O, TP) camera mask (C is small: a local-BA window);
* per-point 3x3 Hpp blocks, their closed-form Cholesky inverses
  (mirroring :func:`gslam_tpu.opt.ba._inv3x3`) and bp are (1, TP)
  component planes reduced over the O sublanes;
* the Schur correction uses the identity
      S_corr[(c1,a),(c2,b)] = sum_k  U_k @ V_k^T,
      U_k[(a,c),p] = sum_o 1[cam=c] (W Hpp^-1)[p,o,a,k],
      V_k[(b,c),p] = sum_o 1[cam=c] W[p,o,b,k]
  -> three (6C, TP) x (TP, 6C) MXU GEMMs per tile, accumulated into a
  (6C, 6C) output block that stays put across the whole grid;
* only the solver-facing results ever reach HBM: S, b, Hcc, Hpp^-1, bp
  and the W_e blocks needed for landmark back-substitution (~0.7 MB vs
  the jnp path's ~48 MB).

The (6C, 6C) outputs use (a*C + c) row ordering inside the kernel (so
per-(a,k) camera reductions write contiguous row blocks); the wrapper
permutes once to the solver's (c*6 + a) ordering.

Kernel-path constraints (wrapper falls back to the jnp ``schur_reduce``
outside them): C <= MAX_CAMS (the one-hot camera loop is unrolled), P
padded to the lane tile.  Gold contract: allclose to ``schur_reduce``
(same damping, pinning, robust weights); verified in interpret mode on
CPU and on-chip in the tpu test tier.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gslam_tpu.core.so3 import quat_to_matrix
from gslam_tpu.opt.ba import BundleProblem, SchurW

_EPS = 1e-12
TILE_P = 128          # points per grid step (lane dimension)
MAX_CAMS = 32         # unrolled camera loop bound for the kernel path

# unique components of a symmetric 3x3, in (row >= col) order
_TRI3 = ((0, 0), (1, 0), (2, 0), (1, 1), (2, 1), (2, 2))


def _sym(d, a, b):
    return d[(max(a, b), min(a, b))]


def _residual_stage(pose_ref, camfree_ref, pts_ref, ptfree_ref,
                    cam_ref, u_ref, v_ref, w_ref, *, C: int,
                    huber_delta: float):
    """Shared front half: project, robust-weight, Jacobian components.

    Returns a dict of (O, TP)/(1, TP) component planes."""
    px, py, pz = pts_ref[0:1, :], pts_ref[1:2, :], pts_ref[2:3, :]
    ptfree = ptfree_ref[0:1, :]                      # (1, TP) f32
    cam = cam_ref[:]                                 # (O, TP) int32
    O, TP = cam.shape

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (C, O, TP), 0)
    M3 = (iota_c == cam[None]).astype(jnp.float32)   # (C, O, TP)

    def gather(ref, j):
        acc = None
        for c in range(C):
            t = ref[j, c] * M3[c]
            acc = t if acc is None else acc + t
        return acc                                    # (O, TP)

    r11, r12, r13, r21, r22, r23, r31, r32, r33, tx, ty, tz = (
        gather(pose_ref, j) for j in range(12))
    cf = gather(camfree_ref, 0)                       # (O, TP)

    x = r11 * px + r12 * py + r13 * pz + tx
    y = r21 * px + r22 * py + r23 * pz + ty
    z = r31 * px + r32 * py + r33 * pz + tz
    front = z > 1e-6
    zs = jnp.where(front, z, 1.0)
    iz = 1.0 / zs
    iz2 = iz * iz
    rx = x * iz - u_ref[:]
    ry = y * iz - v_ref[:]
    e = jnp.sqrt(rx * rx + ry * ry)
    hub = jnp.where(e <= huber_delta, 1.0,
                    huber_delta / jnp.maximum(e, _EPS))
    w = w_ref[:] * hub * front.astype(jnp.float32)    # (O, TP)

    return dict(M3=M3, cf=cf, ptfree=ptfree, w=w, e=e, rx=rx, ry=ry,
                x=x, y=y, iz=iz, iz2=iz2,
                r=(r11, r12, r13, r21, r22, r23, r31, r32, r33))


def _cost_kernel(pose_ref, camfree_ref, lam_ref, pts_ref, ptfree_ref,
                 cam_ref, u_ref, v_ref, w_ref, cost_ref, *, C: int,
                 huber_delta: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cost_ref[0, 0] = 0.0

    st = _residual_stage(pose_ref, camfree_ref, pts_ref, ptfree_ref,
                         cam_ref, u_ref, v_ref, w_ref, C=C,
                         huber_delta=huber_delta)
    cost_ref[0, 0] += jnp.sum(st["w"] * st["e"] * st["e"])


def _schur_kernel(pose_ref, camfree_ref, lam_ref, pts_ref, ptfree_ref,
                  cam_ref, u_ref, v_ref, w_ref,
                  scorr_ref, hcc_ref, bvec_ref, cost_ref,
                  hppinv_ref, bp_ref, we_ref,
                  u3_ref, v3_ref, *, C: int, O: int,
                  huber_delta: float):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        scorr_ref[:] = jnp.zeros_like(scorr_ref)
        hcc_ref[:] = jnp.zeros_like(hcc_ref)
        bvec_ref[:] = jnp.zeros_like(bvec_ref)
        cost_ref[0, 0] = 0.0

    st = _residual_stage(pose_ref, camfree_ref, pts_ref, ptfree_ref,
                         cam_ref, u_ref, v_ref, w_ref, C=C,
                         huber_delta=huber_delta)
    M3, cf, ptfree, w = st["M3"], st["cf"], st["ptfree"], st["w"]
    rx, ry, x, y = st["rx"], st["ry"], st["x"], st["y"]
    iz, iz2 = st["iz"], st["iz2"]
    r11, r12, r13, r21, r22, r23, r31, r32, r33 = st["r"]

    cost_ref[0, 0] += jnp.sum(w * st["e"] * st["e"])

    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # camera Jacobian rows (left-mult twist [rho, phi]), fixed-cam masked
    Jx = [iz * cf, zero, -x * iz2 * cf,
          -x * y * iz2 * cf, (one + x * x * iz2) * cf, -y * iz * cf]
    Jy = [zero, iz * cf, -y * iz2 * cf,
          -(one + y * y * iz2) * cf, x * y * iz2 * cf, x * iz * cf]
    # point Jacobian = dproj @ R, fixed-point masked
    Jpx = [(iz * r11 - x * iz2 * r31) * ptfree,
           (iz * r12 - x * iz2 * r32) * ptfree,
           (iz * r13 - x * iz2 * r33) * ptfree]
    Jpy = [(iz * r21 - y * iz2 * r31) * ptfree,
           (iz * r22 - y * iz2 * r32) * ptfree,
           (iz * r23 - y * iz2 * r33) * ptfree]

    # --- per-point landmark system (reduce over the O sublanes) -------
    H = {}
    for (a, b) in _TRI3:
        H[(a, b)] = jnp.sum(w * (Jpx[a] * Jpx[b] + Jpy[a] * Jpy[b]),
                            axis=0, keepdims=True)          # (1, TP)
    bp = [jnp.sum(w * (Jpx[a] * rx + Jpy[a] * ry),
                  axis=0, keepdims=True) for a in range(3)]

    lamv = lam_ref[0, 0]
    damp = lamv + 1e-5 * (H[(0, 0)] + H[(1, 1)] + H[(2, 2)]) / 3.0
    H[(0, 0)] = H[(0, 0)] + damp
    H[(1, 1)] = H[(1, 1)] + damp
    H[(2, 2)] = H[(2, 2)] + damp
    free = ptfree > 0
    for (a, b) in _TRI3:
        H[(a, b)] = jnp.where(free, H[(a, b)], 1.0 if a == b else 0.0)

    # closed-form SPD Cholesky inverse (mirror of opt.ba._inv3x3)
    eps = 1e-20
    l11 = jnp.sqrt(jnp.maximum(H[(0, 0)], eps))
    l21 = H[(1, 0)] / l11
    l31 = H[(2, 0)] / l11
    l22 = jnp.sqrt(jnp.maximum(H[(1, 1)] - l21 * l21, eps))
    l32 = (H[(2, 1)] - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(H[(2, 2)] - l31 * l31 - l32 * l32, eps))
    m11, m22, m33 = 1.0 / l11, 1.0 / l22, 1.0 / l33
    m21 = -l21 * m11 * m22
    m32 = -l32 * m22 * m33
    m31 = (l21 * l32 - l31 * l22) * m11 * m22 * m33
    Hi = {(0, 0): m11 * m11 + m21 * m21 + m31 * m31,
          (1, 0): m21 * m22 + m31 * m32,
          (2, 0): m31 * m33,
          (1, 1): m22 * m22 + m32 * m32,
          (2, 1): m32 * m33,
          (2, 2): m33 * m33}

    for k, (a, b) in enumerate(_TRI3):
        hppinv_ref[k:k + 1, :] = Hi[(a, b)]
    for k in range(3):
        bp_ref[k:k + 1, :] = bp[k]

    # --- camera blocks + rhs (masked reductions over all obs) ---------
    for a in range(6):
        for b in range(a + 1):
            q = w * (Jx[a] * Jx[b] + Jy[a] * Jy[b])          # (O, TP)
            val = jnp.sum(jnp.sum(M3 * q[None], axis=1), axis=1,
                          keepdims=True)                     # (C, 1)
            hcc_ref[a * C:(a + 1) * C, b:b + 1] += val
            if a != b:
                hcc_ref[b * C:(b + 1) * C, a:a + 1] += val
    for a in range(6):
        q = w * (Jx[a] * rx + Jy[a] * ry)
        bca = jnp.sum(jnp.sum(M3 * q[None], axis=1), axis=1,
                      keepdims=True)                         # (C, 1)
        bvec_ref[a * C:(a + 1) * C, :] += bca

    # --- W blocks, Y = W Hpp^-1, camera-reduced U/V, S correction -----
    Wc = {}
    for a in range(6):
        for m in range(3):
            Wc[(a, m)] = w * (Jx[a] * Jpx[m] + Jy[a] * Jpy[m])
            we_ref[(a * 3 + m) * O:(a * 3 + m + 1) * O, :] = Wc[(a, m)]
    for a in range(6):
        for k in range(3):
            Yak = (Wc[(a, 0)] * _sym(Hi, 0, k)
                   + Wc[(a, 1)] * _sym(Hi, 1, k)
                   + Wc[(a, 2)] * _sym(Hi, 2, k))            # (O, TP)
            u3_ref[k, a * C:(a + 1) * C, :] = jnp.sum(
                M3 * Yak[None], axis=1)                      # (C, TP)
            v3_ref[k, a * C:(a + 1) * C, :] = jnp.sum(
                M3 * Wc[(a, k)][None], axis=1)

    for k in range(3):
        u = u3_ref[k]                                        # (6C, TP)
        scorr_ref[:] += jax.lax.dot_general(
            u, v3_ref[k], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        bvec_ref[:] += -jnp.sum(u * bp[k], axis=1, keepdims=True)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _prep_invariant(problem: BundleProblem, tile_p: int):
    """Loop-invariant observation planes, padded to the lane tile.

    Padded points are marked fixed with zero-weight observations: they
    produce identity Hpp blocks and contribute nothing to S/b."""
    P, O = problem.obs_cam.shape
    if problem.obs_uv.shape != (P, O, 2):
        # the jnp path broadcasts a malformed (P, 1, 2) obs_uv
        # silently; the plane layout cannot — fail loudly instead of
        # reading out of bounds through the BlockSpec
        raise ValueError(
            f"obs_uv shape {problem.obs_uv.shape} != {(P, O, 2)}")
    Pp = _round_up(P, tile_p)
    pad = ((0, 0), (0, Pp - P))

    cam_t = jnp.pad(problem.obs_cam.T.astype(jnp.int32), pad)
    u_t = jnp.pad(problem.obs_uv[..., 0].T, pad)
    v_t = jnp.pad(problem.obs_uv[..., 1].T, pad)
    w_t = jnp.pad(jnp.where(problem.obs_valid, problem.obs_weight,
                            0.0).T.astype(jnp.float32), pad)
    ptfree = jnp.pad((~problem.point_fixed).astype(jnp.float32)[None],
                     pad)
    camfree = (~problem.cam_fixed).astype(jnp.float32)[None]   # (1, C)
    return dict(cam=cam_t, u=u_t, v=v_t, w=w_t, ptfree=ptfree,
                camfree=camfree, P=P, Pp=Pp, O=O)


def _pose_rt(cam_pose: jnp.ndarray) -> jnp.ndarray:
    """(C, 7) -> (12, C) SMEM layout: 9 row-major R entries then t."""
    R = quat_to_matrix(cam_pose[:, 3:7])                      # (C, 3, 3)
    return jnp.concatenate([R.reshape(-1, 9), cam_pose[:, :3]],
                           axis=1).T


def _points_t(point_xyz: jnp.ndarray, Pp: int) -> jnp.ndarray:
    P = point_xyz.shape[0]
    return jnp.pad(point_xyz.T, ((0, 0), (0, Pp - P)))


def _schur_call(inv, pose_rt, pts_t, lam, *, C: int, huber_delta: float,
                tile_p: int, interpret: bool):
    O, Pp = inv["cam"].shape
    n = Pp // tile_p
    C6 = 6 * C
    kern = partial(_schur_kernel, C=C, O=O, huber_delta=huber_delta)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    col = lambda bs: pl.BlockSpec(bs, lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    fixed = lambda bs: pl.BlockSpec(bs, lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[smem, smem, smem,
                  col((3, tile_p)), col((1, tile_p)), col((O, tile_p)),
                  col((O, tile_p)), col((O, tile_p)), col((O, tile_p))],
        out_specs=(fixed((C6, C6)), fixed((C6, 6)), fixed((C6, 1)),
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   col((6, tile_p)), col((3, tile_p)),
                   col((18 * O, tile_p))),
        out_shape=(jax.ShapeDtypeStruct((C6, C6), jnp.float32),
                   jax.ShapeDtypeStruct((C6, 6), jnp.float32),
                   jax.ShapeDtypeStruct((C6, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((6, Pp), jnp.float32),
                   jax.ShapeDtypeStruct((3, Pp), jnp.float32),
                   jax.ShapeDtypeStruct((18 * O, Pp), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((3, C6, tile_p), jnp.float32),
                        pltpu.VMEM((3, C6, tile_p), jnp.float32)],
        interpret=interpret,
    )(pose_rt, inv["camfree"], lam.reshape(1, 1).astype(jnp.float32),
      pts_t, inv["ptfree"], inv["cam"], inv["u"], inv["v"], inv["w"])
    return outs


def _assemble(outs, problem: BundleProblem, lam):
    """Permute kernel-ordered blocks to the solver's (c*6+a) layout and
    apply the Hcc damping/pinning (mirrors opt.ba.schur_reduce)."""
    scorr, hcc, bvec, cost, hppinv, bp3, wout = outs
    C = problem.cam_pose.shape[0]
    P, O = problem.obs_cam.shape
    cam_free = ~problem.cam_fixed

    Hcc = hcc.reshape(6, C, 6).transpose(1, 0, 2)             # (C, 6, 6)
    Hcc = Hcc + (lam * jnp.eye(6))[None]
    Hcc = jnp.where(cam_free[:, None, None], Hcc, jnp.eye(6)[None])
    ii = jnp.arange(C)
    Hcc_d = jnp.zeros((C, 6, C, 6)).at[ii, :, ii, :].set(Hcc) \
        .reshape(C * 6, C * 6)
    S_corr = scorr.reshape(6, C, 6, C).transpose(1, 0, 3, 2) \
        .reshape(C * 6, C * 6)
    S = Hcc_d - S_corr
    b_s = bvec.reshape(6, C).T.reshape(-1)

    i11, i21, i31, i22, i32, i33 = (hppinv[k, :P] for k in range(6))
    Hpp_inv = jnp.stack([
        jnp.stack([i11, i21, i31], -1),
        jnp.stack([i21, i22, i32], -1),
        jnp.stack([i31, i32, i33], -1)], -2)                  # (P, 3, 3)
    bp = bp3[:, :P].T                                         # (P, 3)
    W_e = wout[:, :P].reshape(6, 3, O, P).transpose(3, 2, 0, 1)
    return S, b_s, SchurW(W_e, problem.obs_cam), Hpp_inv, bp, cost[0, 0]


def schur_pallas_ok(problem: BundleProblem,
                    tile_p: int = TILE_P) -> bool:
    """Static predicate: can the kernel path handle this problem?"""
    C = problem.cam_pose.shape[0]
    return C <= MAX_CAMS


@partial(jax.jit, static_argnames=("huber_delta", "tile_p", "interpret"))
def schur_reduce_pallas(problem: BundleProblem, lam,
                        huber_delta: float = 0.01,
                        tile_p: int = TILE_P, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, SchurW,
                                   jnp.ndarray, jnp.ndarray]:
    """Drop-in fused replacement for :func:`gslam_tpu.opt.ba.schur_reduce`."""
    C = problem.cam_pose.shape[0]
    inv = _prep_invariant(problem, tile_p)
    outs = _schur_call(inv, _pose_rt(problem.cam_pose),
                       _points_t(problem.point_xyz, inv["Pp"]),
                       jnp.asarray(lam), C=C, huber_delta=huber_delta,
                       tile_p=tile_p, interpret=interpret)
    S, b_s, W, Hpp_inv, bp, _ = _assemble(outs, problem,
                                          jnp.asarray(lam))
    return S, b_s, W, Hpp_inv, bp


@partial(jax.jit, static_argnames=("huber_delta", "tile_p", "interpret"))
def ba_cost_pallas(problem: BundleProblem, huber_delta: float = 0.01,
                   tile_p: int = TILE_P,
                   interpret: bool = False) -> jnp.ndarray:
    """Fused robust chi2: gold-equal to :func:`gslam_tpu.opt.ba.ba_cost`."""
    C = problem.cam_pose.shape[0]
    inv = _prep_invariant(problem, tile_p)
    cost = _cost_call(inv, _pose_rt(problem.cam_pose),
                      _points_t(problem.point_xyz, inv["Pp"]),
                      C=C, huber_delta=huber_delta, tile_p=tile_p,
                      interpret=interpret)
    return cost


def _cost_call(inv, pose_rt, pts_t, *, C: int, huber_delta: float,
               tile_p: int, interpret: bool):
    O, Pp = inv["cam"].shape
    n = Pp // tile_p
    kern = partial(_cost_kernel, C=C, huber_delta=huber_delta)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    col = lambda bs: pl.BlockSpec(bs, lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    cost = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[smem, smem, smem,
                  col((3, tile_p)), col((1, tile_p)), col((O, tile_p)),
                  col((O, tile_p)), col((O, tile_p)), col((O, tile_p))],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(pose_rt, inv["camfree"], jnp.zeros((1, 1), jnp.float32),
      pts_t, inv["ptfree"], inv["cam"], inv["u"], inv["v"], inv["w"])
    return cost[0, 0]


def partials_from_outs(outs, P: int, O: int, C: int, obs_cam):
    """Kernel outputs -> camera-major PARTIAL pieces (no Hcc damping):
    (Hcc (C,6,6), bvec = bc - b_corr (C,6), S_corr (6C,6C), SchurW,
    Hpp_inv (P,3,3), bp (P,3)).

    The distributed ring BA consumes these directly: the kernel's
    per-shard partials ARE the reduce-scatter payload, so each shard's
    whole Schur reduction runs in VMEM just like the single-device
    path (damping/pinning happen after the cross-shard sum)."""
    scorr, hcc, bvec, cost, hppinv, bp3, wout = outs
    Hcc = hcc.reshape(6, C, 6).transpose(1, 0, 2)
    S_corr = scorr.reshape(6, C, 6, C).transpose(1, 0, 3, 2) \
        .reshape(6 * C, 6 * C)
    bvec_c = bvec.reshape(6, C).T
    i11, i21, i31, i22, i32, i33 = (hppinv[k, :P] for k in range(6))
    Hpp_inv = jnp.stack([
        jnp.stack([i11, i21, i31], -1),
        jnp.stack([i21, i22, i32], -1),
        jnp.stack([i31, i32, i33], -1)], -2)
    bp = bp3[:, :P].T
    W_e = wout[:, :P].reshape(6, 3, O, P).transpose(3, 2, 0, 1)
    return Hcc, bvec_c, S_corr, SchurW(W_e, obs_cam), Hpp_inv, bp
