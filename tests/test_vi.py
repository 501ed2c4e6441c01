"""Visual-inertial estimation tests: preintegration (full factor),
factor composition, bias-Jacobian correction, gravity/velocity
initialization, and joint VI bundle adjustment on an analytic
trajectory with simulated IMU."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # e2e/mesh tier: excluded from tests-fast

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gslam_tpu.core.imu import (GRAVITY, ImuFactor, compose_factors,
                                preintegrate, preintegrate_full)
from gslam_tpu.core.se3 import se3_apply, se3_inverse, se3_make
from gslam_tpu.core.so3 import (matrix_to_quat, quat_conj, quat_mul,
                                quat_rotate, quat_to_matrix, so3_exp,
                                so3_log)

G_W = np.array([0.0, 0.0, -GRAVITY])


def _traj_state(t):
    """Analytic trajectory: circle + slow climb, yawing with motion.

    Returns (p_w, v_w, a_w, q_wb) at time t (scalars or arrays OK).
    """
    w = 0.8          # rad/s around the circle
    r = 2.0
    p = np.stack([r * np.cos(w * t), r * np.sin(w * t), 0.3 * t], -1)
    v = np.stack([-r * w * np.sin(w * t), r * w * np.cos(w * t),
                  0.3 * np.ones_like(t)], -1)
    a = np.stack([-r * w * w * np.cos(w * t), -r * w * w * np.sin(w * t),
                  np.zeros_like(t)], -1)
    return p, v, a


def _traj_quat(t):
    """Body orientation: yaw = w t (z-axis rotation)."""
    w = 0.8
    half = 0.5 * w * t
    return np.stack([np.cos(half), np.zeros_like(t), np.zeros_like(t),
                     np.sin(half)], -1)


def make_imu_window(t0, t1, hz=200.0, rng=None, gyro_sigma=0.0,
                    accel_sigma=0.0):
    """Simulated IMU samples (M, 7) on [t0, t1] for the analytic traj."""
    ts = np.arange(t0, t1 + 0.5 / hz, 1.0 / hz)
    M = len(ts)
    _, _, a_w = _traj_state(ts)
    qs = _traj_quat(ts)
    w_body = np.zeros((M, 3))
    w_body[:, 2] = 0.8  # constant yaw rate in body frame
    samples = np.zeros((M, 7), np.float32)
    samples[:, 0] = ts
    for m in range(M):
        R_wb = np.asarray(quat_to_matrix(jnp.asarray(qs[m], jnp.float32)))
        samples[m, 1:4] = R_wb.T @ (a_w[m] - G_W)
        samples[m, 4:7] = w_body[m]
    if rng is not None:
        samples[:, 1:4] += rng.normal(0, accel_sigma, (M, 3))
        samples[:, 4:7] += rng.normal(0, gyro_sigma, (M, 3))
    return samples


def gt_factor(t0, t1):
    """Ground-truth (dq, dv, dp) between t0 and t1 from the analytic
    trajectory (gravity-free, expressed in body frame at t0)."""
    p0, v0, _ = _traj_state(np.asarray(t0))
    p1, v1, _ = _traj_state(np.asarray(t1))
    q0 = _traj_quat(np.asarray(t0))
    q1 = _traj_quat(np.asarray(t1))
    dt = t1 - t0
    R0 = np.asarray(quat_to_matrix(jnp.asarray(q0, jnp.float32)))
    dq = np.asarray(quat_mul(quat_conj(jnp.asarray(q0, jnp.float32)),
                             jnp.asarray(q1, jnp.float32)))
    dv = R0.T @ (v1 - v0 - G_W * dt)
    dp = R0.T @ (p1 - p0 - v0 * dt - 0.5 * G_W * dt * dt)
    return dq, dv, dp


class TestPreintegrateFull:
    def test_matches_ground_truth(self):
        s = make_imu_window(0.0, 0.5)
        f = preintegrate_full(jnp.asarray(s), jnp.ones(len(s), bool))
        dq_gt, dv_gt, dp_gt = gt_factor(0.0, 0.5)
        dq = np.asarray(f.dq)
        assert abs(abs(float(np.dot(dq, dq_gt))) - 1.0) < 1e-4
        np.testing.assert_allclose(np.asarray(f.dv), dv_gt, atol=2e-2)
        np.testing.assert_allclose(np.asarray(f.dp), dp_gt, atol=1e-2)
        assert abs(float(f.dt) - 0.5) < 1e-3

    def test_matches_light_preintegrate(self):
        s = make_imu_window(0.0, 0.3)
        v = jnp.ones(len(s), bool)
        f = preintegrate_full(jnp.asarray(s), v)
        d = preintegrate(jnp.asarray(s), v)
        np.testing.assert_allclose(np.asarray(f.dq), np.asarray(d.dq),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(f.dv), np.asarray(d.dv),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(f.dp), np.asarray(d.dp),
                                   atol=1e-5)

    def test_covariance_grows_and_spd(self):
        s = make_imu_window(0.0, 1.0)
        f = preintegrate_full(jnp.asarray(s), jnp.ones(len(s), bool),
                              gyro_noise=1e-3, accel_noise=1e-2)
        cov = np.asarray(f.cov)
        assert np.allclose(cov, cov.T, atol=1e-12)
        eig = np.linalg.eigvalsh(cov)
        assert (eig > -1e-12).all()
        assert cov[0, 0] > 0 and cov[4, 4] > 0 and cov[8, 8] > 0
        # longer window -> strictly more position uncertainty
        s2 = make_imu_window(0.0, 2.0)
        f2 = preintegrate_full(jnp.asarray(s2), jnp.ones(len(s2), bool),
                               gyro_noise=1e-3, accel_noise=1e-2)
        assert float(f2.cov[8, 8]) > float(f.cov[8, 8])

    def test_invalid_samples_ignored(self):
        s = make_imu_window(0.0, 0.5)
        v = np.ones(len(s), bool)
        v[len(s) // 2:] = False
        f = preintegrate_full(jnp.asarray(s), jnp.asarray(v))
        t_half = s[len(s) // 2 - 1, 0]
        assert abs(float(f.dt) - t_half) < 1e-2


class TestCompose:
    def test_compose_equals_full_window(self):
        sa = make_imu_window(0.0, 0.4)
        sb = make_imu_window(0.4, 0.9)
        fa = preintegrate_full(jnp.asarray(sa), jnp.ones(len(sa), bool))
        fb = preintegrate_full(jnp.asarray(sb), jnp.ones(len(sb), bool))
        fc = compose_factors(fa, fb)
        s = make_imu_window(0.0, 0.9)
        f = preintegrate_full(jnp.asarray(s), jnp.ones(len(s), bool))
        np.testing.assert_allclose(np.asarray(fc.dv), np.asarray(f.dv),
                                   atol=3e-2)
        np.testing.assert_allclose(np.asarray(fc.dp), np.asarray(f.dp),
                                   atol=3e-2)
        dq_dot = float(np.dot(np.asarray(fc.dq), np.asarray(f.dq)))
        assert abs(abs(dq_dot) - 1.0) < 1e-4
        # bias Jacobians compose to first order
        np.testing.assert_allclose(np.asarray(fc.J_v_ba),
                                   np.asarray(f.J_v_ba), atol=1e-2)
        np.testing.assert_allclose(np.asarray(fc.J_R_bg),
                                   np.asarray(f.J_R_bg), atol=1e-2)

    def test_bias_jacobian_first_order(self):
        """Correcting with J_*_b* approximates re-integration with bias."""
        s = make_imu_window(0.0, 0.5)
        v = jnp.ones(len(s), bool)
        f0 = preintegrate_full(jnp.asarray(s), v)
        ba = np.array([0.05, -0.03, 0.02], np.float32)
        bg = np.array([0.01, 0.005, -0.008], np.float32)
        # integrate with biased measurements removed
        s_b = s.copy()
        s_b[:, 1:4] -= ba
        s_b[:, 4:7] -= bg
        f_b = preintegrate_full(jnp.asarray(s_b), v)
        dv_corr = np.asarray(f0.dv) + np.asarray(f0.J_v_bg) @ bg \
            + np.asarray(f0.J_v_ba) @ ba
        dp_corr = np.asarray(f0.dp) + np.asarray(f0.J_p_bg) @ bg \
            + np.asarray(f0.J_p_ba) @ ba
        np.testing.assert_allclose(dv_corr, np.asarray(f_b.dv), atol=5e-3)
        np.testing.assert_allclose(dp_corr, np.asarray(f_b.dp), atol=5e-3)
        # rotation: dq_corr = dq * Exp(J_R_bg bg)
        dq_corr = np.asarray(quat_mul(
            f0.dq, so3_exp(jnp.asarray(np.asarray(f0.J_R_bg) @ bg))))
        dot = float(np.dot(dq_corr, np.asarray(f_b.dq)))
        assert abs(abs(dot) - 1.0) < 1e-5


def make_keyframes(n_kf=6, dt_kf=0.4):
    """Keyframe GT poses (T_cw), velocities, times + IMU factors."""
    times = np.arange(n_kf) * dt_kf
    poses_cw = np.zeros((n_kf, 7), np.float32)
    vels = np.zeros((n_kf, 3), np.float32)
    for i, t in enumerate(times):
        p, v, _ = _traj_state(np.asarray(t))
        q_wb = _traj_quat(np.asarray(t))
        T_wb = se3_make(jnp.asarray(p, jnp.float32),
                        jnp.asarray(q_wb, jnp.float32))
        poses_cw[i] = np.asarray(se3_inverse(T_wb))
        vels[i] = v
    factors = []
    for i in range(n_kf - 1):
        s = make_imu_window(times[i], times[i + 1])
        # noise densities sized to also cover discretization error of
        # the 200 Hz simulation (standard practice on real IMUs too)
        factors.append(preintegrate_full(jnp.asarray(s),
                                         jnp.ones(len(s), bool),
                                         gyro_noise=1e-3,
                                         accel_noise=1e-2))
    from gslam_tpu.opt.vi import stack_factors

    return poses_cw, vels, stack_factors(factors)


class TestGravityVelocityInit:
    def test_recovers_gravity_and_velocity(self):
        from gslam_tpu.opt.vi import estimate_gravity_velocity

        poses, vels_gt, imu = make_keyframes()
        n = poses.shape[0]
        g, vel, s = estimate_gravity_velocity(
            jnp.asarray(poses), jnp.arange(n - 1), jnp.arange(1, n), imu)
        np.testing.assert_allclose(g, G_W, atol=0.15)
        np.testing.assert_allclose(vel, vels_gt, atol=0.1)

    def test_recovers_scale(self):
        from gslam_tpu.opt.vi import estimate_gravity_velocity

        poses, vels_gt, imu = make_keyframes()
        n = poses.shape[0]
        scaled = poses.copy()
        scaled[:, :3] *= 0.5   # vision map at half metric scale
        g, vel, s = estimate_gravity_velocity(
            jnp.asarray(scaled), jnp.arange(n - 1), jnp.arange(1, n), imu,
            with_scale=True)
        assert abs(s - 2.0) < 0.2    # scale maps vision -> metric
        np.testing.assert_allclose(g, G_W, atol=0.2)

    def test_gravity_align_rotation(self):
        from gslam_tpu.opt.vi import gravity_align_rotation

        g_est = np.array([1.0, 0.5, -9.6])
        q = gravity_align_rotation(g_est)
        g_rot = np.asarray(quat_rotate(jnp.asarray(q),
                                       jnp.asarray(g_est, jnp.float32)))
        np.testing.assert_allclose(
            g_rot / np.linalg.norm(g_rot), [0, 0, -1], atol=1e-5)


class TestViBundleAdjust:
    def _make_problem(self, pose_noise=0.05, vel_noise=0.2, seed=0):
        from gslam_tpu.opt.ba import BundleProblem
        from gslam_tpu.opt.vi import ViProblem

        rng = np.random.default_rng(seed)
        poses, vels_gt, imu = make_keyframes()
        C = poses.shape[0]
        # landmarks: a box of points in front of the circle
        P, O = 64, C
        X = np.stack([rng.uniform(-4, 4, P), rng.uniform(-4, 4, P),
                      rng.uniform(2, 6, P)], -1).astype(np.float32)
        obs_cam = np.tile(np.arange(C, dtype=np.int32), (P, 1))
        uv = np.zeros((P, O, 2), np.float32)
        ok = np.zeros((P, O), bool)
        for c in range(C):
            pc = np.asarray(se3_apply(jnp.asarray(poses[c]),
                                      jnp.asarray(X)))
            z = pc[:, 2]
            ok[:, c] = z > 0.3
            uv[:, c] = pc[:, :2] / np.maximum(z, 0.3)[:, None]
        # perturb everything except the gauge (kf 0)
        noisy = poses.copy()
        noisy[1:, :3] += rng.normal(0, pose_noise, (C - 1, 3))
        vel0 = vels_gt + rng.normal(0, vel_noise, (C, 3))
        vision = BundleProblem(
            cam_pose=jnp.asarray(noisy),
            cam_fixed=jnp.zeros(C, bool).at[0].set(True),
            point_xyz=jnp.asarray(
                X + rng.normal(0, 0.02, X.shape).astype(np.float32)),
            point_fixed=jnp.zeros(P, bool),
            obs_cam=jnp.asarray(obs_cam),
            obs_uv=jnp.asarray(uv),
            obs_valid=jnp.asarray(ok),
            obs_weight=jnp.ones((P, O)) * 1e4)
        prob = ViProblem(
            vision=vision, vel=jnp.asarray(vel0, jnp.float32),
            pair_i=jnp.arange(C - 1), pair_j=jnp.arange(1, C),
            pair_valid=jnp.ones(C - 1, bool), imu=imu,
            gravity_w=jnp.asarray(G_W, jnp.float32),
            bias_g=jnp.zeros(3), bias_a=jnp.zeros(3))
        return prob, poses, vels_gt

    def test_reduces_cost_and_recovers_poses(self):
        from gslam_tpu.opt.vi import vi_bundle_adjust

        prob, poses_gt, vels_gt = self._make_problem()
        out, costs = vi_bundle_adjust(prob, iters=10)
        costs = np.asarray(costs)
        assert costs[-1] < 0.1 * costs[0]
        err0 = np.linalg.norm(
            np.asarray(prob.vision.cam_pose)[:, :3] - poses_gt[:, :3],
            axis=-1).mean()
        err1 = np.linalg.norm(
            np.asarray(out.vision.cam_pose)[:, :3] - poses_gt[:, :3],
            axis=-1).mean()
        assert err1 < 0.3 * err0
        verr = np.linalg.norm(np.asarray(out.vel) - vels_gt,
                              axis=-1).mean()
        assert verr < 0.15

    def test_velocity_estimated_from_imu(self):
        """Even with exact poses, VI-BA should pull velocities to GT."""
        from gslam_tpu.opt.vi import vi_bundle_adjust

        prob, poses_gt, vels_gt = self._make_problem(pose_noise=0.0,
                                                     vel_noise=0.5)
        out, costs = vi_bundle_adjust(prob, iters=10)
        verr0 = np.linalg.norm(np.asarray(prob.vel) - vels_gt,
                               axis=-1).mean()
        verr1 = np.linalg.norm(np.asarray(out.vel) - vels_gt,
                               axis=-1).mean()
        assert verr1 < 0.3 * verr0

    def test_gravity_direction_refinement(self):
        """A ~5 deg gravity-direction error in the problem must be
        recovered by refine_gravity=True (and hurt when off)."""
        from gslam_tpu.opt.vi import vi_bundle_adjust

        prob, poses_gt, vels_gt = self._make_problem(pose_noise=0.01,
                                                     vel_noise=0.1)
        ang = np.deg2rad(5.0)
        g_bad = np.array([np.sin(ang), 0.0, -np.cos(ang)]) * 9.81
        prob = prob._replace(gravity_w=jnp.asarray(g_bad, jnp.float32))
        out, costs = vi_bundle_adjust(prob, iters=12, refine_gravity=True)
        g_ref = np.asarray(out.gravity_w)
        assert abs(np.linalg.norm(g_ref) - 9.81) < 1e-3
        cos_after = float(g_ref @ G_W) / (9.81 * 9.81)
        cos_before = float(g_bad @ G_W) / (9.81 * 9.81)
        assert cos_after > cos_before  # direction improved
        assert np.degrees(np.arccos(min(cos_after, 1.0))) < 2.0

    def test_invalid_pairs_are_inert(self):
        """Padding factors with pair_valid=False must not change the
        solution (vs a problem without them)."""
        from gslam_tpu.core.imu import identity_factor
        from gslam_tpu.opt.vi import stack_factors, vi_bundle_adjust

        prob, _, _ = self._make_problem()
        K = int(prob.pair_i.shape[0])
        pad = stack_factors([identity_factor()])
        imu_pad = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b]), prob.imu, pad)
        prob_pad = prob._replace(
            pair_i=jnp.concatenate([prob.pair_i, jnp.asarray([-1])]),
            pair_j=jnp.concatenate([prob.pair_j, jnp.asarray([-1])]),
            pair_valid=jnp.concatenate([prob.pair_valid,
                                        jnp.asarray([False])]),
            imu=imu_pad)
        out0, c0 = vi_bundle_adjust(prob, iters=4)
        out1, c1 = vi_bundle_adjust(prob_pad, iters=4)
        np.testing.assert_allclose(np.asarray(out0.vision.cam_pose),
                                   np.asarray(out1.vision.cam_pose),
                                   atol=1e-4)
