"""Geometry core tests: SO3/SE3/SIM3 exp<->log roundtrips, composition vs
matrix form, camera Project<->UnProject roundtrip per model, GPS roundtrip.

Mirrors the reference's geometry unit-test surface (SURVEY.md section 4),
with scipy.spatial.transform.Rotation as the external gold standard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from gslam_tpu.core import (
    so3, se3, sim3,
    quat_mul, quat_rotate, quat_to_matrix, matrix_to_quat,
    so3_exp, so3_log,
    se3_apply, se3_exp, se3_identity, se3_inverse, se3_log, se3_mul,
    se3_to_matrix, matrix_to_se3,
    sim3_apply, sim3_exp, sim3_from_se3, sim3_inverse, sim3_log, sim3_mul,
)
from gslam_tpu.core.camera import Camera
from gslam_tpu.core import gps


def rand_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def to_scipy(q_wxyz):
    # scipy uses (x, y, z, w)
    return R.from_quat(np.roll(np.asarray(q_wxyz), -1, axis=-1))


class TestSO3:
    def test_mul_matches_scipy(self, rng):
        a, b = rand_quats(rng, 50), rand_quats(rng, 50)
        ours = quat_to_matrix(quat_mul(jnp.asarray(a), jnp.asarray(b)))
        gold = (to_scipy(a) * to_scipy(b)).as_matrix()
        np.testing.assert_allclose(ours, gold, atol=1e-5)

    def test_rotate_matches_matrix(self, rng):
        q = jnp.asarray(rand_quats(rng, 20))
        v = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
        ours = quat_rotate(q, v)
        gold = (quat_to_matrix(q) @ v[..., None])[..., 0]
        np.testing.assert_allclose(ours, gold, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        phi = rng.normal(size=(100, 3)).astype(np.float32)
        # keep |phi| < pi for uniqueness
        phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True) \
            * rng.uniform(0, 3.0, size=(100, 1))
        back = so3_log(so3_exp(jnp.asarray(phi)))
        np.testing.assert_allclose(back, phi, atol=1e-4)

    def test_exp_matches_scipy(self, rng):
        phi = rng.normal(size=(50, 3)) * 0.8
        ours = quat_to_matrix(so3_exp(jnp.asarray(phi.astype(np.float32))))
        gold = R.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(ours, gold, atol=1e-5)

    def test_small_angle_stable(self):
        for scale in [0.0, 1e-10, 1e-6, 1e-3]:
            phi = jnp.asarray([[scale, 0.0, 0.0]])
            q = so3_exp(phi)
            assert np.all(np.isfinite(q))
            back = so3_log(q)
            np.testing.assert_allclose(back, phi, atol=1e-6)

    def test_grad_no_nan_at_zero(self):
        g = jax.grad(lambda p: jnp.sum(so3_exp(p)))(jnp.zeros(3))
        assert np.all(np.isfinite(g))
        g2 = jax.grad(lambda q: jnp.sum(so3_log(q)))(
            jnp.asarray([1.0, 0.0, 0.0, 0.0]))
        assert np.all(np.isfinite(g2))

    def test_matrix_quat_roundtrip(self, rng):
        q = rand_quats(rng, 200).astype(np.float32)
        m = quat_to_matrix(jnp.asarray(q))
        q2 = matrix_to_quat(m)
        # sign ambiguity: compare rotations
        np.testing.assert_allclose(quat_to_matrix(q2), m, atol=1e-5)


class TestSE3:
    def rand_se3(self, rng, n):
        q = rand_quats(rng, n)
        t = rng.normal(size=(n, 3))
        return jnp.asarray(np.concatenate([t, q], axis=-1).astype(np.float32))

    def test_compose_vs_matrix(self, rng):
        A, B = self.rand_se3(rng, 30), self.rand_se3(rng, 30)
        ours = se3_to_matrix(se3_mul(A, B))
        gold = se3_to_matrix(A) @ se3_to_matrix(B)
        np.testing.assert_allclose(ours, gold, atol=1e-5)

    def test_inverse(self, rng):
        T = self.rand_se3(rng, 30)
        eye = se3_mul(T, se3_inverse(T))
        gold = np.tile(np.array(se3_identity()), (30, 1))
        # quaternion sign may flip; compare matrices
        np.testing.assert_allclose(
            se3_to_matrix(eye), se3_to_matrix(jnp.asarray(gold)), atol=1e-5)

    def test_apply_vs_matrix(self, rng):
        T = self.rand_se3(rng, 10)
        x = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        M = se3_to_matrix(T)
        gold = (M[..., :3, :3] @ x[..., None])[..., 0] + M[..., :3, 3]
        np.testing.assert_allclose(se3_apply(T, x), gold, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(100, 6)).astype(np.float32)
        # keep |phi| < pi (log is only the exp inverse inside the ball)
        nrm = np.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi[:, 3:] *= np.minimum(1.0, 2.9 / nrm)
        back = se3_log(se3_exp(jnp.asarray(xi)))
        np.testing.assert_allclose(back, xi, atol=1e-4)

    def test_log_exp_roundtrip(self, rng):
        T = self.rand_se3(rng, 50)
        T2 = se3_exp(se3_log(T))
        np.testing.assert_allclose(
            se3_to_matrix(T2), se3_to_matrix(T), atol=1e-4)

    def test_matrix_roundtrip(self, rng):
        T = self.rand_se3(rng, 50)
        T2 = matrix_to_se3(se3_to_matrix(T))
        np.testing.assert_allclose(
            se3_to_matrix(T2), se3_to_matrix(T), atol=1e-5)


class TestSIM3:
    def rand_sim3(self, rng, n):
        q = rand_quats(rng, n)
        t = rng.normal(size=(n, 3))
        s = np.exp(rng.normal(size=(n, 1)) * 0.5)
        return jnp.asarray(np.concatenate([t, q, s], -1).astype(np.float32))

    def test_apply_definition(self, rng):
        S = self.rand_sim3(rng, 20)
        x = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
        gold = S[..., 7:8] * quat_rotate(S[..., 3:7], x) + S[..., :3]
        np.testing.assert_allclose(sim3_apply(S, x), gold, atol=1e-5)

    def test_mul_action_consistent(self, rng):
        A, B = self.rand_sim3(rng, 20), self.rand_sim3(rng, 20)
        x = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
        np.testing.assert_allclose(
            sim3_apply(sim3_mul(A, B), x), sim3_apply(A, sim3_apply(B, x)),
            atol=1e-4)

    def test_inverse(self, rng):
        S = self.rand_sim3(rng, 20)
        x = jnp.asarray(rng.normal(size=(20, 3)).astype(np.float32))
        np.testing.assert_allclose(
            sim3_apply(sim3_mul(S, sim3_inverse(S)), x), x, atol=1e-4)

    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(100, 7)).astype(np.float32)
        xi[:, 3:6] *= 0.8
        xi[:, 6] *= 0.5
        back = sim3_log(sim3_exp(jnp.asarray(xi)))
        np.testing.assert_allclose(back, xi, atol=2e-4)

    def test_se3_embedding(self, rng):
        # sim3 with s=1 must act exactly like se3
        q = rand_quats(rng, 10)
        t = rng.normal(size=(10, 3))
        T = jnp.asarray(np.concatenate([t, q], -1).astype(np.float32))
        S = sim3_from_se3(T)
        x = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        np.testing.assert_allclose(sim3_apply(S, x), se3_apply(T, x),
                                   atol=1e-5)
        # exp of [rho, phi, 0] == se3 exp
        xi = rng.normal(size=(10, 6)).astype(np.float32)
        xi7 = np.concatenate([xi, np.zeros((10, 1), np.float32)], -1)
        np.testing.assert_allclose(
            sim3_exp(jnp.asarray(xi7))[..., :7], se3_exp(jnp.asarray(xi)),
            atol=1e-5)


CAMERAS = [
    Camera.pinhole(640, 480, 500.0, 505.0, 320.0, 240.0),
    Camera.atan(640, 480, 500.0, 505.0, 320.0, 240.0, 0.9),
    Camera.opencv(640, 480, 500.0, 505.0, 320.0, 240.0,
                  0.05, -0.01, 0.001, -0.002, 0.002),
]


class TestCamera:
    @pytest.mark.parametrize("cam", CAMERAS, ids=lambda c: c.model)
    def test_project_unproject_roundtrip(self, cam, rng):
        # rays within a moderate cone so distortion stays invertible
        xy = rng.uniform(-0.4, 0.4, size=(200, 2)).astype(np.float32)
        p = np.concatenate([xy, np.ones((200, 1), np.float32)], -1)
        uv, valid = cam.project(jnp.asarray(p))
        ray = cam.unproject(uv)
        ray = ray / ray[..., 2:3]
        np.testing.assert_allclose(np.asarray(ray)[np.asarray(valid)],
                                   p[np.asarray(valid)], atol=1e-3)

    @pytest.mark.parametrize("cam", CAMERAS, ids=lambda c: c.model)
    def test_center_projects_to_principal_point(self, cam):
        uv, valid = cam.project(jnp.asarray([0.0, 0.0, 1.0]))
        np.testing.assert_allclose(uv, [cam.cx, cam.cy], atol=1e-4)
        assert bool(valid)

    def test_behind_camera_invalid(self):
        cam = CAMERAS[0]
        _, valid = cam.project(jnp.asarray([0.0, 0.0, -1.0]))
        assert not bool(valid)

    def test_pinhole_matches_K(self, rng):
        cam = CAMERAS[0]
        p = rng.uniform(0.2, 2, size=(50, 3)).astype(np.float32)
        uv, _ = cam.project(jnp.asarray(p))
        gold = (cam.K() @ (p / p[:, 2:3]).T).T[:, :2]
        np.testing.assert_allclose(uv, gold, atol=1e-3)

    def test_ocam_roundtrip(self):
        # synthetic near-linear omnidirectional calibration:
        # cam2world poly z(rho) ~= (rho_max - rho)-ish monotone; use a
        # simple fisheye-equidistant-like model: theta = rho / f
        f = 300.0
        # z = cos(theta), r_xy = sin(theta) with rho = f * theta
        # polynomial fit of z(rho) on rho in [0, f*1.2]
        rho = np.linspace(1e-3, f * 1.2, 64)
        theta = rho / f
        z_over_rxy = np.cos(theta) / np.sin(theta) * rho
        poly = np.polynomial.polynomial.polyfit(rho, z_over_rxy, 5)
        # inverse: rho(angle_from_axis): theta_axis = atan2(z, rxy)
        ang = np.arctan2(z_over_rxy, rho)
        inv = np.polynomial.polynomial.polyfit(ang, rho, 9)
        cam = Camera.ocam(640, 480, [320.0, 240.0], [1.0, 0.0, 0.0],
                          poly, inv)
        xy = np.random.default_rng(1).uniform(-0.5, 0.5, (100, 2))
        p = np.concatenate([xy, np.ones((100, 1))], -1).astype(np.float32)
        p /= np.linalg.norm(p, axis=-1, keepdims=True)
        uv, valid = cam.project(jnp.asarray(p))
        ray = np.asarray(cam.unproject(uv))
        p_dir = p / np.linalg.norm(p, axis=-1, keepdims=True)
        dots = np.abs(np.sum(ray * p_dir, axis=-1))
        assert np.all(dots[np.asarray(valid)] > 0.999)


class TestGPS:
    def test_lla_ecef_roundtrip_f64(self, rng):
        # host path: float64 numpy, tight tolerance
        lla = np.stack([
            rng.uniform(-80, 80, 20), rng.uniform(-179, 179, 20),
            rng.uniform(0, 4000, 20)], -1)
        back = gps.ecef_to_lla(gps.lla_to_ecef(lla, xp=np), xp=np)
        np.testing.assert_allclose(back, lla, atol=1e-7)

    def test_lla_ecef_roundtrip_f32(self, rng):
        # device path: f32 resolution at ECEF magnitude is ~0.5 m
        lla = np.stack([
            rng.uniform(-80, 80, 20), rng.uniform(-179, 179, 20),
            rng.uniform(0, 4000, 20)], -1)
        back = gps.ecef_to_lla(gps.lla_to_ecef(jnp.asarray(lla)))
        np.testing.assert_allclose(back[..., :2], lla[..., :2], atol=1e-3)
        np.testing.assert_allclose(back[..., 2], lla[..., 2], atol=5.0)

    def test_known_point(self):
        # equator/prime meridian at 0 alt -> (a, 0, 0)
        ecef = gps.lla_to_ecef(np.asarray([0.0, 0.0, 0.0]), xp=np)
        np.testing.assert_allclose(ecef, [gps.WGS84_A, 0, 0], atol=1e-6)

    def test_enu_roundtrip_and_locality(self):
        origin = np.asarray([47.2, 8.5, 400.0])
        lla = np.asarray([[47.2001, 8.5001, 402.0]])
        enu = gps.lla_to_enu_np(lla, origin)
        # ~11m north, ~7.5m east, 2m up (rough locality check)
        e, n, u = np.asarray(enu)[0]
        assert 5 < e < 10 and 8 < n < 14 and 1.5 < u < 2.5
        back = gps.enu_to_lla(enu, origin, xp=np)
        np.testing.assert_allclose(back, lla, atol=1e-9)


class TestImage:
    def test_type_codes(self):
        from gslam_tpu.core import image

        assert image.type_code(np.uint8, 1) == 0    # CV_8UC1
        assert image.type_code(np.uint8, 3) == 16   # CV_8UC3
        assert image.type_code(np.float32, 1) == 5  # CV_32FC1
        dt, ch = image.decode_type(16)
        assert dt == np.uint8 and ch == 3

    def test_gray_conversion_and_pad(self):
        from gslam_tpu.core import image

        rgb = np.zeros((4, 6, 3), np.uint8)
        rgb[..., 1] = 255
        g = image.to_gray_f32(rgb)
        assert g.shape == (4, 6) and abs(g[0, 0] - 0.587) < 1e-3
        d = image.to_device(g, pad_to=(8, 8))
        assert d.shape == (8, 8) and float(d[5, 0]) == 0.0
