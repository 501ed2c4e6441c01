"""Two-view initialization tests: homography decomposition + H/E model
selection (gslam_tpu.estimation.init2view).  The reference ecosystem's
SLAM plugins carry this logic in their monocular initializers (built on
GSLAM/core/Estimator.h findHomography/findEssentialMatrix); here it is
a fused jittable graph and must recover the true motion on BOTH general
3D scenes (E regime) and (near-)planar scenes, where the 8-point
essential solve is degenerate.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gslam_tpu.core.so3 import quat_to_matrix, so3_exp
from gslam_tpu.estimation.homography import decompose_homography
from gslam_tpu.estimation.init2view import two_view_geometry


def rot(phi):
    return np.asarray(quat_to_matrix(so3_exp(jnp.asarray(
        np.asarray(phi, np.float32)))))


def project_two_views(X, R, t, noise, rng):
    X2 = X @ R.T + t
    r1 = X[:, :2] / X[:, 2:3] + rng.normal(0, noise, (len(X), 2))
    r2 = X2[:, :2] / X2[:, 2:3] + rng.normal(0, noise, (len(X), 2))
    return r1.astype(np.float32), r2.astype(np.float32)


def angle_deg(Ra, Rb):
    return np.degrees(np.arccos(np.clip((np.trace(Ra @ Rb.T) - 1) / 2,
                                        -1, 1)))


class TestDecomposeHomography:
    def test_exact_plane(self, rng):
        """Exact H = R + t n^T/d must decompose to (R, t/|t|)."""
        for trial in range(4):
            R = rot(rng.uniform(-0.25, 0.25, 3))
            t = rng.uniform(-1, 1, 3)
            t /= np.linalg.norm(t)
            n = np.array([0.1 * rng.standard_normal(),
                          0.1 * rng.standard_normal(), -1.0])
            n /= np.linalg.norm(n)
            d = 5.0
            N = 120
            X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-2, 2, N),
                          np.zeros(N)], -1)
            X[:, 2] = (d - X[:, 0] * n[0] - X[:, 1] * n[1]) / n[2]
            if X[:, 2].mean() < 0:
                n = -n
                X[:, 2] = (d - X[:, 0] * n[0] - X[:, 1] * n[1]) / n[2]
            H = (R + np.outer(t, n) / d).astype(np.float32)
            r1, r2 = project_two_views(X, R, t, 0.0, rng)
            T21, score = decompose_homography(
                jnp.asarray(H), jnp.asarray(r1), jnp.asarray(r2),
                jnp.ones(N, bool))
            T21 = np.asarray(T21)
            Re = np.asarray(quat_to_matrix(jnp.asarray(T21[3:7])))
            # exact-plane twofold ambiguity: accept either solution but
            # the cheirality score must be full
            assert int(score) == N
            err_true = angle_deg(Re, R)
            t_err = np.linalg.norm(T21[:3] - t)
            if err_true < 1.0:
                assert t_err < 0.05

    def test_negated_h_same_motion(self, rng):
        """DLT returns H up to sign; -H must yield the same pose."""
        R = rot([0.0, 0.13, 0.0])
        t = np.array([1.0, 0.0, 0.1])
        t /= np.linalg.norm(t)
        n = np.array([0.0, 0.0, -1.0])
        N = 100
        X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-2, 2, N),
                      np.full(N, 6.0)], -1)
        H = (R + np.outer(t, n) / 6.0).astype(np.float32)
        r1, r2 = project_two_views(X, R, t, 0.0, rng)
        out = []
        for Hs in (H, -H):
            T21, _ = decompose_homography(jnp.asarray(Hs),
                                          jnp.asarray(r1),
                                          jnp.asarray(r2),
                                          jnp.ones(N, bool))
            out.append(np.asarray(T21))
        assert np.allclose(out[0][:3], out[1][:3], atol=1e-3)
        assert min(np.linalg.norm(out[0][3:] - out[1][3:]),
                   np.linalg.norm(out[0][3:] + out[1][3:])) < 1e-3


class TestTwoViewGeometry:
    def test_general_scene_uses_e(self, rng, key):
        """Deep 3D scene: E model must win and recover the motion."""
        N = 200
        X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(3, 12, N)], -1)
        R = rot([0.02, -0.15, 0.01])
        t = np.array([1.0, 0.1, 0.05])
        t /= np.linalg.norm(t)
        r1, r2 = project_two_views(X, R, t, 3e-4, rng)
        tv = two_view_geometry(key, jnp.asarray(r1), jnp.asarray(r2),
                               jnp.ones(N, bool), sigma=2e-3)
        T = np.asarray(tv.T_21)
        Re = np.asarray(quat_to_matrix(jnp.asarray(T[3:7])))
        assert not bool(tv.used_h)
        assert angle_deg(Re, R) < 1.0
        assert np.dot(T[:3], t) > 0.95

    def test_planar_scene_uses_h(self, rng, key):
        """Near-planar scene: H model must win (8-point E is
        degenerate here) and still recover the motion."""
        N = 200
        X = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                      np.zeros(N)], -1)
        X[:, 2] = 8.0 + 0.05 * np.sin(X[:, 0])   # quasi-planar
        R = rot([0.0, 0.13, 0.0])
        t = np.array([1.0, 0.0, 0.07])
        t /= np.linalg.norm(t)
        r1, r2 = project_two_views(X, R, t, 3e-4, rng)
        tv = two_view_geometry(key, jnp.asarray(r1), jnp.asarray(r2),
                               jnp.ones(N, bool), sigma=5e-3)
        T = np.asarray(tv.T_21)
        Re = np.asarray(quat_to_matrix(jnp.asarray(T[3:7])))
        assert bool(tv.used_h)
        # quasi-planar twofold ambiguity leaves a few degrees of slack
        assert angle_deg(Re, R) < 4.0
        assert np.dot(T[:3] / np.linalg.norm(T[:3]), t) > 0.85

    def test_outliers_masked(self, rng, key):
        """Inlier mask excludes injected wrong matches."""
        N = 200
        X = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                      rng.uniform(3, 12, N)], -1)
        R = rot([0.02, -0.15, 0.01])
        t = np.array([1.0, 0.1, 0.05])
        t /= np.linalg.norm(t)
        r1, r2 = project_two_views(X, R, t, 2e-4, rng)
        n_out = 50
        r2[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2)).astype(np.float32)
        tv = two_view_geometry(key, jnp.asarray(r1), jnp.asarray(r2),
                               jnp.ones(N, bool), sigma=2e-3)
        inl = np.asarray(tv.inliers)
        assert inl[n_out:].mean() > 0.9
        assert inl[:n_out].mean() < 0.1
