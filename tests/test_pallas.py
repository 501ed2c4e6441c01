"""Pallas kernel gold tests: kernel output must equal the jnp reference.

Run in interpret mode on the CPU backend (CI has no TPU); the same
kernels compile natively on TPU (exercised by bench.py).
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # e2e/mesh tier: excluded from tests-fast

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gslam_tpu.ops.frontend import fast_score, nms
from gslam_tpu.ops.matching import match_descriptors
from gslam_tpu.ops.pallas.fastnms import fast_nms_pallas
from gslam_tpu.ops.pallas.matcher import match_hamming_pallas

from tests.test_frontend import blob_image


class TestFastNmsKernel:
    def test_gold_vs_reference(self, rng):
        img = jnp.asarray(blob_image(rng, H=96, W=128, n=25))
        gold = nms(fast_score(img, 0.08))
        out = fast_nms_pallas(img, threshold=0.08, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                                   atol=1e-5)

    def test_flat_zero(self):
        img = jnp.full((64, 128), 0.5)
        out = fast_nms_pallas(img, interpret=True)
        assert float(jnp.abs(out).max()) == 0.0

    @pytest.mark.parametrize("shape", [(240, 320), (123, 160), (61, 96)])
    def test_gold_odd_shapes(self, rng, shape):
        """Stripe grid + halo padding must stay gold-exact when H is
        not a multiple of the stripe (incl. H smaller than one stripe)
        — pyramid levels hit such shapes constantly."""
        H, W = shape
        img = jnp.asarray(blob_image(rng, H=H, W=W, n=30))
        gold = nms(fast_score(img, 0.08))
        out = fast_nms_pallas(img, threshold=0.08, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(gold),
                                   atol=1e-5)


class TestMatcherKernel:
    def _sets(self, rng, n=64, m=48):
        a = rng.integers(0, 2**31, (n, 8)).astype(np.uint32)
        # half of b are noisy copies of a rows, half random
        b = rng.integers(0, 2**31, (m, 8)).astype(np.uint32)
        for i in range(0, m, 2):
            b[i] = a[i % n]
            b[i, 0] ^= 0b11  # 2-bit noise
        va = np.ones(n, bool)
        va[3] = False
        vb = np.ones(m, bool)
        vb[5] = False
        return (jnp.asarray(a), jnp.asarray(va),
                jnp.asarray(b), jnp.asarray(vb))

    @pytest.mark.parametrize("mutual", [True, False])
    def test_gold_vs_reference(self, rng, mutual):
        a, va, b, vb = self._sets(rng)
        gold = match_descriptors(a, va, b, vb, mutual=mutual)
        out = match_hamming_pallas(a, va, b, vb, mutual=mutual,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(out.valid),
                                      np.asarray(gold.valid))
        np.testing.assert_array_equal(np.asarray(out.idx),
                                      np.asarray(gold.idx))
        np.testing.assert_allclose(
            np.asarray(out.dist)[np.asarray(out.valid)],
            np.asarray(gold.dist)[np.asarray(gold.valid)])

    def test_self_match(self, rng):
        a = jnp.asarray(rng.integers(0, 2**31, (32, 8)).astype(np.uint32))
        v = jnp.ones(32, bool)
        out = match_hamming_pallas(a, v, a, v, ratio=1.0, interpret=True)
        np.testing.assert_array_equal(np.asarray(out.idx), np.arange(32))


class TestVocabKernel:
    def test_gold_vs_reference(self, rng):
        from gslam_tpu.ops.pallas.vocab import transform_words_pallas
        from gslam_tpu.ops.vocab import (_transform_words,
                                         train_vocabulary)

        train = rng.integers(0, 2**32, (600, 8), dtype=np.uint64) \
            .astype(np.uint32)
        voc = train_vocabulary(train, k=4, L=3, seed=1)
        # query: mix of training descriptors and fresh random ones,
        # N not a multiple of the kernel tile (exercises padding)
        q = np.concatenate([train[:100],
                            rng.integers(0, 2**32, (73, 8),
                                         dtype=np.uint64)
                            .astype(np.uint32)])
        valid = np.ones(len(q), bool)
        valid[7] = False
        gold = _transform_words(voc.node_desc, jnp.asarray(q),
                                jnp.asarray(valid), voc.k, voc.L)
        out = transform_words_pallas(voc.node_desc, jnp.asarray(q),
                                     jnp.asarray(valid), voc.k, voc.L,
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(gold))

    def test_transform_use_pallas_bow(self, rng):
        """transform(use_pallas=True) matches the jnp BoW end to end
        (interpret-mode path is exercised above; here on CPU the flag
        must still produce the identical BowVector via the fallback
        decision logic when the kernel applies)."""
        from gslam_tpu.ops import vocab as V

        train = rng.integers(0, 2**32, (300, 8), dtype=np.uint64) \
            .astype(np.uint32)
        voc = V.train_vocabulary(train, k=3, L=2, seed=0)
        q = jnp.asarray(train[:50])
        gold_bow, gold_w = V.transform(voc, q)
        # interpret path through the public API
        from gslam_tpu.ops.pallas.vocab import transform_words_pallas
        w = transform_words_pallas(voc.node_desc, q,
                                   jnp.ones(50, bool), voc.k, voc.L,
                                   interpret=True)
        np.testing.assert_array_equal(np.asarray(w), np.asarray(gold_w))


def make_ba_problem(rng, C=5, P=200, O=6, noise=2e-3, fixed_cam0=True):
    """Realistic BA problem: obs = true projection + noise, with fixed
    blocks, invalid slots, a behind-camera point, non-uniform weights.
    Shared by the interpret-mode gold tests here and the on-chip tier
    (tests/test_pallas_tpu.py)."""
    from gslam_tpu.core.se3 import se3_apply
    from gslam_tpu.opt.ba import BundleProblem

    cam_t = rng.normal(0, 0.2, (C, 3))
    q = np.tile([1.0, 0, 0, 0], (C, 1)) + rng.normal(0, 0.05, (C, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cam = np.concatenate([cam_t, q], 1).astype(np.float32)
    pts = rng.normal(0, 1.0, (P, 3)).astype(np.float32)
    pts[:, 2] += 5
    pts[3] = [0, 0, -5]                      # behind every camera
    obs_cam = rng.integers(0, C, (P, O)).astype(np.int32)
    pc = np.asarray(se3_apply(jnp.asarray(cam)[obs_cam],
                              jnp.asarray(pts)[:, None]))
    z = np.maximum(pc[..., 2], 1e-3)
    obs_uv = (pc[..., :2] / z[..., None]
              + rng.normal(0, noise, (P, O, 2))).astype(np.float32)
    obs_valid = rng.random((P, O)) < 0.85
    obs_w = (rng.random((P, O)) + 0.5).astype(np.float32)
    cam_fixed = np.zeros(C, bool)
    cam_fixed[0] = fixed_cam0
    pt_fixed = np.zeros(P, bool)
    pt_fixed[7] = True
    return BundleProblem(*map(jnp.asarray, (
        cam, cam_fixed, pts, pt_fixed, obs_cam, obs_uv, obs_valid,
        obs_w)))


class TestSchurKernel:
    """Fused residual->Schur BA kernel vs opt.ba.schur_reduce.

    Parity runs under jax.default_matmul_precision('highest'): this
    environment's DEFAULT matmul precision is bf16-grade even on the
    CPU backend, and the kernel (pure-VPU Jacobians) is the MORE
    accurate side — at default precision the jnp reference's
    `dproj @ R` carries ~0.15% error (verified against f64)."""

    def _parity(self, prob, lam=1e-3, hd=0.01):
        from gslam_tpu.opt.ba import schur_reduce
        from gslam_tpu.ops.pallas.schur import schur_reduce_pallas

        with jax.default_matmul_precision("highest"):
            S0, b0, W0, Hi0, bp0 = schur_reduce(prob, jnp.float32(lam),
                                                hd)
            S1, b1, W1, Hi1, bp1 = schur_reduce_pallas(
                prob, jnp.float32(lam), hd, interpret=True)
        np.testing.assert_allclose(np.asarray(S1), np.asarray(S0),
                                   rtol=1e-4, atol=1e-4 * float(
                                       jnp.abs(S0).max()))
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b0),
                                   atol=1e-4 * max(float(
                                       jnp.abs(b0).max()), 1e-6))
        np.testing.assert_allclose(np.asarray(W1.W_e),
                                   np.asarray(W0.W_e), atol=1e-4)
        np.testing.assert_allclose(np.asarray(Hi1), np.asarray(Hi0),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(bp1), np.asarray(bp0),
                                   atol=1e-5)

    def test_gold_vs_reference(self, rng):
        self._parity(make_ba_problem(rng))

    def test_gold_odd_shapes(self, rng):
        """P not a lane-tile multiple, odd O, tiny C: padding must be
        inert and the one-hot camera loop correct at any C."""
        self._parity(make_ba_problem(rng, C=3, P=137, O=5))

    def test_gold_multi_tile(self, rng):
        self._parity(make_ba_problem(rng, C=8, P=300, O=4))

    def test_cost_gold(self, rng):
        from gslam_tpu.opt.ba import ba_cost
        from gslam_tpu.ops.pallas.schur import ba_cost_pallas

        prob = make_ba_problem(rng)
        c0 = float(ba_cost(prob, 0.01))
        c1 = float(ba_cost_pallas(prob, 0.01, interpret=True))
        np.testing.assert_allclose(c1, c0, rtol=1e-5)

    def test_full_lm_parity(self, rng):
        """bundle_adjust(backend='pallas') walks the same LM trajectory
        as the jnp backend (same costs, same accepted steps)."""
        from gslam_tpu.opt.ba import bundle_adjust

        prob = make_ba_problem(rng)
        with jax.default_matmul_precision("highest"):
            outj, stj = bundle_adjust(prob, iters=8)
            outp, stp = bundle_adjust(prob, iters=8, backend="pallas",
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(stp.cost),
                                   np.asarray(stj.cost), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(outp.cam_pose),
                                   np.asarray(outj.cam_pose), atol=1e-4)
        assert float(stp.cost[-1]) < 0.75 * float(stp.cost[0])

    def test_malformed_obs_uv_raises(self, rng):
        """A broadcast-shaped (P, 1, 2) obs_uv silently works in the
        jnp path; the plane layout must reject it loudly."""
        prob = make_ba_problem(rng, C=2, P=16, O=2)
        bad = prob._replace(obs_uv=prob.obs_uv[:, :1])
        from gslam_tpu.ops.pallas.schur import schur_reduce_pallas

        with pytest.raises(ValueError, match="obs_uv"):
            schur_reduce_pallas(bad, jnp.float32(1e-3), 0.01,
                                interpret=True)


class TestBriefKernel:
    """One-hot MXU BRIEF sampler vs the jnp flat-gather reference.

    Contract is BIT-EXACT descriptors for valid (border-respecting)
    keypoints — the kernel reproduces the jnp path's rounding and
    parenthesization precisely."""

    def _check(self, rng, H, W, max_kps):
        from gslam_tpu.ops.frontend import (brief_descriptors,
                                            extract_features,
                                            gaussian_blur)
        from gslam_tpu.ops.pallas.brief import brief_descriptors_pallas
        from tests.test_frontend import blob_image

        img = jnp.asarray(blob_image(rng, H=H, W=W, n=60))
        feats = extract_features(img, max_kps=max_kps, threshold=0.06)
        blur = gaussian_blur(img, sigma=2.0)
        gold = np.asarray(brief_descriptors(blur, feats.uv, feats.angle))
        out = np.asarray(brief_descriptors_pallas(blur, feats.uv,
                                                  feats.angle,
                                                  interpret=True))
        v = np.asarray(feats.valid)
        assert v.sum() > 10
        np.testing.assert_array_equal(out[v], gold[v])

    def test_gold_bit_exact(self, rng):
        self._check(rng, 240, 320, 128)

    def test_gold_odd_shapes(self, rng):
        """Non-multiple-of-tile K and an image whose aligned patch
        windows need padding."""
        self._check(rng, 123, 161, 50)


class TestFastNmsRaw:
    def test_raw_map_gold(self, rng):
        """The fused second output must equal jnp fast_score exactly
        (it feeds subpixel refinement)."""
        from gslam_tpu.ops.frontend import fast_score, nms
        from gslam_tpu.ops.pallas.fastnms import fast_nms_raw_pallas
        from tests.test_frontend import blob_image

        img = jnp.asarray(blob_image(rng, H=96, W=128, n=25))
        score, raw = fast_nms_raw_pallas(img, threshold=0.08,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(raw),
                                   np.asarray(fast_score(img, 0.08)),
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(score), np.asarray(nms(fast_score(img, 0.08))),
            atol=1e-5)


class TestGatedMatcherKernel:
    def test_gold_vs_reference(self, rng):
        from gslam_tpu.ops.matching import match_descriptors_gated
        from gslam_tpu.ops.pallas.matcher import \
            match_hamming_gated_pallas

        N, M = 96, 64
        a = jnp.asarray(rng.integers(0, 2**31, (N, 8)).astype(np.uint32))
        b = np.asarray(rng.integers(0, 2**31, (M, 8)).astype(np.uint32))
        b[:32] = np.asarray(a[:32])
        b[:32, 0] ^= 0b111                # 3-bit noise copies
        b = jnp.asarray(b)
        va = jnp.asarray(rng.random(N) < 0.9)
        vb = jnp.asarray(rng.random(M) < 0.9)
        uv_a = jnp.asarray(rng.uniform(0, 100, (N, 2)).astype(np.float32))
        uv_b = np.asarray(rng.uniform(0, 100, (M, 2)).astype(np.float32))
        uv_b[:32] = np.asarray(uv_a[:32]) + 2.0   # inside the gate
        uv_b = jnp.asarray(uv_b)
        gold = match_descriptors_gated(a, va, b, vb, uv_a, uv_b, 12.0,
                                       max_dist=64.0, ratio=0.9)
        out = match_hamming_gated_pallas(a, va, b, vb, uv_a, uv_b, 12.0,
                                         max_dist=64.0, ratio=0.9,
                                         interpret=True)
        assert int(gold.count) > 10
        np.testing.assert_array_equal(np.asarray(out.idx),
                                      np.asarray(gold.idx))
        np.testing.assert_array_equal(np.asarray(out.valid),
                                      np.asarray(gold.valid))


class TestViPallasBackend:
    def test_vi_ba_backend_parity(self, rng):
        """vi_bundle_adjust(backend='pallas') (interpret) walks the same
        LM trajectory as the jnp backend: the fused Schur kernel slots
        into the joint visual-inertial system unchanged."""
        import jax

        from tests.test_vi import TestViBundleAdjust

        prob, _, _ = TestViBundleAdjust()._make_problem()
        from gslam_tpu.opt.vi import vi_bundle_adjust

        with jax.default_matmul_precision("highest"):
            outj, cj = vi_bundle_adjust(prob, iters=5)
            outp, cp = vi_bundle_adjust(prob, iters=5, backend="pallas",
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(cp), np.asarray(cj),
                                   rtol=1e-3)
        np.testing.assert_allclose(np.asarray(outp.vision.cam_pose),
                                   np.asarray(outj.vision.cam_pose),
                                   atol=1e-4)
