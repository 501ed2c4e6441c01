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
