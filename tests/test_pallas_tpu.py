"""On-hardware Pallas gold tests (opt-in: ``pytest -m tpu``).

Interpret-mode gold runs (tests/test_pallas.py) validate kernel MATH
but not Mosaic COMPILATION — round 2 shipped a kernel that was
gold-exact interpreted and broke on the real chip's Mosaic layout
rules (fixed in commit a0e0233).  These tests compile and run each
kernel on the actual accelerator and compare against the jnp reference
there.  Excluded from CI tiers (``-m "not tpu"``): the chip sits
behind a remote tunnel whose availability varies.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _require_tpu():
    try:
        dev = jax.devices()[0]
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"no accelerator: {e}")
    if dev.platform == "cpu":
        pytest.skip("no accelerator attached")
    return dev


class TestOnDeviceGold:
    def test_fastnms_compiles_and_matches(self, rng):
        _require_tpu()
        from gslam_tpu.ops.frontend import fast_score, nms
        from gslam_tpu.ops.pallas.fastnms import fast_nms_pallas

        img = jnp.asarray(rng.uniform(0, 1, (480, 640)).astype(np.float32))
        out = np.asarray(fast_nms_pallas(img, threshold=0.08))
        gold = np.asarray(nms(fast_score(img, threshold=0.08)))
        np.testing.assert_allclose(out, gold, atol=1e-5)

    def test_matcher_compiles_and_matches(self, rng):
        _require_tpu()
        from gslam_tpu.ops.matching import match_descriptors
        from gslam_tpu.ops.pallas.matcher import match_hamming_pallas

        a = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint64)
                        .astype(np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (192, 8), dtype=np.uint64)
                        .astype(np.uint32))
        va = jnp.ones(256, bool)
        vb = jnp.ones(192, bool)
        out = match_hamming_pallas(a, va, b, vb)
        gold = match_descriptors(a, va, b, vb)
        np.testing.assert_array_equal(np.asarray(out.idx),
                                      np.asarray(gold.idx))
        np.testing.assert_array_equal(np.asarray(out.valid),
                                      np.asarray(gold.valid))

    def test_vocab_compiles_and_matches(self, rng):
        _require_tpu()
        from gslam_tpu.ops.vocab import (_transform_words,
                                         train_vocabulary)
        from gslam_tpu.ops.pallas.vocab import transform_words_pallas

        train = rng.integers(0, 2**32, (600, 8), dtype=np.uint64) \
            .astype(np.uint32)
        voc = train_vocabulary(train, k=6, L=3, seed=0)
        q = jnp.asarray(train[:128])
        v = jnp.ones(128, bool)
        out = np.asarray(transform_words_pallas(
            voc.node_desc, q, v, voc.k, voc.L))
        gold = np.asarray(_transform_words(voc.node_desc, q, v,
                                           voc.k, voc.L))
        np.testing.assert_array_equal(out, gold)
