"""Vocabulary tests: train/transform/score/save-load/DBoW3-format —
mirroring the reference's vocabulary unit tests (train small voc,
transform, save/load roundtrip, DBoW compat; SURVEY section 4).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gslam_tpu.ops.vocab import (
    Vocabulary, hamming_packed, load_dbow3_text, load_vocabulary,
    save_dbow3_text, save_vocabulary, score_l1, score_l2, train_vocabulary,
    transform,
)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    # 3 clusters of descriptors: random prototypes + bit noise
    protos = rng.integers(0, 2**32, (3, 8), dtype=np.uint64) \
        .astype(np.uint32)
    out = []
    for i in range(300):
        p = protos[i % 3].copy()
        # flip ~6 random bits
        for _ in range(6):
            w = rng.integers(0, 8)
            p[w] ^= np.uint32(1) << np.uint32(rng.integers(0, 32))
        out.append(p)
    return np.stack(out), protos


@pytest.fixture(scope="module")
def voc(corpus):
    desc, _ = corpus
    return train_vocabulary(desc, k=3, L=2, seed=0)


class TestTrainTransform:
    def test_structure(self, voc):
        assert voc.n_words == 9
        assert voc.node_desc.shape == (1 + 3 + 9, 8)
        assert voc.word_weight.shape == (9,)

    def test_same_cluster_same_word(self, corpus, voc):
        desc, protos = corpus
        # noisy variants of the same prototype should map to the same word
        bow, words = transform(voc, jnp.asarray(desc[:30]))
        words = np.asarray(words)
        by_proto = [words[np.arange(30) % 3 == i] for i in range(3)]
        for grp in by_proto:
            vals, counts = np.unique(grp, return_counts=True)
            assert counts.max() / len(grp) > 0.8  # mostly consistent

    def test_bow_normalized(self, corpus, voc):
        desc, _ = corpus
        bow, _ = transform(voc, jnp.asarray(desc[:50]))
        assert abs(float(jnp.abs(bow).sum()) - 1.0) < 1e-5

    def test_self_similarity_highest(self, corpus, voc):
        desc, _ = corpus
        bow1, _ = transform(voc, jnp.asarray(desc[0:40]))
        bow2, _ = transform(voc, jnp.asarray(desc[1:41]))  # near-same set
        rng = np.random.default_rng(3)
        other = rng.integers(0, 2**32, (40, 8), dtype=np.uint64) \
            .astype(np.uint32)
        bow3, _ = transform(voc, jnp.asarray(other))
        db = jnp.stack([bow2, bow3])
        s = np.asarray(score_l1(bow1, db))
        assert s[0] > s[1]
        s2 = np.asarray(score_l2(bow1, db))
        assert s2[0] > s2[1]

    def test_invalid_masked(self, corpus, voc):
        desc, _ = corpus
        valid = jnp.zeros(20, bool)
        bow, words = transform(voc, jnp.asarray(desc[:20]), valid)
        assert np.all(np.asarray(words) == -1)

    def test_hamming_packed(self):
        a = jnp.asarray(np.array([[0xFFFFFFFF] + [0] * 7], np.uint32))
        b = jnp.zeros((1, 8), jnp.uint32)
        assert int(hamming_packed(a[0], b[0])) == 32


class TestPersistence:
    def test_npz_roundtrip(self, voc, tmp_path, corpus):
        p = str(tmp_path / "voc.npz")
        save_vocabulary(voc, p)
        v2 = load_vocabulary(p)
        desc, _ = corpus
        b1, w1 = transform(voc, jnp.asarray(desc[:20]))
        b2, w2 = transform(v2, jnp.asarray(desc[:20]))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    def test_binary_roundtrip(self, voc, tmp_path, corpus):
        from gslam_tpu.ops.vocab import load_binary, save_binary

        p = str(tmp_path / "voc.gvoc")
        save_binary(voc, p)
        v2 = load_binary(p)
        assert v2.k == voc.k and v2.L == voc.L
        np.testing.assert_array_equal(np.asarray(v2.node_desc),
                                      np.asarray(voc.node_desc))
        np.testing.assert_array_equal(np.asarray(v2.word_weight),
                                      np.asarray(voc.word_weight))
        desc, _ = corpus
        _, w1 = transform(voc, jnp.asarray(desc[:20]))
        _, w2 = transform(v2, jnp.asarray(desc[:20]))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))

    def test_binary_rejects_garbage(self, tmp_path):
        from gslam_tpu.ops.vocab import load_binary

        p = str(tmp_path / "bad.gvoc")
        with open(p, "wb") as f:
            f.write(b"NOTAVOCAB123")
        with pytest.raises(ValueError):
            load_binary(p)

    def test_dbow3_text_roundtrip(self, voc, tmp_path, corpus):
        p = str(tmp_path / "voc.txt")
        save_dbow3_text(voc, p)
        v2 = load_dbow3_text(p)
        assert v2.k == voc.k and v2.L == voc.L
        desc, _ = corpus
        _, w1 = transform(voc, jnp.asarray(desc[:20]))
        _, w2 = transform(v2, jnp.asarray(desc[:20]))
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
        np.testing.assert_allclose(np.asarray(v2.word_weight),
                                   np.asarray(voc.word_weight), atol=1e-5)


class TestWordGatedMatching:
    def test_gate_restricts_to_same_node(self, rng):
        from gslam_tpu.ops.matching import (match_descriptors,
                                            match_descriptors_word_gated)
        from gslam_tpu.ops.vocab import train_vocabulary, transform

        train = rng.integers(0, 2**32, (400, 8), dtype=np.uint64) \
            .astype(np.uint32)
        voc = train_vocabulary(train, k=4, L=3, seed=2)
        a = jnp.asarray(train[:64])
        b = jnp.asarray(train[:64])  # identical sets -> self matches
        va = jnp.ones(64, bool)
        _, wa = transform(voc, a, va)
        m = match_descriptors_word_gated(a, va, wa, b, va, wa,
                                         ratio=1.0, level_div=voc.k)
        # identical descriptors share their word: self-match survives
        np.testing.assert_array_equal(np.asarray(m.idx), np.arange(64))

        # descriptors forced into different nodes can never match
        wa_bad = (wa + 1) % voc.n_words
        m2 = match_descriptors_word_gated(a, va, wa, b, va, wa_bad,
                                          ratio=1.0, level_div=1)
        assert int(m2.count) == 0

    def test_gated_is_subset_of_ungated(self, rng):
        from gslam_tpu.ops.matching import (match_descriptors,
                                            match_descriptors_word_gated)
        from gslam_tpu.ops.vocab import train_vocabulary, transform

        train = rng.integers(0, 2**32, (400, 8), dtype=np.uint64) \
            .astype(np.uint32)
        voc = train_vocabulary(train, k=4, L=2, seed=0)
        a = jnp.asarray(train[:48])
        b = jnp.asarray(train[100:180])
        va = jnp.ones(48, bool)
        vb = jnp.ones(80, bool)
        _, wa = transform(voc, a, va)
        _, wb = transform(voc, b, vb)
        g = match_descriptors_word_gated(a, va, wa, b, vb, wb,
                                         ratio=0.9, level_div=voc.k)
        ug = match_descriptors(a, va, b, vb, ratio=0.9, mutual=False)
        # every gated match with the same pairing must have the gold
        # distance (gating can only REMOVE candidates, so where idx
        # agrees the distance is identical)
        same = np.asarray(g.valid) & np.asarray(ug.valid) \
            & (np.asarray(g.idx) == np.asarray(ug.idx))
        np.testing.assert_allclose(np.asarray(g.dist)[same],
                                   np.asarray(ug.dist)[same])
