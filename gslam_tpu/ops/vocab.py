"""Bag-of-words vocabulary for place recognition.

TPU-native re-design of the reference ``Vocabulary``
(``GSLAM/core/Vocabulary.h``: header-only DBoW2/DBoW3-compatible k-ary
tree over binary descriptors, k-means++ training, TF-IDF BowVector +
FeatureVector, L1/L2 scoring, SSE/AVX popcount — the paper's headline
speedup component).  Here:

* the tree is a *complete* k-ary array (level-major node table), so
  transform is L gather-then-argmin steps over (N, k) Hamming distances
  computed by bit ops on the VPU — no pointers, no recursion, one jitted
  graph for all N descriptors at once;
* BowVectors are dense (n_words,) TF-IDF vectors; database similarity
  (the loop-closure query) is ONE GEMM against the stacked keyframe
  BoW matrix on the MXU;
* training is offline host-side binary k-means (majority-vote medoids),
  numpy;
* save/load: npz; plus a DBoW3-compatible text parser/writer
  (load_dbow3_text) so reference vocabularies interoperate.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gslam_tpu.map.arena import DESC_WORDS


class Vocabulary(NamedTuple):
    """k-ary BoW tree.

    Two layouts share this type:

    * **complete** (the trained / default layout): level-major node
      table; level l occupies [(k^l - 1)/(k-1), (k^(l+1) - 1)/(k-1));
      ``children``/``leaf_word`` are None and child indices are
      arithmetic — no gather through a child table.
    * **general** (loaded DBoW2/DBoW3 trees, possibly pruned with
      early leaves): explicit ``children`` (n_nodes, k) int32 table
      (-1 = missing child) and ``leaf_word`` (n_nodes,) int32 word id
      per leaf (-1 for interior nodes).

    node_desc: (n_nodes, DESC_WORDS) uint32 — per-node cluster centre.
    word_weight: (n_words,) float32 — IDF weight per leaf word.
    k, L: branching factor and depth (static).
    """

    node_desc: jnp.ndarray
    word_weight: jnp.ndarray
    k: int
    L: int
    children: Optional[jnp.ndarray] = None
    leaf_word: Optional[jnp.ndarray] = None

    @property
    def n_words(self) -> int:
        return int(self.word_weight.shape[0])


class SparseBow(NamedTuple):
    """Sparse BowVector: up to S (word id, TF-IDF weight) pairs.

    The reference BowVector is a sorted word->weight map
    (``GSLAM/core/Vocabulary.h``); densifying it to (n_words,) dies at
    real vocabulary scale (k=10, L=6 -> 4 MB/frame).  This fixed-slot
    sparse form costs S*8 bytes/frame (4 KB at S=512) at ANY vocabulary
    size, and database scoring stays a gather (see score_l1_sparse).

    words: (S,) int32 sorted ascending, -1 padding at the END is not
        guaranteed — invalid slots are marked by weight == 0 / word -1.
    weights: (S,) float32, L1-normalized over valid slots.
    """

    words: jnp.ndarray
    weights: jnp.ndarray


def _level_offset(k: int, l: int) -> int:
    """Index of the first node of level l (root = level 0 at index 0)."""
    return (k ** l - 1) // (k - 1)


def _popcount32(x: jnp.ndarray) -> jnp.ndarray:
    """Bit-parallel popcount for uint32 arrays (VPU friendly)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def hamming_packed(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise-broadcast Hamming distance of packed descriptors;
    sums popcount(xor) over the last (word) axis."""
    return _popcount32(a ^ b).sum(-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "L"))
def _transform_words(node_desc: jnp.ndarray, desc: jnp.ndarray,
                     valid: jnp.ndarray, k: int, L: int) -> jnp.ndarray:
    """Descend the tree: (N, W) packed descriptors -> (N,) word ids."""
    N = desc.shape[0]
    node = jnp.zeros((N,), jnp.int32)  # position within level
    for l in range(L):
        off = _level_offset(k, l + 1)
        child_idx = off + node[:, None] * k + jnp.arange(k)[None, :]
        cdesc = node_desc[child_idx]              # (N, k, W)
        d = hamming_packed(cdesc, desc[:, None, :])  # (N, k)
        best = jnp.argmin(d, axis=-1).astype(jnp.int32)
        node = node * k + best
    return jnp.where(valid, node, -1)


@partial(jax.jit, static_argnames=("k", "L"))
def _transform_bow(node_desc: jnp.ndarray, word_weight: jnp.ndarray,
                   desc: jnp.ndarray, valid: jnp.ndarray, k: int, L: int
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(bow (n_words,) L1-normalized TF-IDF, word ids (N,))."""
    words = _transform_words(node_desc, desc, valid, k, L)
    n_words = k ** L
    bow = jnp.zeros((n_words,)).at[words.clip(0)].add(
        jnp.where(valid, word_weight[words.clip(0)], 0.0))
    norm = jnp.maximum(jnp.abs(bow).sum(), 1e-12)
    return bow / norm, words


@partial(jax.jit, static_argnames=("L",))
def _transform_words_tree(node_desc: jnp.ndarray, children: jnp.ndarray,
                          leaf_word: jnp.ndarray, desc: jnp.ndarray,
                          valid: jnp.ndarray, L: int) -> jnp.ndarray:
    """General-tree descent (pruned DBoW trees with early leaves):
    follow the explicit child table; a node with no children is a leaf
    and descent parks there."""
    N = desc.shape[0]
    node = jnp.zeros((N,), jnp.int32)
    for _ in range(L):
        ch = children[node]                         # (N, k)
        ok = ch >= 0
        cdesc = node_desc[ch.clip(0)]               # (N, k, W)
        d = hamming_packed(cdesc, desc[:, None, :])
        d = jnp.where(ok, d, jnp.int32(1 << 30))
        best = jnp.argmin(d, axis=-1)
        nxt = jnp.take_along_axis(ch, best[:, None], 1)[:, 0]
        node = jnp.where(ok.any(-1), nxt, node)
    w = leaf_word[node]
    return jnp.where(valid & (w >= 0), w, -1)


def transform_words(voc: Vocabulary, desc: jnp.ndarray,
                    valid: jnp.ndarray,
                    use_pallas: bool = False) -> jnp.ndarray:
    """(N,) leaf word id per descriptor (-1 for invalid)."""
    if voc.children is not None:
        return _transform_words_tree(voc.node_desc, voc.children,
                                     voc.leaf_word, desc, valid, voc.L)
    if use_pallas:
        from gslam_tpu.ops.pallas.vocab import (MAX_NODES,
                                                transform_words_pallas)

        if voc.node_desc.shape[0] <= MAX_NODES:
            return transform_words_pallas(voc.node_desc, desc, valid,
                                          voc.k, voc.L)
    return _transform_words(voc.node_desc, desc, valid, voc.k, voc.L)


def transform(voc: Vocabulary, desc: jnp.ndarray,
              valid: Optional[jnp.ndarray] = None,
              use_pallas: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dense BowVector + word ids for one descriptor set (jitted).

    Dense (n_words,) output — fine for small/test vocabularies; use
    :func:`transform_sparse` at real vocabulary scale.
    ``use_pallas`` routes the tree descent through the fused MXU kernel
    (ops/pallas/vocab.py) when the node table fits VMEM."""
    if valid is None:
        valid = jnp.ones(desc.shape[0], bool)
    if voc.children is not None or use_pallas:
        words = transform_words(voc, desc, valid, use_pallas=use_pallas)
        bow = jnp.zeros((voc.n_words,)).at[words.clip(0)].add(
            jnp.where(valid & (words >= 0),
                      voc.word_weight[words.clip(0)], 0.0))
        norm = jnp.maximum(jnp.abs(bow).sum(), 1e-12)
        return bow / norm, words
    return _transform_bow(voc.node_desc, voc.word_weight, desc, valid,
                          voc.k, voc.L)


@jax.jit
def _sparsify_words(words: jnp.ndarray, w: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dedup (word, weight) pairs: sort by word, sum runs, L1-norm."""
    S = words.shape[0]
    sent = jnp.int32(2 ** 30)                # sorts after any word id
    key = jnp.where(words >= 0, words, sent)
    order = jnp.argsort(key)
    sw = key[order]
    ww = jnp.where(words >= 0, w, 0.0)[order]
    first = (sw != jnp.roll(sw, 1)) | (jnp.arange(S) == 0)
    seg = jnp.cumsum(first) - 1              # run id per slot
    sums = jnp.zeros((S,)).at[seg].add(ww)
    out_w = jnp.where(first & (sw < sent), sums[seg], 0.0)
    out_words = jnp.where(out_w > 0, sw, -1)
    norm = jnp.maximum(out_w.sum(), 1e-12)
    # compact valid entries to the FRONT: run-starts are scattered over
    # the first V slots, so a consumer truncating to a fixed slab
    # (e.g. the loop-closure database's 512 slots) would silently drop
    # distinct words and break L1 normalization (round-3 advisor)
    comp = jnp.argsort(out_words < 0, stable=True)
    return out_words[comp].astype(jnp.int32), out_w[comp] / norm


def transform_sparse(voc: Vocabulary, desc: jnp.ndarray,
                     valid: Optional[jnp.ndarray] = None,
                     use_pallas: bool = False
                     ) -> Tuple[SparseBow, jnp.ndarray]:
    """SparseBow + per-descriptor word ids.  O(S) memory regardless of
    vocabulary size — the scalable replacement for :func:`transform`."""
    if valid is None:
        valid = jnp.ones(desc.shape[0], bool)
    words = transform_words(voc, desc, valid, use_pallas=use_pallas)
    w = jnp.where(valid & (words >= 0),
                  voc.word_weight[words.clip(0)], 0.0)
    sw, swt = _sparsify_words(words, w)
    return SparseBow(sw, swt), words


@partial(jax.jit, static_argnames=("n_words",))
def _score_l1_sparse(q_words, q_weights, db_words, db_weights, n_words):
    qd = jnp.zeros((n_words,)).at[q_words.clip(0)].add(
        jnp.where(q_words >= 0, q_weights, 0.0))
    g = qd[db_words.clip(0)]                      # (F, S) gather
    g = jnp.where(db_words >= 0, g, 0.0)
    return jnp.minimum(g, db_weights).sum(-1)


def score_l1_sparse(q: SparseBow, db_words: jnp.ndarray,
                    db_weights: jnp.ndarray, n_words: int) -> jnp.ndarray:
    """DBoW L1 score of one SparseBow vs a sparse database.

    Exact: for L1-normalized non-negative vectors the DBoW2 score
    1 - 0.5|a-b|_1 equals the sum of elementwise min over COMMON words,
    so scattering the query into a transient dense (n_words,) vector
    (4 MB at 10^6 words — per query, not per frame) and gathering at
    the database's word slots computes it with one gather + row-sum.
    Cost: O(F*S) gathers — independent of vocabulary size.
    """
    return _score_l1_sparse(q.words, q.weights, jnp.asarray(db_words),
                            jnp.asarray(db_weights), n_words)


def score_l1(bow_a: jnp.ndarray, bow_db: jnp.ndarray) -> jnp.ndarray:
    """DBoW L1 score of one BoW vs a database matrix (D, n_words):
    s = 1 - 0.5 * |a - b|_1  == sum of elementwise min for L1-normalized
    non-negative vectors (identity used by DBoW2); computed densely."""
    return jnp.minimum(bow_a[None, :], bow_db).sum(-1)


def score_l2(bow_a: jnp.ndarray, bow_db: jnp.ndarray) -> jnp.ndarray:
    """Cosine-style L2 score via one GEMV/GEMM on the MXU."""
    na = jnp.maximum(jnp.linalg.norm(bow_a), 1e-12)
    nb = jnp.maximum(jnp.linalg.norm(bow_db, axis=-1), 1e-12)
    return (bow_db @ bow_a) / (na * nb)


# ---------------------------------------------------------------------------
# training (host-side, offline)


def _unpack_bits_np(desc: np.ndarray) -> np.ndarray:
    """(N, W) uint32 -> (N, W*32) uint8 bits (LSB-first per word).

    np.unpackbits over the little-endian byte view with
    bitorder='little' IS the LSB-first uint32 bit order — ~40x the
    shift-and-mask broadcast at training scale (measured 12 s -> 0.3 s
    on 250k descriptors)."""
    d = np.ascontiguousarray(desc.astype('<u4'))
    return np.unpackbits(d.view(np.uint8), axis=1, bitorder="little")


def _pack_bits_np(bits: np.ndarray) -> np.ndarray:
    N, B = bits.shape
    W = B // 32
    w = bits.reshape(N, W, 32).astype(np.uint32)
    return (w << np.arange(32, dtype=np.uint32)).sum(-1).astype(np.uint32)


@partial(jax.jit, static_argnames=("k",))
def _assign_chunk(packed: jnp.ndarray, gid: jnp.ndarray,
                  centres: jnp.ndarray, k: int) -> jnp.ndarray:
    """Per-descriptor nearest of ITS group's k centres.

    packed (C, W) uint32, gid (C,) int32 group ids, centres (G*k, W)
    uint32 -> (C,) int32 child index in [0, k).  XOR + popcount on
    packed words — the whole assignment step is integer VPU work."""
    idx = gid[:, None] * k + jnp.arange(k)[None, :]       # (C, k)
    cdesc = centres[idx]                                  # (C, k, W)
    x = jnp.bitwise_xor(packed[:, None, :], cdesc)
    d = jax.lax.population_count(x).sum(-1)               # (C, k)
    return jnp.argmin(d, axis=1).astype(jnp.int32)


@jax.jit
def _dist_to_seed(packed: jnp.ndarray, seed_desc: jnp.ndarray
                  ) -> jnp.ndarray:
    """Hamming distance of each descriptor to its group's latest seed:
    packed (N, W) uint32, seed_desc (N, W) gathered per row."""
    x = jnp.bitwise_xor(packed, seed_desc)
    return jax.lax.population_count(x).sum(-1)


def train_vocabulary(desc: np.ndarray, k: int = 8, L: int = 3,
                     seed: int = 0, iters: int = 8) -> Vocabulary:
    """Hierarchical binary k-means (reference Vocabulary::create,
    "multithreaded k-means++").

    LEVEL-SYNCHRONOUS vectorized formulation — the round-3 per-node
    python recursion with O(N*k) numpy loops dead-ended at exactly the
    scale the component exists for (k=10, L>=4 over millions of
    descriptors).  Every group of a level trains SIMULTANEOUSLY:

    * kmeans++-style seeding: each seeding round computes ALL
      descriptors' distance to their group's latest seed in one packed
      XOR+popcount pass (device), then draws one weighted sample per
      group (host, group-sorted slices);
    * Lloyd assignment: one chunked device pass
      (:func:`_assign_chunk`) — each descriptor races only its own
      group's k centres, gathered by group id;
    * centre update: majority vote via a (group*k+child) sort and
      ``np.add.reduceat`` segment-sums over the unpacked bit matrix —
      one contiguous pass, no scatter.

    Measured (BASELINE.md): 1M descriptors to a k=10, L=4 (10^4-word)
    vocabulary in ~1-2 min on this host's CPU backend; the same code
    path compiles for TPU.
    """
    rng = np.random.default_rng(seed)
    packed_np = np.ascontiguousarray(np.asarray(desc, np.uint32))
    N, W = packed_np.shape
    B = W * 32
    bits = _unpack_bits_np(packed_np) if N else np.zeros((0, B), np.uint8)
    packed = jnp.asarray(packed_np)
    n_nodes = _level_offset(k, L + 1)
    node_bits = np.zeros((n_nodes, B), np.uint8)

    gid = np.zeros(N, np.int64)          # group of each descriptor
    chunk = 1 << 17

    def assign_all(centres_packed, gid_np):
        # pad the centre table to a power-of-two bucket: every level
        # grows G*k tenfold, and an exact-shape table would recompile
        # _assign_chunk per level (~30 s each behind a remote-compile
        # tunnel); rows beyond G*k are never indexed (gid < G)
        rows = centres_packed.shape[0]
        cap = 1 << max(rows - 1, 1).bit_length()
        cj = jnp.asarray(np.pad(centres_packed,
                                ((0, cap - rows), (0, 0))))
        out = np.empty(N, np.int32)
        for s in range(0, N, chunk):
            e = min(N, s + chunk)
            pad = chunk - (e - s)
            pc = packed[s:e]
            gc = jnp.asarray(gid_np[s:e].astype(np.int32))
            if pad:
                pc = jnp.pad(pc, ((0, pad), (0, 0)))
                gc = jnp.pad(gc, (0, pad))
            out[s:e] = np.asarray(_assign_chunk(pc, gc, cj, k))[:e - s]
        return out

    for l in range(L):
        G = k ** l
        off = _level_offset(k, l + 1)
        # group-sorted layout: contiguous slices per group
        order = np.argsort(gid, kind="stable")
        bounds = np.searchsorted(gid[order], np.arange(G + 1))
        centres = np.zeros((G * k, W), np.uint32)

        # ---- seeding: kmeans++ across all groups per round ----------
        d_min = np.full(N, np.iinfo(np.int32).max, np.int64)
        seed_of_group = np.zeros((G, W), np.uint32)
        for j in range(k):
            for g in range(G):
                lo, hi = bounds[g], bounds[g + 1]
                if hi <= lo:
                    centres[g * k + j] = rng.integers(
                        0, 2 ** 32, W, dtype=np.uint64).astype(np.uint32)
                    continue
                sl = order[lo:hi]
                if j == 0:
                    pick = sl[rng.integers(hi - lo)]
                else:
                    # proper kmeans++ D^2 weighting: linear weights let
                    # two seeds land in one well-separated cloud (and
                    # Lloyd never escapes that local minimum)
                    wts = d_min[sl].astype(np.float64) ** 2 + 1e-3
                    pick = sl[rng.choice(hi - lo, p=wts / wts.sum())]
                centres[g * k + j] = packed_np[pick]
                seed_of_group[g] = packed_np[pick]
            if j < k - 1 and N:
                d = np.asarray(_dist_to_seed(
                    packed, jnp.asarray(seed_of_group[gid])))
                d_min = np.minimum(d_min, d)

        # ---- Lloyd iterations over every group at once --------------
        child = np.zeros(N, np.int32)
        for _ in range(iters):
            child = assign_all(centres, gid)
            cid = gid * k + child
            o2 = np.argsort(cid, kind="stable")
            seg = np.searchsorted(cid[o2], np.arange(G * k + 1))
            sizes = (seg[1:] - seg[:-1])
            # segment bit-sums over the sorted bit matrix: one int32
            # column-blocked cumsum + boundary-gather differences
            # (exact, no scatter, no reduceat's per-segment loop)
            sums = np.zeros((G * k, B), np.int64)
            if N:
                bo = bits[o2]
                for c0 in range(0, B, 64):
                    cs = np.zeros((N + 1, 64), np.int32)
                    np.cumsum(bo[:, c0:c0 + 64], axis=0,
                              dtype=np.int32, out=cs[1:])
                    sums[:, c0:c0 + 64] = (cs[seg[1:]]
                                           - cs[seg[:-1]])
            maj = (sums * 2 >= sizes[:, None]).astype(np.uint8)
            keep = sizes > 0
            new_packed = _pack_bits_np(maj)
            centres = np.where(keep[:, None], new_packed, centres)
            # classic empty-cluster handling: a dead cluster keeps a
            # stale centre forever and wastes a word; re-seed it from
            # a random member of its (non-empty) group
            for c in np.nonzero(~keep)[0]:
                g = c // k
                lo, hi = bounds[g], bounds[g + 1]
                if hi > lo:
                    centres[c] = packed_np[order[lo + rng.integers(
                        hi - lo)]]
        node_bits[off:off + G * k] = _unpack_bits_np(centres)
        gid = gid * k + child

    # IDF weights: ln(N_docs / n_i) approximated with descriptor counts
    n_words = k ** L
    counts = np.bincount(gid, minlength=n_words) if N else \
        np.zeros(n_words)
    N_total = max(N, 1)
    idf = np.log(N_total / np.maximum(counts, 1.0))
    return Vocabulary(
        node_desc=jnp.asarray(_pack_bits_np(node_bits)),
        word_weight=jnp.asarray(idf.astype(np.float32)),
        k=k, L=L)


# ---------------------------------------------------------------------------
# persistence


def save_vocabulary(voc: Vocabulary, path: str) -> None:
    np.savez_compressed(path, node_desc=np.asarray(voc.node_desc),
                        word_weight=np.asarray(voc.word_weight),
                        k=voc.k, L=voc.L)


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    return Vocabulary(node_desc=jnp.asarray(z["node_desc"]),
                      word_weight=jnp.asarray(z["word_weight"]),
                      k=int(z["k"]), L=int(z["L"]))


_VOC_MAGIC = b"GSLAMVOC"
_VOC_VERSION = 1


def save_binary(voc: Vocabulary, path: str) -> None:
    """Flat binary vocabulary (the reference Vocabulary's headline
    feature is fast binary save/load of the whole tree as raw bytes —
    ``GSLAM/core/Vocabulary.h``).  Layout: 8-byte magic, u32 version,
    u32 k, u32 L, u32 descriptor-bytes-per-node, then the node
    descriptor table as raw little-endian uint32 words, then the leaf
    weights as raw float32.  Load is a couple of ``np.frombuffer``
    views — no parsing, O(bytes) like the reference."""
    nd = np.ascontiguousarray(np.asarray(voc.node_desc, np.uint32))
    ww = np.ascontiguousarray(np.asarray(voc.word_weight, np.float32))
    with open(path, "wb") as f:
        f.write(_VOC_MAGIC)
        np.asarray([_VOC_VERSION, voc.k, voc.L, nd.shape[1] * 4],
                   np.uint32).tofile(f)
        nd.tofile(f)
        ww.tofile(f)


def load_binary(path: str) -> Vocabulary:
    """Load a :func:`save_binary` vocabulary (zero-parse, see above)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:8] != _VOC_MAGIC:
        raise ValueError(f"not a gslam_tpu binary vocabulary: {path}")
    ver, k, L, dbytes = np.frombuffer(buf, np.uint32, 4, 8)
    if ver != _VOC_VERSION:
        raise ValueError(f"unsupported vocabulary version {ver}")
    k, L = int(k), int(L)
    n_nodes = _level_offset(k, L + 1)
    words = int(dbytes) // 4
    off = 8 + 16
    nd = np.frombuffer(buf, np.uint32, n_nodes * words, off) \
        .reshape(n_nodes, words)
    ww = np.frombuffer(buf, np.float32, k ** L, off + nd.nbytes)
    return Vocabulary(node_desc=jnp.asarray(nd),
                      word_weight=jnp.asarray(ww), k=k, L=L)


def save_dbow3_text(voc: Vocabulary, path: str) -> None:
    """DBoW3 text layout: first line 'k L scoring weighting', then one
    line per non-root node: 'parent_id is_leaf d0 d1 ... d31 weight'
    (descriptor bytes).  Written in our complete-tree node order."""
    nd = np.asarray(voc.node_desc)
    ww = np.asarray(voc.word_weight)
    k, L = voc.k, voc.L
    lines = [f"{k} {L} 0 0"]
    for l in range(1, L + 1):
        off = _level_offset(k, l)
        n = k ** l
        for i in range(n):
            parent = _level_offset(k, l - 1) + i // k if l > 1 else 0
            is_leaf = 1 if l == L else 0
            by = nd[off + i].view(np.uint8) if nd[off + i].flags.c_contiguous \
                else np.ascontiguousarray(nd[off + i]).view(np.uint8)
            w = ww[i] if l == L else 0.0
            lines.append(f"{parent} {is_leaf} "
                         + " ".join(str(int(b)) for b in by)
                         + f" {w}")
    with open(path, "w") as f:
        f.write("\n".join(lines))


_DBOW2_REC = np.dtype([("parent", "<i4"), ("desc", "u1", (32,)),
                       ("weight", "<f4"), ("leaf", "u1")])  # 41 bytes


def save_dbow2_binary(voc: Vocabulary, path: str) -> None:
    """Write the ORB-SLAM community binary vocabulary format (the
    ``saveToBinaryFile`` patch used to ship ORBvoc.bin): header
    [nb_nodes u32, size_node u32, k i32, L i32], then one 41-byte
    record per non-root node in node-id order: parent i32, 32
    descriptor bytes, weight f32, is_leaf u8.  Reference analog:
    ``GSLAM/core/Vocabulary.h`` binary save/load (DBoW2-compatible)."""
    nd = np.ascontiguousarray(np.asarray(voc.node_desc, np.uint32))
    ww = np.asarray(voc.word_weight, np.float32)
    n_nodes = nd.shape[0]
    rec = np.zeros(n_nodes - 1, _DBOW2_REC)
    if voc.children is not None:
        ch = np.asarray(voc.children)
        lw = np.asarray(voc.leaf_word)
        pid = np.repeat(np.arange(n_nodes, dtype=np.int32), ch.shape[1])
        cid = ch.ravel()
        parent = np.full(n_nodes, -1, np.int32)
        parent[cid[cid >= 0]] = pid[cid >= 0]
        rec["parent"] = parent[1:]
        rec["leaf"] = (lw[1:] >= 0).astype(np.uint8)
        rec["weight"] = np.where(lw[1:] >= 0, ww[lw[1:].clip(0)], 0.0)
    else:
        k, L = voc.k, voc.L
        for l in range(1, L + 1):
            off = _level_offset(voc.k, l)
            n = k ** l
            idx = np.arange(n)
            rec["parent"][off - 1 + idx] = \
                (_level_offset(k, l - 1) + idx // k) if l > 1 else 0
            rec["leaf"][off - 1 + idx] = 1 if l == L else 0
            if l == L:
                rec["weight"][off - 1 + idx] = ww[idx]
    rec["desc"] = nd[1:].view(np.uint8).reshape(n_nodes - 1, -1)
    with open(path, "wb") as f:
        np.asarray([n_nodes, _DBOW2_REC.itemsize], np.uint32).tofile(f)
        np.asarray([voc.k, voc.L], np.int32).tofile(f)
        rec.tofile(f)


def load_dbow2_binary(path: str) -> Vocabulary:
    """Load an ORB-SLAM-style binary vocabulary (see save_dbow2_binary).

    Handles pruned trees (clusters smaller than k become early leaves):
    the result carries an explicit ``children`` table and per-node
    ``leaf_word`` ids, and transform uses the general-tree descent.
    Word ids are assigned to leaves in node-id order, matching DBoW2's
    ``createWords``."""
    with open(path, "rb") as f:
        buf = f.read()
    n_nodes, size_node = np.frombuffer(buf, np.uint32, 2, 0)
    k, L = (int(x) for x in np.frombuffer(buf, np.int32, 2, 8))
    n_nodes = int(n_nodes)
    if int(size_node) != _DBOW2_REC.itemsize:
        raise ValueError(
            f"unsupported DBoW2 binary node size {int(size_node)} "
            f"(expected {_DBOW2_REC.itemsize}: ORB 32-byte descriptors)")
    rec = np.frombuffer(buf, _DBOW2_REC, n_nodes - 1, 16)
    desc_bytes = np.concatenate(
        [np.zeros((1, 32), np.uint8), rec["desc"]])
    nd = np.ascontiguousarray(desc_bytes).view(np.uint32)
    # vectorized child-table build (load speed is the reference
    # Vocabulary's headline): stable-sort nodes by parent, rank within
    # each parent group = child slot
    children = np.full((n_nodes, k), -1, np.int32)
    parents = rec["parent"].astype(np.int64)
    order = np.argsort(parents, kind="stable")
    p_sorted = parents[order]
    first = np.r_[True, p_sorted[1:] != p_sorted[:-1]]
    grp_start = np.maximum.accumulate(
        np.where(first, np.arange(len(p_sorted)), 0))
    rank = np.arange(len(p_sorted)) - grp_start
    if len(rank) and rank.max() >= k:
        raise ValueError("node with more than k children")
    children[p_sorted, rank] = order.astype(np.int32) + 1
    is_leaf = np.concatenate([[0], rec["leaf"]]).astype(bool)
    leaf_word = np.full(n_nodes, -1, np.int32)
    leaf_word[is_leaf] = np.arange(int(is_leaf.sum()), dtype=np.int32)
    ww = np.zeros(int(is_leaf.sum()), np.float32)
    ww[leaf_word[1:][is_leaf[1:]]] = rec["weight"][is_leaf[1:]]
    return Vocabulary(node_desc=jnp.asarray(nd),
                      word_weight=jnp.asarray(ww), k=k, L=L,
                      children=jnp.asarray(children),
                      leaf_word=jnp.asarray(leaf_word))


def load_dbow3_text(path: str) -> Vocabulary:
    """Parse the DBoW3 text format (complete-tree assumption: accepts
    vocabularies written by save_dbow3_text and standard DBoW3 dumps
    whose tree is complete)."""
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        n_nodes = _level_offset(k, L + 1)
        nd = np.zeros((n_nodes, DESC_WORDS), np.uint32)
        ww = np.zeros(k ** L, np.float32)
        idx = 1
        for line in f:
            parts = line.split()
            if len(parts) < 3:
                continue
            is_leaf = int(parts[1])
            by = np.asarray([int(x) for x in parts[2:2 + 32]], np.uint8)
            nd[idx] = by.view(np.uint32)
            if is_leaf:
                word = idx - _level_offset(k, L)
                ww[word] = float(parts[-1])
            idx += 1
    return Vocabulary(node_desc=jnp.asarray(nd),
                      word_weight=jnp.asarray(ww), k=k, L=L)
