"""Train a reference-scale 10^6-word vocabulary (k=10, L=6).

The reference's headline vocabulary artifact is the ORB-SLAM-style
10^6-word tree (SURVEY section 2 row 18, GSLAM/core/Vocabulary.h:
``Vocabulary::create`` with k=10, L=6 over ~10M ORB descriptors from
the training image corpus).  No image corpus exists in this
environment, so the corpus is 10M synthetic ORB-like descriptors:
cluster structure from 200k prototypes (a few descriptors per visual
"patch" identity, matching ORB statistics where one physical corner
yields a tight Hamming cluster across views) plus per-descriptor bit
noise.

Outputs (under artifacts/):
  voc_1m.npz        — native save_vocabulary format
  voc_1m.dbow2      — DBoW2/ORB-SLAM binary format round-trip artifact
  voc_1m_report.json — wall time per level + verification results

Run:  python scripts/train_vocab_1m.py [--n NDESC] [--L LEVELS]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/gslam_jax_cache")

import numpy as np


def make_corpus(n: int, n_protos: int, seed: int = 0) -> np.ndarray:
    """ORB-like corpus: prototype identities + ~6 bits of view noise."""
    rng = np.random.default_rng(seed)
    protos = rng.integers(0, 2 ** 32, (n_protos, 8),
                          dtype=np.uint64).astype(np.uint32)
    descs = protos[rng.integers(0, n_protos, n)]
    flat = descs.reshape(-1)
    for _ in range(6):
        w = rng.integers(0, 8, n)
        b = rng.integers(0, 32, n).astype(np.uint32)
        flat[np.arange(n, dtype=np.int64) * 8 + w] ^= (np.uint32(1) << b)
    return descs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--protos", type=int, default=200_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--L", type=int, default=6)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--out", default="artifacts")
    args = ap.parse_args()

    import jax

    # pin compute to the host CPU: the training passes are small
    # XOR+popcount kernels whose per-shape compile cost behind a
    # remote-execution tunnel (~30 s each) dwarfs their runtime; the
    # same code path compiles for TPU when a local chip is attached
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp

    from gslam_tpu.ops.vocab import (load_dbow2_binary, save_dbow2_binary,
                                     save_vocabulary, train_vocabulary,
                                     transform_words)

    os.makedirs(args.out, exist_ok=True)
    report = {"n_desc": args.n, "k": args.k, "L": args.L,
              "iters": args.iters, "host_cpus": os.cpu_count()}

    t0 = time.time()
    descs = make_corpus(args.n, args.protos)
    report["corpus_s"] = round(time.time() - t0, 1)
    print(f"[voc1m] corpus {args.n} descriptors in "
          f"{report['corpus_s']}s", flush=True)

    t0 = time.time()
    voc = train_vocabulary(descs, k=args.k, L=args.L, iters=args.iters)
    report["train_s"] = round(time.time() - t0, 1)
    report["n_words"] = int(voc.n_words)
    print(f"[voc1m] trained {voc.n_words} words in "
          f"{report['train_s']}s", flush=True)

    # discrimination: a corpus sample must spread over many words
    sample = jnp.asarray(descs[:20000])
    w = np.asarray(transform_words(voc, sample,
                                   jnp.ones(20000, bool)))
    report["distinct_words_20k_sample"] = int(len(set(w.tolist())))

    t0 = time.time()
    save_vocabulary(voc, os.path.join(args.out, "voc_1m.npz"))
    save_dbow2_binary(voc, os.path.join(args.out, "voc_1m.dbow2"))
    report["save_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    v2 = load_dbow2_binary(os.path.join(args.out, "voc_1m.dbow2"))
    report["load_s"] = round(time.time() - t0, 1)
    w2 = np.asarray(transform_words(v2, sample, jnp.ones(20000, bool)))
    report["dbow2_roundtrip_word_exact"] = bool((w == w2).all())

    with open(os.path.join(args.out, "voc_1m_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("[voc1m] DONE", json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
