import time, numpy as np, jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])
import jax.numpy as jnp
from gslam_tpu.ops.vocab import train_vocabulary, transform_words, transform_sparse, score_l1_sparse

rng = np.random.default_rng(1)
n_protos, N = 5000, 1_000_000
protos = rng.integers(0, 2**32, (n_protos, 8), dtype=np.uint64).astype(np.uint32)
descs = protos[rng.integers(0, n_protos, N)]
for _ in range(6):
    w = rng.integers(0, 8, N); b = rng.integers(0, 32, N).astype(np.uint32)
    flat = descs.reshape(-1)
    flat[np.arange(N) * 8 + w] ^= (np.uint32(1) << b)
t0 = time.time()
voc = train_vocabulary(descs, k=10, L=4, seed=0, iters=6)
dt = time.time() - t0
print('1M desc -> k=10 L=4 (%d words) in %.1f s' % (voc.n_words, dt), flush=True)
w = np.asarray(transform_words(voc, jnp.asarray(descs[:5000]), jnp.ones(5000, bool)))
print('distinct words in 5k sample:', len(set(w.tolist())), 'of', voc.n_words, flush=True)
# DBoW2 binary round trip at this scale
from gslam_tpu.ops.vocab import save_dbow2_binary, load_dbow2_binary
import os
save_dbow2_binary(voc, '/tmp/voc10k.bin')
v2 = load_dbow2_binary('/tmp/voc10k.bin')
w2 = np.asarray(transform_words(v2, jnp.asarray(descs[:5000]), jnp.ones(5000, bool)))
print('dbow2 roundtrip words equal:', bool((w == w2).all()),
      'file MB:', round(os.path.getsize('/tmp/voc10k.bin')/1e6, 1), flush=True)
