import time, numpy as np, jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])
import jax.numpy as jnp
import gslam_tpu.ops.vocab as V

# monkeypatch timing into train_vocabulary phases via a copy
rng = np.random.default_rng(1)
n_protos, N = 2000, 250_000
protos = rng.integers(0, 2**32, (n_protos, 8), dtype=np.uint64).astype(np.uint32)
descs = protos[rng.integers(0, n_protos, N)]

k, L, iters, seed = 10, 4, 6, 0
rng = np.random.default_rng(seed)
packed_np = np.ascontiguousarray(descs)
Nn, W = packed_np.shape
B = W * 32
t0 = time.time(); bits = V._unpack_bits_np(packed_np); print('unpack', round(time.time()-t0,1), flush=True)
packed = jnp.asarray(packed_np)
gid = np.zeros(Nn, np.int64)
chunk = 1 << 17

def assign_all(centres_packed, gid_np):
    cj = jnp.asarray(centres_packed)
    out = np.empty(Nn, np.int32)
    for s in range(0, Nn, chunk):
        e = min(Nn, s + chunk); pad = chunk - (e - s)
        pc = packed[s:e]; gc = jnp.asarray(gid_np[s:e].astype(np.int32))
        if pad:
            pc = jnp.pad(pc, ((0, pad), (0, 0))); gc = jnp.pad(gc, (0, pad))
        out[s:e] = np.asarray(V._assign_chunk(pc, gc, cj, k))[:e - s]
    return out

for l in range(L):
    tl = time.time()
    G = k ** l
    order = np.argsort(gid, kind='stable')
    bounds = np.searchsorted(gid[order], np.arange(G + 1))
    centres = np.zeros((G * k, W), np.uint32)
    d_min = np.full(Nn, np.iinfo(np.int32).max, np.int64)
    sog = np.zeros((G, W), np.uint32)
    ts = time.time()
    for j in range(k):
        for g in range(G):
            lo, hi = bounds[g], bounds[g + 1]
            if hi <= lo:
                centres[g*k+j] = rng.integers(0, 2**32, W, dtype=np.uint64).astype(np.uint32); continue
            sl = order[lo:hi]
            if j == 0:
                pick = sl[rng.integers(hi - lo)]
            else:
                wts = d_min[sl].astype(np.float64) + 1e-3
                pick = sl[rng.choice(hi - lo, p=wts / wts.sum())]
            centres[g*k+j] = packed_np[pick]; sog[g] = packed_np[pick]
        if j < k - 1 and Nn:
            d = np.asarray(V._dist_to_seed(packed, jnp.asarray(sog[gid])))
            d_min = np.minimum(d_min, d)
    print('level', l, 'seed', round(time.time()-ts,1), flush=True)
    ta = tb = 0.0
    for _ in range(iters):
        t1 = time.time(); child = assign_all(centres, gid); ta += time.time()-t1
        t1 = time.time()
        cid = gid * k + child
        o2 = np.argsort(cid, kind='stable')
        seg = np.searchsorted(cid[o2], np.arange(G * k + 1))
        sizes = seg[1:] - seg[:-1]
        sums = np.zeros((G * k, B), np.int64)
        bo = bits[o2]
        for c0 in range(0, B, 64):
            blk = np.vstack([bo[:, c0:c0+64], np.zeros((1,64), np.uint8)]).astype(np.int32)
            sums[:, c0:c0+64] = np.add.reduceat(blk, seg[:-1], axis=0)
        sums = np.where((sizes > 0)[:, None], sums, 0)
        maj = (sums * 2 >= sizes[:, None]).astype(np.uint8)
        centres = np.where((sizes > 0)[:, None], V._pack_bits_np(maj), centres)
        tb += time.time()-t1
    gid = gid * k + child
    print('level', l, 'assign', round(ta,1), 'update', round(tb,1), 'total', round(time.time()-tl,1), flush=True)
