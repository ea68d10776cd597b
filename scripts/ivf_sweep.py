"""IVF at scale (BASELINE config 4 counterpart): build + nprobe sweep vs flat scan.

Usage: PYTHONPATH=... python scripts/ivf_sweep.py [N] [D]
Data generated on device; clustered (realistic embedding geometry).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from wax_tpu.index.dense import DenseIndexBuilder
from wax_tpu.index.ivf import build_ivf, ivf_search_topk
from wax_tpu.ops.flat_scan import flat_scan_topk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
D = int(sys.argv[2]) if len(sys.argv) > 2 else 768
B, K, NCLUSTERS = 256, 10, 4096


@jax.jit
def make_data():
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    centers = jax.random.normal(k1, (2000, D), jnp.float32) * 2.0
    assign = jax.random.randint(k2, (N,), 0, 2000)
    vecs = centers[assign] + jax.random.normal(k3, (N, D), jnp.float32)
    vecs = vecs / jnp.linalg.norm(vecs, axis=1, keepdims=True)
    qa = jax.random.randint(k4, (B,), 0, 2000)
    q = centers[qa] + jax.random.normal(k1, (B, D), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    return vecs, q


vecs_dev, q = jax.block_until_ready(make_data())
print(f"data ready: {N}x{D}", flush=True)

t0 = time.perf_counter()
idx = build_ivf(vecs_dev, np.arange(N), n_clusters=NCLUSTERS, iters=6)
jax.block_until_ready(idx.emb)
print(f"ivf build ({NCLUSTERS} clusters): {time.perf_counter()-t0:.1f}s "
      f"bucket={idx.bucket_size}", flush=True)

# device-resident dense snapshot for ground truth (no host round trip)
from wax_tpu.index.dense import DenseIndex

cap = ((N + 511) // 512) * 512
emb_pad = jnp.pad(vecs_dev, ((0, cap - N), (0, 0)))
dsnap = DenseIndex(
    emb=emb_pad,
    frame_ids=jnp.pad(jnp.arange(N, dtype=jnp.int32), (0, cap - N), constant_values=-1),
    active=jnp.pad(jnp.ones(N, bool), (0, cap - N)),
    count=jnp.asarray(N, jnp.int32),
)

_, _, gt_fids = flat_scan_topk(q, dsnap, K, backend="pallas")
gt = np.asarray(gt_fids)
print("ground truth done", flush=True)


def timed(fn, reps=3):
    float(jnp.sum(fn()[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(jnp.sum(fn()[0]))
    return (time.perf_counter() - t0) / reps * 1e3


flat_ms = timed(lambda: flat_scan_topk(q, dsnap, K, backend="pallas")[:1])
print(f"flat scan: {flat_ms:.2f} ms/batch (incl. ~40ms dispatch)", flush=True)

for nprobe in (4, 8, 16, 32, 64):
    vals, fids = ivf_search_topk(q, idx, k=K, nprobe=nprobe)
    f = np.asarray(fids)
    rec = np.mean([len(set(f[i].tolist()) & set(gt[i].tolist())) / K for i in range(B)])
    ms = timed(lambda p=nprobe: ivf_search_topk(q, idx, k=K, nprobe=p))
    print(f"nprobe={nprobe:>3}: recall@10={rec:.4f}  {ms:.2f} ms/batch", flush=True)
