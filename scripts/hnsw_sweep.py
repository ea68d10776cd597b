"""BASELINE config 3: 100K x 384 HNSW (M=16) efSearch sweep vs flat-scan ground truth.

Reports recall@10 and per-batch latency for the TPU beam search vs the fused flat
scan. Run on the real chip: PYTHONPATH=... python scripts/hnsw_sweep.py [n]
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from wax_tpu.index.graph_cpp import best_hnsw_builder
from wax_tpu.index.dense import DenseIndexBuilder
from wax_tpu.ops.beam_search import hnsw_search
from wax_tpu.ops.flat_scan import flat_scan_topk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
D, B, K = 384, 256, 10

rng = np.random.default_rng(0)
vecs = rng.standard_normal((N, D)).astype(np.float32)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
queries = rng.standard_normal((B, D)).astype(np.float32)
queries /= np.linalg.norm(queries, axis=1, keepdims=True)
q = jnp.asarray(queries)

t0 = time.perf_counter()
builder = best_hnsw_builder(D, m=16, ef_construction=100)
builder.add_batch(np.arange(N), vecs)
print(f"build {N}x{D}: {time.perf_counter()-t0:.1f}s ({type(builder).__name__})", flush=True)
graph = builder.snapshot()

dense = DenseIndexBuilder(dim=D)
dense.add_batch(np.arange(N), vecs)
idx = dense.snapshot()

# ground truth + flat baseline latency
gt_vals, _, gt_fids = flat_scan_topk(q, idx, K, backend="pallas")
gt = np.asarray(gt_fids)


def timed(fn, reps=5):
    float(jnp.sum(fn()))  # warm + sync
    t0 = time.perf_counter()
    for _ in range(reps):
        float(jnp.sum(fn()))
    return (time.perf_counter() - t0) / reps


flat_ms = timed(lambda: flat_scan_topk(q, idx, K, backend="pallas")[0]) * 1e3
print(f"flat scan: {flat_ms:.2f} ms/batch (includes dispatch overhead)", flush=True)

for ef in (16, 32, 64, 128, 256):
    vals, fids = hnsw_search(q, graph, k=K, ef=ef)
    f = np.asarray(fids)
    recall = np.mean([len(set(f[i].tolist()) & set(gt[i].tolist())) / K for i in range(B)])
    ms = timed(lambda ef=ef: hnsw_search(q, graph, k=K, ef=ef)[0]) * 1e3
    print(f"ef={ef:>4}: recall@10={recall:.4f}  {ms:.2f} ms/batch", flush=True)
