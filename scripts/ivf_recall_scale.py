"""Serving-scale IVF recall + latency on ONE chip: real k-means build at ~5.9M x 384.

Builds a real IVF index (device spherical k-means, bf16 buckets) over 5,898,240
clustered vectors (8192 latent centers x unit noise — the same realistic embedding
geometry as scripts/ivf_sweep.py; uniform-random high-dim data has no cluster
structure for ANY ANN to exploit, see docs/benchmarks.md on HNSW), computes exact
top-10 ground truth by chunked MXU scan over the same data, then reports recall@10 +
slope-timed batch latency for an nprobe sweep.

Round 3: buckets carry 25% slack (S=640 vs avg fill 480) that boundary replication
(`build_ivf(spill="auto")`) fills with each boundary row's copy in its 2nd-best
cluster — the classic multi-assignment recall lever, zero extra HBM beyond the
slack. Target: recall@10 >= 0.95 at <= 3 ms/256-query batch (BASELINE.md
"recall@10 parity" at serving scale).

This upgrades docs/benchmarks.md's synthetic-bucket 10M timing row with a real-recall
measurement (BASELINE.md config 5's single-chip half; the sharded path divides the
same probe work across a mesh). Run on the real TPU: takes ~10-20 min wall through
the tunnel (k-means + host packing dominate).

    python scripts/ivf_recall_scale.py            # spilled config (default)
    WAX_IVF_SPILL=0 python scripts/ivf_recall_scale.py   # round-2 baseline config
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax

from wax_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from wax_tpu.index.ivf import build_ivf
from wax_tpu.ops.ivf_kernel import ivf_search_topk_pallas

# Usable HBM through the tunnel is ~12 GiB (probe-measured), and the build's peak
# residency is corpus (4.5 GiB) + bucket tensor; with S=640 the buckets are 6.0 GiB
# so the scatter peak stays ~10.6 GiB. The 25% slack (avg fill 480 of 640) is the
# spill budget for boundary replication.
SPILL = os.environ.get("WAX_IVF_SPILL", "auto")
# S=640 gives 25% bucket slack for spill (bucket size must be 128-aligned for the
# Pallas probe kernel). Build peak = corpus 4.5 GiB + buckets 6.04 GiB + a ~200 MB
# chunked-scatter gather; the small ids/bias uploads happen BEFORE the scatter so
# a fragmented arena cannot fail them (both round-3 OOM lessons).
C, S, D, B, K = 12288, (640 if SPILL != "0" else 512), 384, 256, 10
N = 12288 * 448  # 5,505,024 (>=5M target) — avg fill 448/bucket, 30% slack at S=640

T0 = time.perf_counter()


def mark(msg: str) -> None:
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


GEN_STEP = N // 12  # 491,520 rows per fill/score chunk


N_CENTERS = 8192


@functools.partial(jax.jit, donate_argnums=0)
def _fill_chunk(buf, centers, key, start):
    """Write one normalized clustered chunk into the donated corpus buffer — the full
    matrix is built in place (concatenating chunks would transiently triple HBM)."""
    ka, kn = jax.random.split(key)
    assign = jax.random.randint(ka, (GEN_STEP,), 0, N_CENTERS)
    v = centers[assign] + jax.random.normal(kn, (GEN_STEP, D), jnp.float32)
    v = (v / jnp.linalg.norm(v, axis=1, keepdims=True)).astype(jnp.bfloat16)
    return jax.lax.dynamic_update_slice_in_dim(buf, v, start, 0)


def main() -> None:
    n_steps = N // GEN_STEP
    keys = jax.random.split(jax.random.PRNGKey(7), n_steps + 2)
    centers = jax.random.normal(keys[-2], (N_CENTERS, D), jnp.float32) * 2.0
    vecs = jnp.zeros((N, D), jnp.bfloat16)
    for i in range(n_steps):
        vecs = _fill_chunk(vecs, centers, keys[i], jnp.int32(i * GEN_STEP))
    qk = keys[-1]
    ka, kn = jax.random.split(qk)
    q = centers[jax.random.randint(ka, (B,), 0, N_CENTERS)] + jax.random.normal(kn, (B, D), jnp.float32)
    q = jax.block_until_ready(q / jnp.linalg.norm(q, axis=1, keepdims=True))
    mark(f"data on device: {N} x {D} bf16 ({N*D*2/2**30:.1f} GiB)")

    # exact ground truth: chunked scan, f32 accumulation on the MXU
    @jax.jit
    def _chunk_topk(q, rows, base):
        s = jax.lax.dot_general(
            q, rows, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        v, i = jax.lax.top_k(s, K)
        return v, i + base

    vs, isx = [], []
    gt_chunk = GEN_STEP
    for s0 in range(0, N, gt_chunk):
        rows = jax.lax.dynamic_slice_in_dim(vecs, s0, min(gt_chunk, N - s0), 0)
        v, i = _chunk_topk(q, rows, s0)
        # serialize: each chunk's [B, chunk] f32 score intermediate is ~0.5 GB;
        # letting the async queue stack them up OOMs next to the 5.6 GB corpus.
        # (value fetch, not block_until_ready — the tunnel can return early)
        float(v[0, 0])
        vs.append(v)
        isx.append(i)
    allv = jnp.concatenate(vs, axis=1)
    alli = jnp.concatenate(isx, axis=1)
    _, pos = jax.lax.top_k(allv, K)
    gt = np.asarray(jnp.take_along_axis(alli, pos, axis=1))
    # free the [B, N] f32 ground-truth intermediates (~6 GiB) BEFORE the bucket
    # tensor is allocated — holding them through the build OOMs at S=640
    del vs, isx, allv, alli, pos
    mark("exact top-10 ground truth done")

    idx = build_ivf(
        vecs,
        np.arange(N, dtype=np.int64),
        n_clusters=C,
        bucket_size=S,
        iters=6,
        normalize=False,
        bucket_dtype=jnp.bfloat16,
        train_rows=2_097_152,  # bound the k-means training set (HBM: see build_ivf)
        spill=("auto" if SPILL != "0" else 0.0),
    )
    float(idx.emb[0, 0, 0])  # force the scatter chain to completion
    del vecs
    import gc

    gc.collect()  # drop the corpus buffer before any further device work
    ids_host = np.asarray(idx.ids)  # device->host read, no device allocation
    n_copies = int((ids_host >= 0).sum()) - N
    mark(
        f"IVF built: {C} clusters x {S} bf16 bucket slots ({C*S*D*2/2**30:.1f} GiB), "
        f"{n_copies} spill copies ({n_copies/N:.1%})"
    )

    def slope(nprobe, lo=10, hi=60):
        import functools

        @functools.partial(jax.jit, static_argnames=("nprobe",))
        def chained(q, iters, idx, nprobe):
            def body(i, carry):
                q, acc = carry
                v, _ = ivf_search_topk_pallas(q, idx, K, nprobe)
                return q + (v[:, :1] * 1e-9).astype(q.dtype), acc + v[0, 0]

            return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

        float(chained(q, 1, idx, nprobe))

        def t(iters):
            best = float("inf")
            for r in range(2):
                qq = q * (1.0 + 1e-6 * (iters + r))
                t0 = time.perf_counter()
                float(chained(qq, iters, idx, nprobe))
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(hi) - t(lo)) / (hi - lo) * 1e3

    for nprobe in (8, 16, 32):
        _, fids = ivf_search_topk_pallas(q, idx, K, nprobe)
        got = np.asarray(fids)
        recall = float(((gt[:, :, None] == got[:, None, :]).any(-1)).mean())
        ms = slope(nprobe)
        mark(
            f"N={N} nprobe={nprobe}: recall@10={recall:.3f}  "
            f"{ms:.2f} ms/batch ({B/ms*1e3:,.0f} q/s/chip)"
        )


if __name__ == "__main__":
    main()
