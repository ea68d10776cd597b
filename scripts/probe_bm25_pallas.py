"""Probe: Pallas candidate-set BM25 kernel vs scatter at the 1M bench shape.

Synthesizes the same Zipf CSR as scripts/hybrid_scale.py (N=1M, T=16K, budget 4096,
B=256 queries x 16 terms), runs correctness spot-checks vs the scatter scorer on a
small slice, then slope-times the pallas kernel.

    python scripts/probe_bm25_pallas.py [N] [BUDGET] [check|time|both]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wax_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import _make_timer, robust_slope
from wax_tpu.index.lex import LexIndex
from wax_tpu.ops.bm25 import bm25_topk
from wax_tpu.ops.bm25_candidates_pallas import bm25_candidates_topk_pallas
from wax_tpu.ops.topk import NEG_INF

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
WHAT = sys.argv[3] if len(sys.argv) > 3 else "both"
B, QT, T, K = 256, 16, 16384, 20


def make_index() -> LexIndex:
    rng = np.random.default_rng(5)
    raw_df = (1.0 / np.arange(1, T + 1)) ** 0.7
    df = np.minimum((raw_df / raw_df.sum() * 64 * N).astype(np.int64) + 1, BUDGET)
    offsets = np.zeros(T + 1, np.int64)
    offsets[1:] = np.cumsum(df)
    total = int(offsets[-1])
    print(f"{total/1e6:.1f}M postings", flush=True)
    from wax_tpu.index.lex import dma_window

    w2 = dma_window(BUDGET)
    p_cap = ((total + w2 + 1023) // 1024) * 1024
    doc_rows = np.zeros(p_cap, np.int32)
    wnorm = np.zeros(p_cap, np.float32)
    tfs = np.zeros(p_cap, np.float32)
    dl = rng.integers(16, 129, N).astype(np.float32)
    avgdl = float(dl.mean())
    for t in range(T):
        a, b = int(offsets[t]), int(offsets[t + 1])
        rows = np.sort(rng.choice(N, size=b - a, replace=False)) if b - a < N // 4 else np.sort(
            rng.permutation(N)[: b - a]
        )
        tf = rng.integers(1, 5, b - a).astype(np.float32)
        doc_rows[a:b] = rows
        tfs[a:b] = tf
        wnorm[a:b] = tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl[rows] / avgdl))
    from wax_tpu.index.lex import reverse_postings_copies

    rev_r, rev_w = reverse_postings_copies(doc_rows, wnorm, offsets)
    idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5)).astype(np.float32)
    n_cap = ((N + 127) // 128) * 128
    dlp = np.zeros(n_cap, np.float32)
    dlp[:N] = dl
    fid = np.full(n_cap, -1, np.int32)
    fid[:N] = np.arange(N, dtype=np.int32)
    act = np.zeros(n_cap, bool)
    act[:N] = True
    return LexIndex(
        doc_rows=jnp.asarray(doc_rows),
        tfs=jnp.asarray(tfs),
        offsets=jnp.asarray(offsets.astype(np.int32)),
        idf=jnp.asarray(idf),
        doc_len=jnp.asarray(dlp),
        frame_ids=jnp.asarray(fid),
        active=jnp.asarray(act),
        count=jnp.asarray(N, jnp.int32),
        avgdl=jnp.asarray(avgdl, jnp.float32),
        wnorm=jnp.asarray(wnorm),
        doc_rows_rev=jnp.asarray(rev_r),
        wnorm_rev=jnp.asarray(rev_w),
        max_df=int(((df.max() + 127) // 128) * 128),
    )


def main():
    idx = make_index()
    rng = np.random.default_rng(7)
    tids0 = jnp.asarray(rng.integers(0, T, (B, QT)).astype(np.int32))

    if WHAT in ("check", "both"):
        small = jnp.asarray(rng.integers(0, T, (8, QT)).astype(np.int32))
        for mode in ("any", "all"):
            sv, _, sf = bm25_topk(small, idx, K, mode=mode)
            cv, _, cf = bm25_candidates_topk_pallas(small, idx, K, mode=mode)
            sv, sf, cv, cf = map(np.asarray, (sv, sf, cv, cf))
            ok_scores = np.allclose(np.sort(cv, axis=1), np.sort(sv, axis=1), rtol=1e-4, atol=1e-5)
            ids_eq = (sf == cf).mean()
            print(f"check {mode}: scores allclose={ok_scores} id agreement={ids_eq:.4f}", flush=True)
            assert ok_scores

    if WHAT in ("time", "both"):
        @jax.jit
        def chained(q0, iters, tids, *arrs):
            names = ["doc_rows", "tfs", "offsets", "idf", "doc_len", "frame_ids",
                     "active", "count", "avgdl", "wnorm", "doc_rows_rev", "wnorm_rev"]
            ix = LexIndex(**dict(zip(names, arrs)), max_df=idx.max_df)

            def body(i, carry):
                qq, acc = carry
                t2 = (tids + jnp.int32(i)) % T
                v, _, f = bm25_candidates_topk_pallas(t2, ix, K, mode="any")
                return qq + v[:, :1] * 1e-9, acc + v[0, 0]

            return jax.lax.fori_loop(0, iters, body, (q0, jnp.float32(0)))[1]

        arrs = (idx.doc_rows, idx.tfs, idx.offsets, idx.idf, idx.doc_len,
                idx.frame_ids, idx.active, idx.count, idx.avgdl, idx.wnorm,
                idx.doc_rows_rev, idx.wnorm_rev)
        q0 = jnp.zeros((B, 1), jnp.float32)
        float(chained(q0, 1, tids0, *arrs))
        ms, info = robust_slope(
            _make_timer(chained, q0, tids0, *arrs), 3, 13, 23, floor_ms=0.05, cap_ms=4000.0
        )
        print(f"pallas candidates: {ms:.3f} ms/batch  attempts={info['attempts']}", flush=True)


if __name__ == "__main__":
    main()
