"""Probe: candidate-set BM25 combine strategies on the real TPU.

Measures, at the hybrid@1M bench shape (B=256 queries, Q=16 terms, W=4096 postings
budget -> 65536 candidates/query, N=1M rows):

  scatter   — the current [B, N] scatter-add BM25 lane (baseline share of hybrid)
  sort3     — lax.sort over [B, Q*W] (row key + contrib + hit payloads), the full
              candidate pipeline: sort -> run segment-sum via cumsum/cummax -> top-k
  sortk     — key-only sort (payload overhead isolation)
  nosort    — the candidate pipeline minus the sort (gather/mask/cumsum/top-k floor)

Decides whether the candidate-set BM25 kernel can be pure XLA (sort-based) or needs
a Pallas merge-tree kernel. Run: python scripts/probe_bm25_candidates.py
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

N = 1_048_576
B, Q, W, K = 256, 16, 4096, 20
T = 16384
K1, Bb = 1.2, 0.75
NEG = jnp.float32(-3.0e38)


def make_index():
    rng = np.random.default_rng(5)
    raw_df = (1.0 / np.arange(1, T + 1)) ** 0.7
    df = np.minimum((raw_df / raw_df.sum() * 64 * N).astype(np.int64) + 1, W)
    offsets = np.zeros(T + 1, np.int64)
    offsets[1:] = np.cumsum(df)
    total = int(offsets[-1])
    doc_rows = np.sort(
        rng.integers(0, N, total).astype(np.int32)
        .reshape(-1)
    )
    # per-term sorted rows: sort within each term slice
    for t in range(T):
        a, b = offsets[t], offsets[t + 1]
        doc_rows[a:b] = np.sort(rng.integers(0, N, b - a).astype(np.int32))
    tfs = rng.integers(1, 5, total).astype(np.float32)
    idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5)).astype(np.float32)
    tids0 = rng.integers(0, T, (B, Q)).astype(np.int32)
    return (
        jnp.asarray(doc_rows),
        jnp.asarray(tfs),
        jnp.asarray(offsets.astype(np.int32)),
        jnp.asarray(idf),
        jnp.asarray(tids0),
    )


def gather_candidates(tids, doc_rows, tfs, offsets, idf, doc_len, avgdl):
    valid_term = tids >= 0
    safe = jnp.maximum(tids, 0)
    off = jnp.take(offsets, safe)
    length = jnp.take(offsets, safe + 1) - off
    j = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    valid = valid_term[..., None] & (j < length[..., None])
    pos = off[..., None] + jnp.minimum(j, jnp.maximum(length[..., None] - 1, 0))
    rows = jnp.take(doc_rows, pos)
    tf = jnp.take(tfs, pos)
    dl = jnp.take(doc_len, rows)
    idf_q = jnp.take(idf, safe)[..., None]
    denom = tf + K1 * (1.0 - Bb + Bb * dl / avgdl)
    contrib = jnp.where(valid, idf_q * (tf * (K1 + 1.0)) / jnp.maximum(denom, 1e-9), 0.0)
    return rows, contrib, valid


def candidates_sort_topk(tids, doc_rows, tfs, offsets, idf, doc_len, avgdl, do_sort=True, keys_only=False):
    b, q = tids.shape
    rows, contrib, valid = gather_candidates(tids, doc_rows, tfs, offsets, idf, doc_len, avgdl)
    rows_f = jnp.where(valid, rows, jnp.int32(2**30)).reshape(b, q * W)
    con_f = contrib.reshape(b, q * W)
    one_f = jnp.where(valid, 1.0, 0.0).reshape(b, q * W)
    if do_sort:
        if keys_only:
            (rows_s,) = jax.lax.sort((rows_f,), dimension=1, num_keys=1)
            con_s, one_s = con_f, one_f
        else:
            rows_s, con_s, one_s = jax.lax.sort(
                (rows_f, con_f, one_f), dimension=1, num_keys=1
            )
    else:
        rows_s, con_s, one_s = rows_f, con_f, one_f
    cs = jnp.cumsum(con_s, axis=1)
    start = jnp.concatenate(
        [jnp.ones_like(rows_s[:, :1], bool), rows_s[:, 1:] != rows_s[:, :-1]], axis=1
    )
    is_end = jnp.concatenate(
        [rows_s[:, 1:] != rows_s[:, :-1], jnp.ones_like(rows_s[:, :1], bool)], axis=1
    )
    base = jax.lax.cummax(jnp.where(start, cs - con_s, NEG), axis=1)
    seg = cs - base
    score = jnp.where(is_end & (rows_s < 2**30), seg, NEG)
    vals, pos = jax.lax.top_k(score, K)
    rows_k = jnp.take_along_axis(rows_s, pos, axis=1)
    return vals, rows_k


def scatter_topk(tids, doc_rows, tfs, offsets, idf, doc_len, avgdl):
    b, q = tids.shape
    rows, contrib, valid = gather_candidates(tids, doc_rows, tfs, offsets, idf, doc_len, avgdl)
    flat_rows = rows.reshape(b, q * W)
    scores = jnp.zeros((b, N), jnp.float32)
    scores = scores.at[jnp.arange(b)[:, None], flat_rows].add(
        contrib.reshape(b, q * W), mode="drop"
    )
    vals, rows_k = jax.lax.top_k(jnp.where(scores > 0, scores, NEG), K)
    return vals, rows_k


def run(name, fn, tids0, args, floor, cap):
    import sys
    @jax.jit
    def chained(q0, iters, tids, *rest):
        def body(i, carry):
            qq, acc = carry
            # perturb term ids deterministically so no layer replays results
            t2 = jnp.where(tids >= 0, (tids + jnp.int32(acc) % 3) % T, tids)
            v, _ = fn(t2, *rest)
            return qq + v[:, :1] * 1e-9, acc + v[0, 0]

        return jax.lax.fori_loop(0, iters, body, (q0, jnp.float32(0)))[1]

    q0 = jnp.zeros((B, 1), jnp.float32)
    float(chained(q0, 1, tids0, *args))
    try:
        ms, info = robust_slope(
            _make_timer(chained, q0, tids0, *args), 3, 13, 23, floor_ms=floor, cap_ms=cap
        )
        print(f"{name:10s}: {ms:8.3f} ms/batch  attempts={info['attempts']}", flush=True)
        return ms
    except Exception as e:
        print(f"{name:10s}: FAIL {e}", flush=True)
        return None


def main():
    import sys
    doc_rows, tfs, offsets, idf, tids0 = make_index()
    doc_len = jnp.full((N,), 64.0, jnp.float32)
    avgdl = jnp.float32(64.0)
    args = (doc_rows, tfs, offsets, idf, doc_len, avgdl)
    import functools

    which = set(sys.argv[1:]) or {"nosort", "sort3"}
    if "nosort" in which:
        run("nosort", functools.partial(candidates_sort_topk, do_sort=False), tids0, args, 0.05, 3000.0)
    if "sortk" in which:
        run("sortk", functools.partial(candidates_sort_topk, keys_only=True), tids0, args, 0.05, 3000.0)
    if "sort3" in which:
        run("sort3", candidates_sort_topk, tids0, args, 0.05, 3000.0)
    if "scatter" in which:
        run("scatter", scatter_topk, tids0, args, 0.05, 3000.0)


if __name__ == "__main__":
    main()
