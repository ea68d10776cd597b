"""Exact forward-index BM25 rescore of a candidate set.

The postings budget (impact-ordered truncation, index/lex.py) bounds the candidate
kernel's DMA window, but multi-term scores of docs outside a term's impact head are
underestimated — measured at 1M docs (scripts/budget_recall.py) that costs real
recall@10 vs the unbudgeted oracle. The fix mirrors the dense lane's
retrieve-then-rescore shape: budgeted postings drive candidate GENERATION only, and
the final scores come from an exact rescore of the top-F candidates against the
doc-major forward index — each doc's own COMPLETE term list, which no postings
budget ever truncates.

Device shape: [B, F] candidate rows gather [F, L_pad] forward slices (one
contiguous row per candidate — no scatter, no [B, N] plane), then an unrolled
compare-accumulate over the Q query terms. All shapes static; works inside
shard_map on local rows.

(reference: SQLite FTS5 scores all postings exactly —
Sources/WaxTextSearch/FTS5SearchEngine.swift:966; this pass restores that
exactness on top of the budgeted TPU candidate path.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from wax_tpu.ops.topk import NEG_INF

__all__ = ["exact_rescore", "rescore_topk"]


def exact_rescore(term_ids, cand_rows, fwd_tids, fwd_wnorm, idf):
    """Exact BM25 scores + matched-term counts for candidate rows.

    Args:
      term_ids: [B, Q] i32 query term ids, -1 padding. Duplicate ids contribute
        once per slot (same semantics as ops/bm25.py and the candidate kernel).
      cand_rows: [B, F] i32 candidate doc rows, -1 dead.
      fwd_tids: [N_cap, L] i32 per-doc unique term ids, -1 padding.
      fwd_wnorm: [N_cap, L] f32 per-(doc, term) exact tf/length weight
        (0 on padding and tombstoned rows).
      idf: [T] f32 per-term idf.

    Returns:
      (scores [B, F] f32, counts [B, F] i32) — exact BM25 score and number of
      matched query-term slots per candidate; 0 on dead candidates.
    """
    b, q = term_ids.shape
    safe_rows = jnp.maximum(cand_rows, 0)
    ft = jnp.take(fwd_tids, safe_rows, axis=0)  # [B, F, L]
    fw = jnp.take(fwd_wnorm, safe_rows, axis=0)  # [B, F, L]
    live_slot = (ft >= 0) & (fw > 0.0)
    scores = jnp.zeros(cand_rows.shape, jnp.float32)
    counts = jnp.zeros(cand_rows.shape, jnp.int32)
    # unrolled loop over the (static, small) Q axis: [B, F, L] compare + masked
    # reduce per term — never materializes a [B, F, L, Q] intermediate
    for qi in range(q):
        tid = term_ids[:, qi]  # [B]
        valid = tid >= 0
        tid_safe = jnp.maximum(tid, 0)
        m = live_slot & (ft == tid_safe[:, None, None]) & valid[:, None, None]
        w = jnp.sum(jnp.where(m, fw, 0.0), axis=-1)  # [B, F]
        hit = jnp.any(m, axis=-1)
        scores = scores + w * jnp.take(idf, tid_safe)[:, None]
        counts = counts + hit.astype(jnp.int32)
    dead = cand_rows < 0
    return jnp.where(dead, 0.0, scores), jnp.where(dead, 0, counts)


def rescore_topk(term_ids, cand_rows, fwd_tids, fwd_wnorm, idf, k: int, mode: str):
    """Top-k over exactly-rescored candidates, lowest-row tie-breaks.

    Candidates are sorted by row first so `lax.top_k`'s first-occurrence tie rule
    lands on the lowest doc row (the engine's determinism contract). Returns
    (vals [B, k], rows [B, k]) with NEG_INF / -1 on dead slots.
    """
    big = jnp.int32(2**30)
    rows_sorted = jnp.sort(jnp.where(cand_rows < 0, big, cand_rows), axis=-1)
    rows_sorted = jnp.where(rows_sorted >= big, -1, rows_sorted)
    scores, counts = exact_rescore(term_ids, rows_sorted, fwd_tids, fwd_wnorm, idf)
    live = (rows_sorted >= 0) & (scores > 0.0)
    if mode == "all":
        nterm = jnp.sum(term_ids >= 0, axis=1, keepdims=True).astype(jnp.int32)
        live = live & (counts >= nterm)
    masked = jnp.where(live, scores, NEG_INF)
    k = min(int(k), cand_rows.shape[-1])
    vals, pos = jax.lax.top_k(masked, k)
    sel = jnp.take_along_axis(rows_sorted, pos, axis=-1)
    ok = vals > NEG_INF * 0.5
    return vals, jnp.where(ok, sel, -1)
