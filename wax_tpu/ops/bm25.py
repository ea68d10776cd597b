"""Device-side BM25 scoring over CSR postings.

TPU-first replacement for SQLite FTS5's bm25() ranking used by the reference
(reference: Sources/WaxTextSearch/FTS5SearchEngine.swift:129-161, :966): instead of a
B-tree walk per term, query terms gather fixed-budget slices of the concatenated
postings arrays and accumulate into a per-row score vector with one fused scatter-add —
all inside a single jitted function with static shapes (the postings budget W is the
snapshot's longest postings list, so the scan is exact, not truncated).

Semantics:
  * "all" mode mirrors FTS5's implicit-AND queries: only rows matching every distinct
    query term keep a score.
  * "any" mode mirrors the reference's OR-expanded fallback query
    (UnifiedSearch.swift:98-138).

Work per query batch: B x Q x W gathers + one scatter-add. For the 10K-doc headline
config this is microseconds; for sharded corpora each shard scores its own rows
(wax_tpu/parallel/sharded_scan.py). At 1M+ docs a common term can make W huge —
`LexIndexBuilder(postings_budget=...)` caps each term's list via impact-ordered
truncation (index/lex.py) so W stays bounded at a controlled, documented recall trade.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wax_tpu.index.lex import BM25_B, BM25_K1, LexIndex
from wax_tpu.ops.topk import masked_top_k

__all__ = ["bm25_scores", "bm25_topk", "MAX_QUERY_TERMS"]

# Static per-query term-budget QUANTUM: padded query widths are multiples of this so
# the jitted scorer compiles one variant per bucket, not one per query length. Scoring
# is EXACT up to MAX_QUERY_TERMS_HARD distinct terms (FTS5 parses arbitrarily long
# queries; the reference's preprocessing keeps a handful, but silently truncating at
# 16 broke AND-mode semantics for longer ones).
MAX_QUERY_TERMS = 16
# Beyond this, the rarest (highest-idf) head is kept — documented selection, not a
# silent clip; see pad_term_ids(dfs=...).
MAX_QUERY_TERMS_HARD = 128


def pad_term_ids(term_ids: list[int], max_terms: int | None = None, dfs=None):
    """Host helper: distinct term ids padded with -1 to a static bucket width.

    Args:
      term_ids: raw (possibly repeated) term ids in query order.
      max_terms: explicit static width; default = len bucketed up to the next
        multiple of MAX_QUERY_TERMS, capped at MAX_QUERY_TERMS_HARD.
      dfs: optional callable tid -> document frequency. When the distinct-term count
        exceeds the cap, the kept head is the LOWEST-df (highest-idf, most selective)
        terms, ties broken by query order — deterministic and documented, unlike a
        positional clip.
    """
    import numpy as np

    seen: list[int] = []
    for t in term_ids:
        if t not in seen:
            seen.append(t)
    cap = max_terms if max_terms is not None else MAX_QUERY_TERMS_HARD
    if len(seen) > cap:
        if dfs is not None:
            order = sorted(range(len(seen)), key=lambda i: (dfs(seen[i]), i))
            seen = [seen[i] for i in sorted(order[:cap])]
        else:
            seen = seen[:cap]
    if max_terms is None:
        max_terms = max(
            MAX_QUERY_TERMS, -(-len(seen) // MAX_QUERY_TERMS) * MAX_QUERY_TERMS
        )
    out = np.full(max_terms, -1, np.int32)
    out[: len(seen)] = seen
    return out


@functools.partial(jax.jit, static_argnames=("mode",))
def bm25_scores(term_ids: jax.Array, index: LexIndex, mode: str = "any") -> jax.Array:
    """BM25 scores for a batch of queries.

    Args:
      term_ids: [B, Q] int32 distinct term ids, -1 padded.
      index: LexIndex snapshot.
      mode: "any" (OR) or "all" (AND, FTS5-parity).

    Returns:
      [B, N_cap] float32 scores; non-matching / tombstoned / padded rows are 0.
    """
    if term_ids.ndim == 1:
        term_ids = term_ids[None, :]
    b, q = term_ids.shape
    w = index.max_df
    n_cap = index.doc_len.shape[0]

    valid_term = term_ids >= 0  # [B, Q]
    safe_tid = jnp.maximum(term_ids, 0)
    off = jnp.take(index.offsets, safe_tid)  # [B, Q]
    length = jnp.take(index.offsets, safe_tid + 1) - off  # [B, Q]

    j = jnp.arange(w, dtype=jnp.int32)[None, None, :]  # [1, 1, W]
    valid = valid_term[..., None] & (j < length[..., None])  # [B, Q, W]
    pos = off[..., None] + jnp.minimum(j, jnp.maximum(length[..., None] - 1, 0))
    rows = jnp.take(index.doc_rows, pos)  # [B, Q, W]
    tf = jnp.take(index.tfs, pos)  # [B, Q, W]
    dl = jnp.take(index.doc_len, rows)
    idf = jnp.take(index.idf, safe_tid)[..., None]  # [B, Q, 1]

    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / index.avgdl)
    contrib = idf * (tf * (BM25_K1 + 1.0)) / jnp.maximum(denom, 1e-9)
    contrib = jnp.where(valid, contrib, 0.0)

    flat_rows = rows.reshape(b, q * w)
    scores = jnp.zeros((b, n_cap), jnp.float32)
    scores = scores.at[jnp.arange(b)[:, None], flat_rows].add(
        contrib.reshape(b, q * w), mode="drop"
    )

    if mode == "all":
        hits = jnp.zeros((b, n_cap), jnp.float32)
        hits = hits.at[jnp.arange(b)[:, None], flat_rows].add(
            jnp.where(valid, 1.0, 0.0).reshape(b, q * w), mode="drop"
        )
        n_terms = jnp.sum(valid_term, axis=1, keepdims=True).astype(jnp.float32)
        scores = jnp.where(hits >= n_terms, scores, 0.0)

    live = index.active & (jnp.arange(n_cap, dtype=jnp.int32) < index.count)
    return jnp.where(live[None, :], scores, 0.0)


def bm25_topk(term_ids: jax.Array, index: LexIndex, k: int, mode: str = "any"):
    """BM25 top-k: returns (scores [B,k], rows [B,k], frame_ids [B,k]).

    Rows with score 0 (no match) are excluded (index/frame id -1).
    """
    k = int(min(k, index.frame_ids.shape[0]))  # clamp like flat_scan_topk: k > capacity is fine
    scores = bm25_scores(term_ids, index, mode=mode)
    vals, rows = masked_top_k(scores, k, mask=scores > 0.0)
    safe = jnp.maximum(rows, 0)
    fids = jnp.where(rows >= 0, jnp.take(index.frame_ids, safe), -1).astype(jnp.int32)
    return vals, rows, fids
