"""Candidate-set BM25: gather-free, scatter-free top-k over sorted postings.

The scatter BM25 lane (ops/bm25.py) materializes a [B, N] score plane and feeds it
16.7M random scatter-adds — measured ~1.9 s/256-query batch at 1M docs on v5e
(scripts/probe_bm25_candidates.py; XLA TPU scatter is element-serial, and its
random gathers cost ~10 ns/element). This module replaces the whole lane with a
TPU-native pipeline over the CSR structure itself:

  1. Each query term's postings slice is CONTIGUOUS in HBM (rows sorted, tf-
     normalized weight precomputed at snapshot time) — streamed, not gathered.
  2. The Q sorted slices merge into one row-sorted candidate list via a bitonic
     merge tree: log2(Q) levels of vectorized compare-exchange stages, no sort
     network over the full width (a general 65536-sort is 136 stages; merging
     pre-sorted runs needs only ~58).
  3. Duplicate rows (a doc matching several terms) are segment-summed with
     log2(2Q) Hillis-Steele passes guarded by row equality; the run's last
     element carries the total (AND mode additionally requires the run length to
     equal the query's term count — FTS5 implicit-AND parity).
  4. lax.top_k over the masked [B, Q*W] leader scores (1.2 ms at [256, 65536]).

The same merge/segment code runs in two harnesses: pure XLA on HBM arrays (the
reference path, exact but bandwidth-bound) and inside a Pallas kernel where the
candidate buffer lives in VMEM for the whole pipeline (ops/bm25_candidates_pallas).

Semantics match ops/bm25.py bm25_topk exactly: same contributions (FTS5's clamped
idf upstream), same AND masking, lowest-index tie-breaks via the stable merge.
(reference engine being replaced: Sources/WaxTextSearch/FTS5SearchEngine.swift:129-161.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wax_tpu.index.lex import LexIndex
from wax_tpu.ops.topk import NEG_INF

__all__ = [
    "bm25_candidates_topk",
    "candidate_scores_sorted",
    "merge_sorted_runs",
    "segment_sum_sorted",
]

# sentinel row for padding: sorts after every real row id
_SENTINEL = jnp.int32(2**30)


def _cmp_exchange(rows, vals, cnts, d: int):
    """One bitonic compare-exchange stage at distance d over the last axis.

    rows: [..., L] i32 keys; vals/cnts move with their key.
    """
    shape = rows.shape
    l = shape[-1]
    nb = l // (2 * d)
    r = rows.reshape(shape[:-1] + (nb, 2, d))
    v = vals.reshape(shape[:-1] + (nb, 2, d))
    c = cnts.reshape(shape[:-1] + (nb, 2, d))
    r0, r1 = r[..., 0, :], r[..., 1, :]
    sel = r0 <= r1  # stable: ties keep the earlier (first-run) element low
    rlo = jnp.where(sel, r0, r1)
    rhi = jnp.where(sel, r1, r0)
    vlo = jnp.where(sel, v[..., 0, :], v[..., 1, :])
    vhi = jnp.where(sel, v[..., 1, :], v[..., 0, :])
    clo = jnp.where(sel, c[..., 0, :], c[..., 1, :])
    chi = jnp.where(sel, c[..., 1, :], c[..., 0, :])
    rows = jnp.stack([rlo, rhi], axis=-2).reshape(shape)
    vals = jnp.stack([vlo, vhi], axis=-2).reshape(shape)
    cnts = jnp.stack([clo, chi], axis=-2).reshape(shape)
    return rows, vals, cnts


def merge_sorted_runs(rows, vals, cnts, run_len: int):
    """Merge adjacent pairs of sorted runs of length `run_len` along the last axis.

    Classic bitonic merge: reverse every second run (making each pair a bitonic
    sequence), then compare-exchange at distances run_len, run_len/2, ..., 1.
    Stability across equal keys: ties resolve to the first run's element first,
    preserving (term-index, position) order for deterministic f32 summation.
    """
    shape = rows.shape
    l = shape[-1]
    npairs = l // (2 * run_len)

    def rev2(x):
        x = x.reshape(shape[:-1] + (npairs, 2, run_len))
        x = jnp.concatenate([x[..., 0:1, :], jnp.flip(x[..., 1:2, :], axis=-1)], axis=-2)
        return x.reshape(shape)

    rows, vals, cnts = rev2(rows), rev2(vals), rev2(cnts)
    d = run_len
    while d >= 1:
        rows, vals, cnts = _cmp_exchange(rows, vals, cnts, d)
        d //= 2
    return rows, vals, cnts


def segment_sum_sorted(rows, vals, cnts, max_run: int):
    """Hillis-Steele segmented sum over a row-sorted candidate list.

    After ceil(log2(max_run)) doubling passes, the LAST element of each equal-row
    run holds the run's value sum and its member count. Returns (leader_mask,
    summed_vals, summed_cnts) where leader_mask marks run-last elements.
    """
    d = 1
    while d < max_run:
        shifted_r = jnp.roll(rows, d, axis=-1)
        shifted_v = jnp.roll(vals, d, axis=-1)
        shifted_c = jnp.roll(cnts, d, axis=-1)
        idx = jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
        ok = (idx >= d) & (shifted_r == rows)
        vals = vals + jnp.where(ok, shifted_v, 0.0)
        cnts = cnts + jnp.where(ok, shifted_c, 0)
        d *= 2
    nxt = jnp.roll(rows, -1, axis=-1)
    idx = jax.lax.broadcasted_iota(jnp.int32, rows.shape, rows.ndim - 1)
    leader = (rows != nxt) | (idx == rows.shape[-1] - 1)
    return leader, vals, cnts


def candidate_scores_sorted(term_ids, doc_rows, wnorm, offsets, idf, w: int, mode: str):
    """[B, Q] term ids -> row-sorted (rows, scores) candidate lists [B, Q*W].

    Pure-XLA reference harness of the candidate pipeline (the Pallas kernel runs
    the same merge/segment code on VMEM-resident buffers).
    """
    if term_ids.ndim == 1:
        term_ids = term_ids[None, :]
    b, q = term_ids.shape
    qp = 1
    while qp < q:
        qp *= 2
    wp = 1
    while wp < w:
        wp *= 2

    valid_term = term_ids >= 0
    safe = jnp.maximum(term_ids, 0)
    off = jnp.take(offsets, safe)
    length = jnp.take(offsets, safe + 1) - off
    j = jnp.arange(wp, dtype=jnp.int32)[None, None, :]
    valid = valid_term[..., None] & (j < length[..., None])
    pos = off[..., None] + jnp.minimum(j, jnp.maximum(length[..., None] - 1, 0))
    rows = jnp.where(valid, jnp.take(doc_rows, pos), _SENTINEL)
    contrib = jnp.where(valid, jnp.take(idf, safe)[..., None] * jnp.take(wnorm, pos), 0.0)
    if qp > q:
        rows = jnp.pad(rows, ((0, 0), (0, qp - q), (0, 0)), constant_values=_SENTINEL)
        contrib = jnp.pad(contrib, ((0, 0), (0, qp - q), (0, 0)))
    cnts = jnp.where(rows < _SENTINEL, 1, 0).astype(jnp.int32)

    rows = rows.reshape(b, qp * wp)
    contrib = contrib.reshape(b, qp * wp)
    cnts = cnts.reshape(b, qp * wp)
    run = wp
    while run < qp * wp:
        rows, contrib, cnts = merge_sorted_runs(rows, contrib, cnts, run)
        run *= 2
    leader, summed, counts = segment_sum_sorted(rows, contrib, cnts, 2 * qp)
    live = leader & (rows < _SENTINEL) & (summed > 0.0)
    if mode == "all":
        n_terms = jnp.sum(valid_term, axis=1, keepdims=True)
        live = live & (counts >= n_terms)
    score_out = summed
    if mode == "count":
        # AND-rescore candidate ranking: count dominates, score tie-breaks
        # (same 4096 boost as the Pallas kernel — see bm25_candidates_pallas)
        score_out = summed + 4096.0 * counts.astype(jnp.float32)
    scores = jnp.where(live, score_out, NEG_INF)
    return rows, scores


def wide_topk(scores, k: int, exact: bool = True):
    """top_k over a WIDE candidate plane via two narrow passes, exact plane-order
    tie-breaks (drop-in for lax.top_k over a row-sorted candidate plane).

    XLA's top_k over the [B, Q*W] candidate plane is the dominant cost of the
    candidate pipeline at serving scale (49K-wide at 1M x budget 3072 — measured
    ~5 ms of the 10.2 ms BM25 lane). Stage 1 reshapes to [B, 128, S] and takes
    the per-lane top-L over the slice axis; stage 2 lexsorts the L*128 survivors
    by (-score, plane position), which restores EXACT lowest-position selection
    and order on tied scores: a tie dropped in stage 1 (beyond L in its lane)
    always has a higher plane position than every kept tie in that lane, so the
    k lowest positions of any tie class survive.

    exact=True (default): L = min(S, k) — one lane can contribute at most k of
    the top-k, so the result is EXACTLY lax.top_k's (the no-rescore candidate
    paths keep their bit-parity contract with the scatter lane). exact=False:
    L = ceil(k/128)+2 — only rescore candidate FETCHES use this: a handful of
    BORDERLINE candidates (expected ~7 of k=256 at full lane load) can be
    displaced by lane collisions, trading a ~0.1% recall-ceiling sliver for
    half the stage-1 cost; the final scores come from the exact forward-index
    rescore either way.

    Returns (vals, pos) with pos indexing the original last axis, like lax.top_k.
    """
    b, w = scores.shape
    if k > w:
        # the candidate plane is narrower than the request (deep k over a
        # small-df vocab): fill the impossible tail with dead slots (NEG_INF,
        # pos 0) so callers keep their [B, k] contract — the scatter lane they
        # replaced accepted any k <= N. Dead slots are masked downstream.
        vals, pos = wide_topk(scores, w, exact=exact)
        return (
            jnp.pad(vals, ((0, 0), (0, k - w)), constant_values=NEG_INF),
            jnp.pad(pos, ((0, 0), (0, k - w))),
        )
    if w <= max(1024, 8 * k) or w % 128:
        return jax.lax.top_k(scores, k)
    s = w // 128
    lvl = min(s, k if exact else -(-k // 128) + 2)
    t = scores.reshape(b, s, 128).swapaxes(1, 2)  # [B, 128, S]
    tv, ti = jax.lax.top_k(t, lvl)  # per-lane top-L; ties keep the lowest slice
    gpos = ti * 128 + jnp.arange(128, dtype=jnp.int32)[None, :, None]
    cv = tv.swapaxes(1, 2).reshape(b, lvl * 128)
    gp = gpos.swapaxes(1, 2).reshape(b, lvl * 128)
    order = jnp.lexsort((gp, -cv), axis=-1)[:, :k]
    return jnp.take_along_axis(cv, order, axis=-1), jnp.take_along_axis(gp, order, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "mode", "w"))
def _candidates_topk_impl(term_ids, doc_rows, wnorm, offsets, idf, frame_ids, k: int, mode: str, w: int):
    rows, scores = candidate_scores_sorted(term_ids, doc_rows, wnorm, offsets, idf, w, mode)
    vals, pos = wide_topk(scores, k)
    sel = jnp.take_along_axis(rows, pos, axis=-1)
    ok = vals > NEG_INF * 0.5
    sel = jnp.where(ok, sel, 0)
    fids = jnp.where(ok, jnp.take(frame_ids, sel), -1).astype(jnp.int32)
    out_rows = jnp.where(ok, sel, -1)
    # dead-slot convention matches masked_top_k: NEG_INF value, -1 ids
    return vals, out_rows, fids


def bm25_candidates_topk(term_ids, index: LexIndex, k: int, mode: str = "any",
                         fetch: int | None = None):
    """Candidate-set BM25 top-k — same contract as ops/bm25.py bm25_topk.

    Requires the snapshot to carry per-posting normalized weights (`index.wnorm`).
    When the snapshot carries a forward index (budget truncation active), the
    top-`fetch` OR-mode candidates are exactly rescored against it — same
    retrieve-then-rescore contract as the Pallas entry. Returns
    (scores [B, k], rows [B, k], frame_ids [B, k]); non-matches are (0.0, -1, -1).
    """
    if index.wnorm is None:
        raise ValueError("snapshot has no precomputed wnorm; rebuild with a current LexIndexBuilder")
    k = int(min(k, index.frame_ids.shape[0]))
    if index.fwd_tids is None:
        return _candidates_topk_impl(
            term_ids,
            index.doc_rows,
            index.wnorm,
            index.offsets,
            index.idf,
            index.frame_ids,
            k,
            mode,
            int(index.max_df),
        )
    from wax_tpu.ops.bm25_rescore import rescore_topk

    if term_ids.ndim == 1:
        term_ids = term_ids[None, :]
    rows, scores = candidate_scores_sorted(
        term_ids, index.doc_rows, index.wnorm, index.offsets, index.idf,
        int(index.max_df), "count" if mode == "all" else "any",
    )
    f = int(min(fetch if fetch is not None else max(4 * k, 256), scores.shape[-1]))
    cvals, cpos = wide_topk(scores, f, exact=False)
    crows = jnp.where(cvals > NEG_INF * 0.5, jnp.take_along_axis(rows, cpos, axis=-1), -1)
    vals, sel = rescore_topk(
        term_ids, crows, index.fwd_tids, index.fwd_wnorm, index.idf, k, mode,
        fwd_width=index.fwd_width, fwd_fused=index.fwd_fused,
    )
    ok = vals > NEG_INF * 0.5
    sel = jnp.where(ok, sel, 0)
    fids = jnp.where(ok, jnp.take(index.frame_ids, sel), -1).astype(jnp.int32)
    return vals, jnp.where(ok, sel, -1), fids
