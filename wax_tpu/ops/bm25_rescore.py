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

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wax_tpu.ops.topk import NEG_INF

__all__ = ["exact_rescore", "exact_rescore_fused", "rescore_topk"]


def exact_rescore(term_ids, cand_rows, fwd_tids, fwd_wnorm, idf, fwd_width: int = 0):
    """Exact BM25 scores + matched-term counts for candidate rows.

    Args:
      term_ids: [B, Q] i32 query term ids, -1 padding. Duplicate ids contribute
        once per slot (same semantics as ops/bm25.py and the candidate kernel).
      cand_rows: [B, F] i32 candidate doc rows, -1 dead.
      fwd_tids: [N_cap, L] i32 per-doc unique term ids, -1 padding.
      fwd_wnorm: [N_cap, L] f32 per-(doc, term) exact tf/length weight
        (0 on padding and tombstoned rows).
      idf: [T] f32 per-term idf.
      fwd_width: static real (pre-padding) forward width, 0 = unknown. When the
        real width fits half a 128-lane row, two candidates pack per row —
        halves the gather, DMA, and compare-accumulate volume.

    Returns:
      (scores [B, F] f32, counts [B, F] i32) — exact BM25 score and number of
      matched query-term slots per candidate; 0 on dead candidates.
    """
    b, q = term_ids.shape
    f = cand_rows.shape[1]
    l = fwd_tids.shape[1]
    safe_rows = jnp.maximum(cand_rows, 0)
    valid_q = term_ids >= 0
    idf_q = jnp.where(valid_q, jnp.take(idf, jnp.maximum(term_ids, 0)), 0.0)  # [B, Q]
    tids_q = jnp.where(valid_q, term_ids, -1)
    pack2 = 0 < fwd_width <= 64 and l >= 128 and f % 2 == 0
    if pack2:
        # [B, F, 64] gathered halves -> [B*F/2, 128] packed rows; both halves of
        # a packed row belong to the SAME query, so the per-row query planes are
        # unchanged. The kernel reduces each half separately.
        ft = jnp.take(fwd_tids[:, :64], safe_rows, axis=0).reshape(b * f // 2, 128)
        fw = jnp.take(fwd_wnorm[:, :64], safe_rows, axis=0).reshape(b * f // 2, 128)
        rows_n = b * f // 2
    else:
        ft = jnp.take(fwd_tids, safe_rows, axis=0).reshape(b * f, l)  # [B*F, L]
        fw = jnp.take(fwd_wnorm, safe_rows, axis=0).reshape(b * f, l)
        rows_n = b * f
    # per-candidate-row query planes (broadcast, not gather)
    per_b = rows_n // b
    tids_rows = jnp.broadcast_to(tids_q[:, None, :], (b, per_b, q)).reshape(rows_n, q)
    idf_rows = jnp.broadcast_to(idf_q[:, None, :], (b, per_b, q)).reshape(rows_n, q)
    scores, counts = _rescore_blocks(
        ft, fw, tids_rows, idf_rows,
        jax.default_backend() == "cpu", halves=2 if pack2 else 1,
    )
    scores = scores.reshape(b, f)
    counts = counts.reshape(b, f)
    dead = cand_rows < 0
    return jnp.where(dead, 0.0, scores), jnp.where(dead, 0, counts)


def _rescore_kernel(ft_ref, fw_ref, tid_ref, idf_ref, score_ref, count_ref,
                    *, q: int, halves: int = 1):
    """Per-block exact rescore: the [R, L] forward slices stream through VMEM ONCE
    and the Q-term compare-accumulate runs register-resident (the XLA formulations
    re-read the 100+ MB gathered plane per term or materialize [B,F,L,Q] —
    measured 3.0-3.5 ms at [256, 256, 128] x Q=16 either way).

    halves=2: each 128-lane row carries TWO candidates (lanes [0,64) and
    [64,128)); lane 0 of the output row gets the low half's total, lane 1 the
    high half's."""
    ft = ft_ref[:]  # [R, L]
    fw = fw_ref[:]
    live = (ft >= 0) & (fw > 0.0)
    score = jnp.zeros(ft.shape[:1] + (128,), jnp.float32)
    count = jnp.zeros(ft.shape[:1] + (128,), jnp.int32)
    n_slices = ft.shape[1] // 128
    for qi in range(q):
        tid = tid_ref[:, qi][:, None]  # [R, 1]
        idfv = idf_ref[:, qi][:, None]
        m = live & (ft == tid) & (tid >= 0)
        hitw = jnp.where(m, fw, 0.0)
        hitc = m.astype(jnp.int32)
        # reduce over L via static 128-lane slices (no lane-splitting reshape)
        wsum = hitw[:, :128]
        csum = hitc[:, :128]
        for si in range(1, n_slices):
            wsum = wsum + hitw[:, si * 128 : (si + 1) * 128]
            csum = csum + hitc[:, si * 128 : (si + 1) * 128]
        score = score + wsum * idfv
        count = count + csum
    if halves == 2:
        lane = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
        lo = lane < 64
        s_lo = jnp.sum(jnp.where(lo, score, 0.0), axis=1, keepdims=True)
        s_hi = jnp.sum(jnp.where(lo, 0.0, score), axis=1, keepdims=True)
        c_lo = jnp.sum(jnp.where(lo, count, 0), axis=1, keepdims=True)
        c_hi = jnp.sum(jnp.where(lo, 0, count), axis=1, keepdims=True)
        score_ref[:] = jnp.where(lane == 0, s_lo, jnp.where(lane == 1, s_hi, 0.0))
        count_ref[:] = jnp.where(lane == 0, c_lo, jnp.where(lane == 1, c_hi, 0))
        return
    score_ref[:] = jnp.sum(score, axis=1, keepdims=True) * jnp.ones((1, 128), jnp.float32)
    count_ref[:] = jnp.sum(count, axis=1, keepdims=True) * jnp.ones((1, 128), jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret", "halves"))
def _rescore_blocks(ft, fw, tids_rows, idf_rows, interpret: bool, halves: int = 1):
    """[N_rows, L] forward slices + per-row query data -> (scores, counts).

    halves=1: one candidate per row -> [N_rows] outputs.
    halves=2: two candidates per row (lane halves) -> [2*N_rows] outputs in
    candidate order (row r holds candidates 2r and 2r+1)."""
    n, l = ft.shape
    l_pad = max(128, ((l + 127) // 128) * 128)
    if l_pad != l:
        ft = jnp.pad(ft, ((0, 0), (0, l_pad - l)), constant_values=-1)
        fw = jnp.pad(fw, ((0, 0), (0, l_pad - l)))
        l = l_pad
    q = tids_rows.shape[1]
    rows = max(8, min(512, 65536 // max(l, 128)))
    n_pad = ((n + rows - 1) // rows) * rows
    if n_pad != n:
        ft = jnp.pad(ft, ((0, n_pad - n), (0, 0)), constant_values=-1)
        fw = jnp.pad(fw, ((0, n_pad - n), (0, 0)))
        tids_rows = jnp.pad(tids_rows, ((0, n_pad - n), (0, 0)), constant_values=-1)
        idf_rows = jnp.pad(idf_rows, ((0, n_pad - n), (0, 0)))
    qp = ((q + 127) // 128) * 128
    if qp != q:
        tids_rows = jnp.pad(tids_rows, ((0, 0), (0, qp - q)), constant_values=-1)
        idf_rows = jnp.pad(idf_rows, ((0, 0), (0, qp - q)))
    grid = n_pad // rows
    kernel = functools.partial(_rescore_kernel, q=q, halves=halves)
    score, count = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * l * q,
            bytes_accessed=n_pad * (2 * l + 2 * qp + 2) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ft, fw, tids_rows, idf_rows)
    if halves == 2:
        s2 = jnp.stack([score[:n, 0], score[:n, 1]], axis=-1).reshape(-1)
        c2 = jnp.stack([count[:n, 0], count[:n, 1]], axis=-1).reshape(-1)
        return s2, c2
    return score[:n, 0], count[:n, 0]


def exact_rescore_fused(term_ids, cand_rows, fwd_fused, idf):
    """Exact rescore against the FUSED forward index — one gather, not two.

    fwd_fused: [N_cap, 2*L2] i32 — lanes [0, L2) hold the doc's unique term ids
    (-1 pad), lanes [L2, 2*L2) the matching per-(doc, term) weights as f32 bit
    patterns (index/lex.py fuse_forward). The XLA row gather dominates the
    rescore (measured 1.35 ms of a 2.34 ms rescore at [256, 256] candidates —
    per-ROW bound, not per-byte), so fusing tids+weights into one array halves
    the dominant term. Same results as exact_rescore (differentially tested).
    """
    b, q = term_ids.shape
    f = cand_rows.shape[1]
    w = fwd_fused.shape[1]
    safe_rows = jnp.maximum(cand_rows, 0)
    fz = jnp.take(fwd_fused, safe_rows, axis=0).reshape(b * f, w)
    valid_q = term_ids >= 0
    idf_q = jnp.where(valid_q, jnp.take(idf, jnp.maximum(term_ids, 0)), 0.0)
    tids_q = jnp.where(valid_q, term_ids, -1)
    tids_rows = jnp.broadcast_to(tids_q[:, None, :], (b, f, q)).reshape(b * f, q)
    idf_rows = jnp.broadcast_to(idf_q[:, None, :], (b, f, q)).reshape(b * f, q)
    scores, counts = _rescore_fused_blocks(
        fz, tids_rows, idf_rows, jax.default_backend() == "cpu"
    )
    scores = scores.reshape(b, f)
    counts = counts.reshape(b, f)
    dead = cand_rows < 0
    return jnp.where(dead, 0.0, scores), jnp.where(dead, 0, counts)


def _rescore_fused_kernel(fz_ref, tid_ref, idf_ref, score_ref, count_ref, *, q: int):
    """Fused-plane rescore: lanes [0, L2) are tids, [L2, 2*L2) weight bits; a
    lane roll by L2 aligns each tid with its weight."""
    fz = fz_ref[:]  # [R, 2*L2] i32
    w = fz.shape[1]
    l2 = w // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, fz.shape, 1)
    tid_zone = lane < l2
    wb = jnp.roll(fz, -l2, axis=1)  # lane i <- weight bits of tid lane i
    fw = jax.lax.bitcast_convert_type(wb, jnp.float32)
    live = tid_zone & (fz >= 0)
    score = jnp.zeros(fz.shape[:1] + (128,), jnp.float32)
    count = jnp.zeros(fz.shape[:1] + (128,), jnp.int32)
    n_slices = w // 128
    for qi in range(q):
        tid = tid_ref[:, qi][:, None]
        idfv = idf_ref[:, qi][:, None]
        m = live & (fz == tid) & (tid >= 0)
        hitw = jnp.where(m, fw, 0.0)
        hitc = m.astype(jnp.int32)
        wsum = hitw[:, :128]
        csum = hitc[:, :128]
        for si in range(1, n_slices):
            wsum = wsum + hitw[:, si * 128 : (si + 1) * 128]
            csum = csum + hitc[:, si * 128 : (si + 1) * 128]
        score = score + wsum * idfv
        count = count + csum
    score_ref[:] = jnp.sum(score, axis=1, keepdims=True) * jnp.ones((1, 128), jnp.float32)
    count_ref[:] = jnp.sum(count, axis=1, keepdims=True) * jnp.ones((1, 128), jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _rescore_fused_blocks(fz, tids_rows, idf_rows, interpret: bool):
    """[N_rows, 2*L2] fused slices + per-row query data -> (scores, counts)."""
    n, w = fz.shape
    q = tids_rows.shape[1]
    rows = max(8, min(512, 65536 // max(w, 128)))
    n_pad = ((n + rows - 1) // rows) * rows
    if n_pad != n:
        fz = jnp.pad(fz, ((0, n_pad - n), (0, 0)), constant_values=-1)
        tids_rows = jnp.pad(tids_rows, ((0, n_pad - n), (0, 0)), constant_values=-1)
        idf_rows = jnp.pad(idf_rows, ((0, n_pad - n), (0, 0)))
    qp = ((q + 127) // 128) * 128
    if qp != q:
        tids_rows = jnp.pad(tids_rows, ((0, 0), (0, qp - q)), constant_values=-1)
        idf_rows = jnp.pad(idf_rows, ((0, 0), (0, qp - q)))
    grid = n_pad // rows
    kernel = functools.partial(_rescore_fused_kernel, q=q)
    score, count = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, qp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 128), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * w * q,
            bytes_accessed=n_pad * (w + 2 * qp + 2) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(fz, tids_rows, idf_rows)
    return score[:n, 0], count[:n, 0]


def rescore_topk(term_ids, cand_rows, fwd_tids, fwd_wnorm, idf, k: int, mode: str,
                 fwd_width: int = 0, fwd_fused=None):
    """Top-k over exactly-rescored candidates, lowest-row tie-breaks.

    Candidates are sorted by row first so `lax.top_k`'s first-occurrence tie rule
    lands on the lowest doc row (the engine's determinism contract). Returns
    (vals [B, k], rows [B, k]) with NEG_INF / -1 on dead slots.
    """
    big = jnp.int32(2**30)
    rows_sorted = jnp.sort(jnp.where(cand_rows < 0, big, cand_rows), axis=-1)
    rows_sorted = jnp.where(rows_sorted >= big, -1, rows_sorted)
    if fwd_fused is not None:
        scores, counts = exact_rescore_fused(term_ids, rows_sorted, fwd_fused, idf)
    else:
        scores, counts = exact_rescore(term_ids, rows_sorted, fwd_tids, fwd_wnorm, idf,
                                       fwd_width=fwd_width)
    live = (rows_sorted >= 0) & (scores > 0.0)
    if mode == "all":
        nterm = jnp.sum(term_ids >= 0, axis=1, keepdims=True).astype(jnp.int32)
        live = live & (counts >= nterm)
    masked = jnp.where(live, scores, NEG_INF)
    kk = min(int(k), cand_rows.shape[-1])
    vals, pos = jax.lax.top_k(masked, kk)
    sel = jnp.take_along_axis(rows_sorted, pos, axis=-1)
    ok = vals > NEG_INF * 0.5
    sel = jnp.where(ok, sel, -1)
    if kk < k:
        # candidate window narrower than the request: pad dead slots to keep
        # the [B, k] contract (the scatter lane accepted any k <= N)
        vals = jnp.pad(vals, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        sel = jnp.pad(sel, ((0, 0), (0, k - kk)), constant_values=-1)
    return vals, sel
