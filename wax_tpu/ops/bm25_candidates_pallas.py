"""Pallas candidate-set BM25 kernel: VMEM-resident merge of sorted postings.

The pure-XLA candidate pipeline (ops/bm25_candidates.py) is exact but pays HBM
round-trips for every one of its ~58 merge stages (and XLA's general sort costs
22 ms at [256, 65536]). This kernel keeps each query's whole candidate buffer in
VMEM for the full pipeline:

  grid cell = one query:
    1. Q async copies stream the query terms' CONTIGUOUS postings slices
       (rows + precomputed tf-normalized weights) into VMEM — no gathers. HBM
       postings are laid out [P/1024, 8, 128] (i32/f32 tile = (8, 128), so the
       outermost axis takes arbitrary dynamic slice offsets); each DMA window
       starts at the enclosing 1024-aligned boundary and a per-term `delta`
       masks the unaligned head. Leading out-of-slice elements mask to -1 and
       trailing ones to +SENTINEL so every run stays ascending-sorted.
    2. Bitonic merge tree over the Q sorted W-length runs, operating on a
       [L/128, 128] layout: stages with distance >= 128 are sublane-block
       compare-exchanges (pure reshapes), stages < 128 are lane rolls — a
       compare-exchange never crosses a 128-lane row at those distances.
       Pallas TPU has no `rev` lowering, so odd runs are physically reversed
       once (log-depth half-swaps) and every merge level then runs flip-free
       with alternating directions.
    3. Hillis-Steele segmented sum + count over equal-row runs (a doc matching
       several terms), leader masking, optional AND-mode count filter.
    4. Leader scores + rows written back; lax.top_k on the XLA side.

Semantics are identical to ops/bm25.py bm25_topk (same contributions, AND/OR,
score>0 liveness); parity is asserted in tests/test_bm25_candidates.py. On CPU the
kernel runs in interpret mode.

(reference being replaced: SQLite FTS5 bm25 ranking,
Sources/WaxTextSearch/FTS5SearchEngine.swift:129-161.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wax_tpu.index.lex import LexIndex, dma_window
from wax_tpu.ops.topk import NEG_INF

__all__ = ["bm25_candidates_topk_pallas", "candidate_scores_pallas"]

_SENT = 2**30  # python int: jnp constants capture as tracers inside pallas kernels
_LANES = 128
_ALIGN = 1024  # i32/f32 HBM tile: windows anchor at this flat alignment


def _desc_mask(shape, run_len: int):
    """True where the element belongs to an odd OUTPUT run of size 2*run_len —
    those runs merge DESCENDING so the next level's inputs are bitonic without
    any physical reversal (the classic alternating-direction bitonic network)."""
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, shape, 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    )
    return (flat // (2 * run_len)) % 2 == 1


def _stage_rows(rows, con, d_rows: int, desc):
    """Compare-exchange at flat distance d = d_rows*128 (sublane-block view)."""
    r = rows.shape[0]
    nb = r // (2 * d_rows)
    rv = rows.reshape(nb, 2, d_rows, _LANES)
    cv = con.reshape(nb, 2, d_rows, _LANES)
    dv = desc.reshape(nb, 2, d_rows, _LANES)[:, 0]
    r0, r1 = rv[:, 0], rv[:, 1]
    c0, c1 = cv[:, 0], cv[:, 1]
    sel = (r0 <= r1) ^ dv
    rlo = jnp.where(sel, r0, r1)
    rhi = jnp.where(sel, r1, r0)
    clo = jnp.where(sel, c0, c1)
    chi = jnp.where(sel, c1, c0)
    rows = jnp.concatenate([rlo[:, None], rhi[:, None]], axis=1).reshape(r, _LANES)
    con = jnp.concatenate([clo[:, None], chi[:, None]], axis=1).reshape(r, _LANES)
    return rows, con


def _stage_lanes(rows, con, d: int, desc):
    """Compare-exchange at flat distance d < 128 via lane rolls (a 2d block never
    crosses a 128-lane row, so the roll's cyclic wrap is never selected)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    is_lo = (lane // d) % 2 == 0
    pr = jnp.where(is_lo, jnp.roll(rows, -d, axis=1), jnp.roll(rows, d, axis=1))
    pc = jnp.where(is_lo, jnp.roll(con, -d, axis=1), jnp.roll(con, d, axis=1))
    # pair = (first, second) in index order; self is first iff is_lo
    first_r = jnp.where(is_lo, rows, pr)
    second_r = jnp.where(is_lo, pr, rows)
    first_c = jnp.where(is_lo, con, pc)
    second_c = jnp.where(is_lo, pc, con)
    sle = (first_r <= second_r) ^ desc
    lo_r = jnp.where(sle, first_r, second_r)
    hi_r = jnp.where(sle, second_r, first_r)
    lo_c = jnp.where(sle, first_c, second_c)
    hi_c = jnp.where(sle, second_c, first_c)
    return jnp.where(is_lo, lo_r, hi_r), jnp.where(is_lo, lo_c, hi_c)


def _swap_halves(rows, con, s: int, active):
    """Swap the two halves of every flat block of size s where `active` (roll-based;
    one stage of the log-depth block reversal)."""
    half = s // 2
    if half >= _LANES:
        hr = half // _LANES

        def sw(x):
            up = jnp.roll(x, hr, axis=0)
            dn = jnp.roll(x, -hr, axis=0)
            second = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) // hr) % 2 == 1
            return jnp.where(second, up, dn)
    else:

        def sw(x):
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            second = (lane // half) % 2 == 1
            return jnp.where(second, jnp.roll(x, half, axis=1), jnp.roll(x, -half, axis=1))

    return jnp.where(active, sw(rows), rows), jnp.where(active, sw(con), con)


def _reverse_odd_runs(rows, con, run_len: int):
    """Physically reverse every odd-indexed run of flat length run_len, via
    log2(run_len) half-swap stages (the once-per-kernel setup that lets every
    merge level run flip-free with alternating directions)."""
    flat_run = _desc_mask(rows.shape, run_len // 2)  # odd runs of size run_len
    s = run_len
    while s >= 2:
        rows, con = _swap_halves(rows, con, s, flat_run)
        s //= 2
    return rows, con


def merge_rows_lanes(rows, con, run_len: int):
    """Bitonic-merge adjacent runs of flat length run_len (>=128) whose directions
    alternate (even run ascending, odd descending). Output runs of 2*run_len again
    alternate, with the final full-width run ascending."""
    desc = _desc_mask(rows.shape, run_len)
    d = run_len
    while d >= _LANES:
        rows, con = _stage_rows(rows, con, d // _LANES, desc)
        d //= 2
    while d >= 1:
        rows, con = _stage_lanes(rows, con, d, desc)
        d //= 2
    return rows, con


def _roll_flat(x, d: int):
    """Roll the flat [R*128] view forward by d (toward higher indices), d < 128.

    flat[i] <- flat[i-d]: lanes shift by d; the first d lanes of each row take the
    PREVIOUS row's last d lanes (sublane roll by 1 for the wrapped part)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    same_row = jnp.roll(x, d, axis=1)  # lane c <- c-d (wraps within the row)
    prev_row = jnp.roll(same_row, 1, axis=0)  # wrapped lanes need row r-1
    return jnp.where(lane >= d, same_row, prev_row)


def segment_passes(rows, con, cnt, max_run_log2: int):
    """Hillis-Steele segmented sum/count; run-last element carries totals."""
    total = rows.shape[0] * _LANES
    flat_idx = (
        jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    )
    d = 1
    for _ in range(max_run_log2):
        if d < _LANES:
            sr, sv, sc = _roll_flat(rows, d), _roll_flat(con, d), _roll_flat(cnt, d)
        else:
            dr = d // _LANES
            sr = jnp.roll(rows, dr, axis=0)
            sv = jnp.roll(con, dr, axis=0)
            sc = jnp.roll(cnt, dr, axis=0)
        ok = (flat_idx >= d) & (sr == rows)
        con = con + jnp.where(ok, sv, 0.0)
        cnt = cnt + jnp.where(ok, sc, 0)
        d *= 2
    # leader = last element of its run
    nr = _roll_flat_back(rows)
    leader = (rows != nr) | (flat_idx == total - 1)
    return leader, con, cnt


def _roll_flat_back(x):
    """flat[i] <- flat[i+1] (next element; last element gets flat[0], masked)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    same_row = jnp.roll(x, -1, axis=1)
    next_row = jnp.roll(same_row, -1, axis=0)
    return jnp.where(lane < _LANES - 1, same_row, next_row)


def _kernel(
    win_ref,  # [B, Q2] i32 scalar-prefetch: 1024-aligned window block starts
    dlt_ref,  # [B, Q2] i32: postings-slice offset within the window [0, ALIGN)
    lens_ref,  # [B, Q2] i32
    idfs_ref,  # [B, Q2] f32
    nterm_ref,  # [B, 1] i32 (valid term count, for AND)
    rows_hbm,  # [P/1024, 8, 128] i32
    wn_hbm,  # [P/1024, 8, 128] f32
    out_rows_ref,
    out_score_ref,
    rows_vmem,  # [Q2, W2/1024, 8, 128]
    wn_vmem,
    sems,
    *,
    q2: int,
    w2: int,
    mode: str,
):
    b = pl.program_id(0)
    w_rows = w2 // _LANES
    w_blks = w2 // _ALIGN

    # stream all Q windows (one contiguous DMA each)
    for qi in range(q2):
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(win_ref[b, qi], w_blks)], rows_vmem.at[qi], sems.at[qi, 0]
        ).start()
        pltpu.make_async_copy(
            wn_hbm.at[pl.ds(win_ref[b, qi], w_blks)], wn_vmem.at[qi], sems.at[qi, 1]
        ).start()
    for qi in range(q2):
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(win_ref[b, qi], w_blks)], rows_vmem.at[qi], sems.at[qi, 0]
        ).wait()
        pltpu.make_async_copy(
            wn_hbm.at[pl.ds(win_ref[b, qi], w_blks)], wn_vmem.at[qi], sems.at[qi, 1]
        ).wait()

    # [Q2, W2/1024, 8, 128] -> [Q2 * W2/128, 128] flat row-major candidate buffer
    rows = rows_vmem[:, :, :, :].reshape(q2 * w_rows, _LANES)
    wn = wn_vmem[:, :, :, :].reshape(q2 * w_rows, _LANES)
    flat_in_win = (
        jax.lax.broadcasted_iota(jnp.int32, (q2, w_rows, _LANES), 1) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (q2, w_rows, _LANES), 2)
    ).reshape(q2 * w_rows, _LANES)
    term_of = jax.lax.broadcasted_iota(jnp.int32, (q2, w_rows, _LANES), 0).reshape(
        q2 * w_rows, _LANES
    )
    # per-element delta/length/idf: q2 is a python int, select by comparison chain
    idfv = jnp.zeros_like(wn)
    lenv = jnp.zeros_like(rows)
    dltv = jnp.zeros_like(rows)
    for qi in range(q2):
        m = term_of == qi
        lenv = jnp.where(m, lens_ref[b, qi], lenv)
        dltv = jnp.where(m, dlt_ref[b, qi], dltv)
        idfv = jnp.where(m, idfs_ref[b, qi], idfv)
    valid = (flat_in_win >= dltv) & (flat_in_win < dltv + lenv)
    # leading out-of-slice elements sort BEFORE real rows (-1), trailing after
    # (SENT): each run stays ascending-sorted for the bitonic merge
    rows = jnp.where(valid, rows, jnp.where(flat_in_win < dltv, -1, _SENT))
    con = jnp.where(valid, idfv * wn, 0.0)

    rows, con = _reverse_odd_runs(rows, con, w2)
    run = w2
    while run < q2 * w2:
        rows, con = merge_rows_lanes(rows, con, run)
        run *= 2

    cnt = jnp.where(valid_sorted_mask(rows), 1, 0)
    # runs can reach 2*q2 only with duplicate query terms; q2 rounds up anyway
    log2 = 1
    while (1 << log2) < 2 * q2:
        log2 += 1
    leader, summed, counts = segment_passes(rows, con, cnt, log2)

    live = leader & (rows >= 0) & (rows < _SENT) & (summed > 0.0)
    if mode == "all":
        live = live & (counts >= nterm_ref[b, 0])
    out_rows_ref[0] = jnp.where(live, rows, -1)
    out_score_ref[0] = jnp.where(live, summed, NEG_INF)


def valid_sorted_mask(rows):
    """Post-merge liveness: real doc rows are in [0, SENT)."""
    return (rows >= 0) & (rows < _SENT)


@functools.partial(jax.jit, static_argnames=("q2", "w2", "mode", "interpret"))
def _run(win, dlt, lens, idfs, nterm, doc_rows, wnorm, q2: int, w2: int, mode: str, interpret: bool):
    b = win.shape[0]
    w_rows = w2 // _LANES
    p = doc_rows.shape[0]
    rows3 = doc_rows.reshape(p // _ALIGN, 8, _LANES)
    wn3 = wnorm.reshape(p // _ALIGN, 8, _LANES)
    kernel = functools.partial(_kernel, q2=q2, w2=w2, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, q2 * w_rows, _LANES), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q2 * w_rows, _LANES), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((q2, w2 // _ALIGN, 8, _LANES), jnp.int32),
            pltpu.VMEM((q2, w2 // _ALIGN, 8, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((q2, 2)),
        ],
    )
    out_rows, out_scores = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, q2 * w_rows, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((b, q2 * w_rows, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(win, dlt, lens, idfs, nterm, rows3, wn3)
    return out_rows.reshape(b, q2 * w2), out_scores.reshape(b, q2 * w2)


def candidate_scores_pallas(term_ids, doc_rows, wnorm, offsets, idf, *, max_df: int, mode: str = "any"):
    """Raw-array kernel entry: [B, Q] term ids -> (rows, scores) [B, Q2*W2].

    Scores carry NEG_INF on non-leader / non-matching slots; rows carry -1 there.
    Usable inside shard_map (all inputs are plain local arrays)."""
    if term_ids.ndim == 1:
        term_ids = term_ids[None, :]
    b, q = term_ids.shape
    q2 = 1
    while q2 < max(q, 2):
        q2 *= 2
    w2 = dma_window(int(max_df))
    p = doc_rows.shape[0]
    if p < w2 or p % _ALIGN:
        raise ValueError(
            f"postings array (len {p}) is not padded for the {w2}-wide DMA window; "
            "rebuild the snapshot with a current LexIndexBuilder"
        )

    valid = term_ids >= 0
    safe = jnp.maximum(term_ids, 0)
    offs = jnp.where(valid, jnp.take(offsets, safe), 0).astype(jnp.int32)
    win = offs // _ALIGN
    # clamp so the static window never overruns (snapshot pads by w2 past the end,
    # so this never fires on current snapshots; kept as a hard safety bound)
    win = jnp.minimum(win, p // _ALIGN - w2 // _ALIGN)
    dlt = offs - win * _ALIGN
    lens = jnp.where(valid, jnp.take(offsets, safe + 1) - jnp.take(offsets, safe), 0)
    idfs = jnp.where(valid, jnp.take(idf, safe), 0.0).astype(jnp.float32)
    nterm = jnp.sum(valid, axis=1, keepdims=True).astype(jnp.int32)
    if q2 > q:
        win = jnp.pad(win, ((0, 0), (0, q2 - q)))
        dlt = jnp.pad(dlt, ((0, 0), (0, q2 - q)))
        lens = jnp.pad(lens, ((0, 0), (0, q2 - q)))
        idfs = jnp.pad(idfs, ((0, 0), (0, q2 - q)))

    interpret = jax.default_backend() == "cpu"
    return _run(
        win, dlt, lens.astype(jnp.int32), idfs, nterm, doc_rows, wnorm, q2, w2, mode, interpret
    )


def bm25_candidates_topk_pallas(term_ids, index: LexIndex, k: int, mode: str = "any"):
    """Pallas candidate-set BM25 top-k — same contract as bm25_topk.

    Returns (scores [B, k], rows [B, k], frame_ids [B, k])."""
    if index.wnorm is None:
        raise ValueError("snapshot has no precomputed wnorm; rebuild the snapshot")
    k = int(min(k, index.frame_ids.shape[0]))
    out_rows, out_scores = candidate_scores_pallas(
        term_ids,
        index.doc_rows,
        index.wnorm,
        index.offsets,
        index.idf,
        max_df=int(index.max_df),
        mode=mode,
    )
    vals, pos = jax.lax.top_k(out_scores, k)
    sel = jnp.take_along_axis(out_rows, pos, axis=-1)
    ok = vals > NEG_INF * 0.5
    sel = jnp.where(ok, sel, 0)
    fids = jnp.where(ok, jnp.take(index.frame_ids, sel), -1).astype(jnp.int32)
    # dead-slot convention matches masked_top_k: NEG_INF value, -1 ids
    return vals, jnp.where(ok, sel, -1), fids
