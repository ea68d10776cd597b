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
from wax_tpu.ops.bm25_candidates import wide_topk
from wax_tpu.ops.topk import NEG_INF

__all__ = ["bm25_candidates_topk_pallas", "candidate_scores_pallas"]

_SENT = 2**30  # python int: jnp constants capture as tracers inside pallas kernels
_LANES = 128
_ALIGN = 1024  # i32/f32 HBM tile: windows anchor at this flat alignment
# in-kernel selection depth for the rescore-fetch path: sel*1024 candidates out,
# losing a true top-F member only when > _SEL_LEVELS of them share one of the
# 1024 (sublane, lane) slots (~0.1 borderline candidates per query at F=256)
_SEL_LEVELS = 3


def _iotas(shape):
    """One-time lane/sublane/flat index planes shared by every stage (Mosaic does
    not reliably CSE per-stage iota rebuilds across ~70 unrolled stages)."""
    sub = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return sub, lane, sub * _LANES + lane


def _desc_mask(flat, run_len: int):
    """True where the element belongs to an odd OUTPUT run of size 2*run_len —
    those runs merge DESCENDING so the next level's inputs are bitonic without
    any physical reversal (the classic alternating-direction bitonic network)."""
    return (flat & (2 * run_len)) != 0


def _stage(rows, con, d: int, desc, sub, lane):
    """One compare-exchange stage at flat distance d (pow2).

    d >= 128: partners live d//128 sublanes apart (axis-0 rolls); d < 128:
    partners are d lanes apart within a 128-lane row (axis-1 rolls; a 2d block
    never crosses a row, so the cyclic wrap is never selected). Both elements of
    a pair compute the same `swap` (strict compares keep ties in place, so the
    merge stays stable), then take the partner where it wins.
    """
    if d >= _LANES:
        dr = d // _LANES
        is_lo = (sub & dr) == 0
        pr = jnp.where(is_lo, jnp.roll(rows, -dr, axis=0), jnp.roll(rows, dr, axis=0))
        pc = jnp.where(is_lo, jnp.roll(con, -dr, axis=0), jnp.roll(con, dr, axis=0))
    else:
        is_lo = (lane & d) == 0
        pr = jnp.where(is_lo, jnp.roll(rows, -d, axis=1), jnp.roll(rows, d, axis=1))
        pc = jnp.where(is_lo, jnp.roll(con, -d, axis=1), jnp.roll(con, d, axis=1))
    # logical blend, not jnp.where: Mosaic cannot select_n on i1 vectors
    # ("Unsupported target bitwidth for truncation")
    swap = ((is_lo & (pr < rows)) | (~is_lo & (rows < pr))) ^ desc
    return jnp.where(swap, pr, rows), jnp.where(swap, pc, con)


def merge_rows_lanes(rows, con, run_len: int, sub, lane, flat):
    """Bitonic-merge adjacent runs of flat length run_len (>=128) whose directions
    alternate (even run ascending, odd descending). Output runs of 2*run_len again
    alternate, with the final full-width run ascending."""
    desc = _desc_mask(flat, run_len)
    d = run_len
    while d >= 1:
        rows, con = _stage(rows, con, d, desc, sub, lane)
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


def segment_passes(rows, con, cnt, max_run_log2: int, flat):
    """Hillis-Steele segmented sum/count; run-last element carries totals."""
    total = rows.shape[0] * _LANES
    d = 1
    for _ in range(max_run_log2):
        if d < _LANES:
            sr, sv, sc = _roll_flat(rows, d), _roll_flat(con, d), _roll_flat(cnt, d)
        else:
            dr = d // _LANES
            sr = jnp.roll(rows, dr, axis=0)
            sv = jnp.roll(con, dr, axis=0)
            sc = jnp.roll(cnt, dr, axis=0)
        ok = (flat >= d) & (sr == rows)
        con = con + jnp.where(ok, sv, 0.0)
        cnt = cnt + jnp.where(ok, sc, 0)
        d *= 2
    # leader = last element of its run
    nr = _roll_flat_back(rows)
    leader = (rows != nr) | (flat == total - 1)
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
    rows_rev_hbm,  # per-term reversed copies (odd merge slots stream these:
    wn_rev_hbm,  # runs arrive pre-reversed, so the merge tree needs no flip stages)
    out_rows_ref,
    out_score_ref,
    rows_vmem,  # [Q2, W2/1024, 8, 128]
    wn_vmem,
    sems,
    *,
    q2: int,
    w2: int,
    mode: str,
    sel: int = 0,
):
    b = pl.program_id(0)
    w_rows = w2 // _LANES
    w_blks = w2 // _ALIGN

    # stream all Q windows (one contiguous DMA each); odd slots from the reversed
    # copies (same offsets, slice content reversed in place) so their runs arrive
    # descending — only the out-of-slice sentinels swap ends below
    def _copies(qi):
        rs = rows_rev_hbm if qi % 2 else rows_hbm
        ws = wn_rev_hbm if qi % 2 else wn_hbm
        return (
            pltpu.make_async_copy(
                rs.at[pl.ds(win_ref[b, qi], w_blks)], rows_vmem.at[qi], sems.at[qi, 0]
            ),
            pltpu.make_async_copy(
                ws.at[pl.ds(win_ref[b, qi], w_blks)], wn_vmem.at[qi], sems.at[qi, 1]
            ),
        )

    for qi in range(q2):
        a, bcp = _copies(qi)
        a.start()
        bcp.start()
    for qi in range(q2):
        a, bcp = _copies(qi)
        a.wait()
        bcp.wait()

    # [Q2, W2/1024, 8, 128] -> [Q2 * W2/128, 128] flat row-major candidate buffer
    rows = rows_vmem[:, :, :, :].reshape(q2 * w_rows, _LANES)
    wn = wn_vmem[:, :, :, :].reshape(q2 * w_rows, _LANES)
    sub, lane, flat = _iotas(rows.shape)
    flat_in_win = flat % w2
    term_of = flat // w2
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
    # out-of-slice sentinels keep every run sorted in ITS direction: ascending
    # (even slots) lead with -1 / trail with SENT; descending (odd slots, DMAed
    # from the reversed copies) lead with SENT / trail with -1
    odd_slot = (term_of & 1) == 1
    lead = jnp.where(odd_slot, _SENT, -1)
    trail = jnp.where(odd_slot, -1, _SENT)
    rows = jnp.where(valid, rows, jnp.where(flat_in_win < dltv, lead, trail))
    con = jnp.where(valid, idfv * wn, 0.0)

    run = w2
    while run < q2 * w2:
        rows, con = merge_rows_lanes(rows, con, run, sub, lane, flat)
        run *= 2

    cnt = jnp.where(valid_sorted_mask(rows), 1, 0)
    # runs can reach 2*q2 only with duplicate query terms; q2 rounds up anyway
    log2 = 1
    while (1 << log2) < 2 * q2:
        log2 += 1
    leader, summed, counts = segment_passes(rows, con, cnt, log2, flat)

    live = leader & (rows >= 0) & (rows < _SENT) & (summed > 0.0)
    if mode == "all":
        live = live & (counts >= nterm_ref[b, 0])
    score_out = summed
    if mode == "count":
        # candidate-ranking mode for AND-query rescore: matched-slot count
        # dominates, budgeted score breaks ties. 4096 > any reachable BM25 sum
        # (<= 128 idf-head terms x idf<=ln N~14 x w<=k1+1) and is exactly
        # representable, so count ordering is never perturbed.
        score_out = summed + 4096.0 * counts.astype(jnp.float32)
    if sel:
        # in-kernel candidate selection (rescore-fetch path): keep the top-`sel`
        # packed keys per (sublane, lane) slot while the plane is still in VMEM —
        # writing the [Q2*W2] planes back and re-reading them for a top-F costs
        # ~3.5 ms at 1M x budget 3072 (wide_topk) vs ~0.1 ms here. Key = score
        # bits truncated to 19 (sign+exp+10 mantissa, 2^-10 relative — candidate
        # RANKING only; the forward-index rescore restores exact scores) with the
        # low 13 bits holding the complement of the 8-row chunk index, so equal
        # truncated scores prefer the lower plane position. Doc rows travel as a
        # payload through the same compare decisions.
        masked = jnp.where(live, score_out, NEG_INF)
        bits = jax.lax.bitcast_convert_type(masked, jnp.int32)
        key = jnp.where(
            bits >= 0, bits, jnp.bitwise_xor(jnp.bitwise_not(bits), jnp.int32(-(2**31)))
        )
        chunk = sub // 8  # plane has <= 8192 8-row chunks (w2*q2 <= 8.4M elements)
        key = jnp.bitwise_or(jnp.bitwise_and(key, jnp.int32(~0x1FFF)), 0x1FFF - chunk)
        row_pay = jnp.where(live, rows, -1)
        imin = jnp.full((8, _LANES), -(2**31), jnp.int32)
        tops = [imin for _ in range(sel)]
        pays = [jnp.full((8, _LANES), -1, jnp.int32) for _ in range(sel)]
        for c in range(rows.shape[0] // 8):
            tk = key[c * 8 : (c + 1) * 8]
            tr = row_pay[c * 8 : (c + 1) * 8]
            for lvl in range(sel):
                sw = tk > tops[lvl]
                tops[lvl], tk = (
                    jnp.where(sw, tk, tops[lvl]),
                    jnp.where(sw, tops[lvl], tk),
                )
                pays[lvl], tr = (
                    jnp.where(sw, tr, pays[lvl]),
                    jnp.where(sw, pays[lvl], tr),
                )
        out_score_ref[0] = jnp.concatenate(tops, axis=0)  # packed keys [sel*8, 128]
        out_rows_ref[0] = jnp.concatenate(pays, axis=0)
        return
    out_rows_ref[0] = jnp.where(live, rows, -1)
    out_score_ref[0] = jnp.where(live, score_out, NEG_INF)


def valid_sorted_mask(rows):
    """Post-merge liveness: real doc rows are in [0, SENT)."""
    return (rows >= 0) & (rows < _SENT)


@functools.partial(jax.jit, static_argnames=("q2", "w2", "mode", "interpret", "sel"))
def _run(win, dlt, lens, idfs, nterm, doc_rows, wnorm, doc_rows_rev, wnorm_rev,
         q2: int, w2: int, mode: str, interpret: bool, sel: int = 0):
    b = win.shape[0]
    w_rows = w2 // _LANES
    p = doc_rows.shape[0]
    rows3 = doc_rows.reshape(p // _ALIGN, 8, _LANES)
    wn3 = wnorm.reshape(p // _ALIGN, 8, _LANES)
    rows3r = doc_rows_rev.reshape(p // _ALIGN, 8, _LANES)
    wn3r = wnorm_rev.reshape(p // _ALIGN, 8, _LANES)
    kernel = functools.partial(_kernel, q2=q2, w2=w2, mode=mode, sel=sel)
    out_rows_shape = (b, sel * 8 if sel else q2 * w_rows, _LANES)
    score_dtype = jnp.int32 if sel else jnp.float32  # sel mode emits packed keys
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1,) + out_rows_shape[1:], lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + out_rows_shape[1:], lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
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
            jax.ShapeDtypeStruct(out_rows_shape, jnp.int32),
            jax.ShapeDtypeStruct(out_rows_shape, score_dtype),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(win, dlt, lens, idfs, nterm, rows3, wn3, rows3r, wn3r)
    flat = out_rows_shape[1] * _LANES
    return out_rows.reshape(b, flat), out_scores.reshape(b, flat)


def candidate_scores_pallas(term_ids, doc_rows, wnorm, offsets, idf, doc_rows_rev, wnorm_rev,
                            *, max_df: int, mode: str = "any", sel: int = 0):
    """Raw-array kernel entry: [B, Q] term ids -> (rows, scores) [B, Q2*W2].

    Scores carry NEG_INF on non-leader / non-matching slots; rows carry -1 there.
    Usable inside shard_map (all inputs are plain local arrays).

    sel > 0 (rescore-fetch mode): the kernel keeps the top-`sel` candidates per
    (sublane, lane) slot in-VMEM and returns (rows [B, sel*1024] with -1 dead,
    packed_keys [B, sel*1024] i32, monotone in the 2^-10-truncated score, ties
    toward lower plane position) — no [B, Q2*W2] plane ever reaches HBM."""
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
        win, dlt, lens.astype(jnp.int32), idfs, nterm, doc_rows, wnorm,
        doc_rows_rev, wnorm_rev, q2, w2, mode, interpret, sel
    )


def bm25_candidates_topk_pallas(term_ids, index: LexIndex, k: int, mode: str = "any",
                                fetch: int | None = None):
    """Pallas candidate-set BM25 top-k — same contract as bm25_topk.

    When the snapshot carries a forward index (fwd_tids — present iff the
    postings budget truncated a term), candidate generation runs OR-mode over the
    budgeted postings, then the top-`fetch` candidates are EXACTLY rescored
    against the doc-major forward index (ops/bm25_rescore.py) — multi-term
    scores and AND-mode counts become exact for every returned doc.

    Returns (scores [B, k], rows [B, k], frame_ids [B, k])."""
    if index.wnorm is None or index.doc_rows_rev is None:
        raise ValueError("snapshot has no precomputed wnorm/reversed postings; rebuild the snapshot")
    k = int(min(k, index.frame_ids.shape[0]))
    rescore = index.fwd_tids is not None
    if rescore:
        from wax_tpu.ops.bm25_rescore import rescore_topk

        # AND filtering moves to the exact rescore (budgeted hit counts would
        # wrongly pre-drop matches truncated out of one term's impact head);
        # AND candidates rank by budgeted match count so full conjunctions
        # reach the rescore window even with low budgeted scores
        if index.pk_chunks is not None:
            # chunked packed kernel: half the merge volume, one plane, shortlist
            # pre-sorted in-kernel (ops/bm25_chunked_pallas.py)
            from wax_tpu.ops.bm25_chunked_pallas import chunked_candidates_sel

            cand_rows, keys = chunked_candidates_sel(
                term_ids,
                index.pk_chunks,
                index.pk_chunks_rev,
                index.chunk_base,
                index.chunk_counts,
                qb=index.pk_qb,
                max_chunks=index.pk_max_chunks,
                mode="count" if mode == "all" else "any",
                sel=_SEL_LEVELS,
            )
            f = int(min(fetch if fetch is not None else max(4 * k, 256),
                        keys.shape[-1]))
            _, cpos = jax.lax.top_k(keys, f)
            crows = jnp.take_along_axis(cand_rows, cpos, axis=-1)
            vals, sel = rescore_topk(
                term_ids if term_ids.ndim == 2 else term_ids[None, :],
                crows, index.fwd_tids, index.fwd_wnorm, index.idf, k, mode,
                fwd_width=index.fwd_width, fwd_fused=index.fwd_fused,
            )
        else:
            cand_rows, keys = candidate_scores_pallas(
                term_ids,
                index.doc_rows,
                index.wnorm,
                index.offsets,
                index.idf,
                index.doc_rows_rev,
                index.wnorm_rev,
                max_df=int(index.max_df),
                mode="count" if mode == "all" else "any",
                sel=_SEL_LEVELS,
            )
            f = int(min(fetch if fetch is not None else max(4 * k, 256),
                        keys.shape[-1]))
            # plain top_k (wide_topk's two-stage overhead measured SLOWER here)
            _, cpos = jax.lax.top_k(keys, f)
            crows = jnp.take_along_axis(cand_rows, cpos, axis=-1)
            vals, sel = rescore_topk(
                term_ids if term_ids.ndim == 2 else term_ids[None, :],
                crows, index.fwd_tids, index.fwd_wnorm, index.idf, k, mode,
                fwd_width=index.fwd_width, fwd_fused=index.fwd_fused,
            )
    else:
        out_rows, out_scores = candidate_scores_pallas(
            term_ids,
            index.doc_rows,
            index.wnorm,
            index.offsets,
            index.idf,
            index.doc_rows_rev,
            index.wnorm_rev,
            max_df=int(index.max_df),
            mode=mode,
        )
        vals, pos = wide_topk(out_scores, k)
        sel = jnp.take_along_axis(out_rows, pos, axis=-1)
    ok = vals > NEG_INF * 0.5
    sel = jnp.where(ok, sel, 0)
    fids = jnp.where(ok, jnp.take(index.frame_ids, sel), -1).astype(jnp.int32)
    # dead-slot convention matches masked_top_k: NEG_INF value, -1 ids
    return vals, jnp.where(ok, sel, -1), fids
