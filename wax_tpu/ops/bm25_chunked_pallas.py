"""Chunked packed-postings BM25 candidate kernel: the merge-volume lever.

The original candidate kernel (ops/bm25_candidates_pallas.py) streams one
pow2(max_df+1024)-wide window per query term and bitonic-merges TWO planes
(rows i32 + contributions f32) — at 1M docs / budget 3072 / 16 terms that is a
65536-element dual plane through ~58 compare-exchange stages, ~75% of the whole
hybrid cost. This kernel cuts the volume on both axes:

  1. PACKED single plane. Each posting is pre-packed at snapshot build into one
     i32: (row << qb) | quantized(idf*wnorm) (index/lex.py build_impact_chunks).
     Sorting the packed value sorts by row with the contribution riding in the
     low bits, so every merge stage is roll/min/max/select on ONE plane instead
     of compare + dual-select on two — and the DMA volume halves. Quantization
     (qb >= 10 bits at 1M rows) affects candidate RANKING only: final scores
     come from the exact forward-index rescore (ops/bm25_rescore.py), which is
     the only mode this kernel serves (budget-truncated snapshots always carry
     the forward index).

  2. WATER-FILLED chunks. Postings are stored as 1024-aligned impact chunks
     (chunk j = impact ranks [j*1024, (j+1)*1024), row-sorted). A query's chunks
     are assigned to a fixed SLOTS-run merge plane in water-fill order (all
     chunk-0s, then chunk-1s, ...), so small terms stop paying max_df-sized
     sentinel windows and a heavy query degrades gracefully to every term's
     top-(SLOTS/Q) impact chunks instead of overflowing VMEM. SLOTS = 32 covers
     16-term queries to budget 2048/term and typical mixes to the full budget;
     the effective-budget recall tradeoff is measured in scripts/budget_recall.py
     and documented in docs/benchmarks.md.

Pad slots carry INT32_MAX from the build (the per-block reversed copy gives
descending odd slots LEADING pads), so the kernel needs zero masking, no idf
gather, and no per-slot window arithmetic. On CPU the kernel runs in interpret
mode.

(reference being replaced: SQLite FTS5 bm25 ranking,
Sources/WaxTextSearch/FTS5SearchEngine.swift:129-161.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wax_tpu.index.lex import PK_CHUNK
from wax_tpu.ops.bm25_candidates_pallas import (
    _desc_mask,
    _iotas,
    _roll_flat,
    _roll_flat_back,
)

__all__ = ["chunked_candidates_sel", "pack_query_chunks", "MIN_SLOTS"]

_LANES = 128
_I32_MAX = 2**31 - 1
_DEAD_RANK = 2**30
MIN_SLOTS = 32
_SEL_LEVELS = 3


def _stage_packed(x, d: int, desc, sub, lane):
    """One packed-plane compare-exchange stage at flat distance d (pow2).

    partner = the element d away (toward the pair's other half); lo positions of
    ascending runs take min(x, partner), hi take max, directions flip under
    `desc`. Equal packed values make min == max, so ties are trivially stable."""
    if d >= _LANES:
        dr = d // _LANES
        is_lo = (sub & dr) == 0
        rm = jnp.roll(x, -dr, axis=0)
        rp = jnp.roll(x, dr, axis=0)
    else:
        is_lo = (lane & d) == 0
        rm = jnp.roll(x, -d, axis=1)
        rp = jnp.roll(x, d, axis=1)
    p = jnp.where(is_lo, rm, rp)
    mn = jnp.minimum(x, p)
    mx = jnp.maximum(x, p)
    return jnp.where(is_lo ^ desc, mn, mx)


def _merge_packed(x, run_len: int, sub, lane, flat):
    desc = _desc_mask(flat, run_len)
    d = run_len
    while d >= 1:
        x = _stage_packed(x, d, desc, sub, lane)
        d //= 2
    return x


def _segment_int(rows, val, cnt, max_run_log2: int, flat):
    """Hillis-Steele segmented sum/count over equal-`rows` runs (int lanes);
    run-last element carries the totals."""
    total = rows.shape[0] * _LANES
    d = 1
    for _ in range(max_run_log2):
        if d < _LANES:
            sr, sv, sc = _roll_flat(rows, d), _roll_flat(val, d), _roll_flat(cnt, d)
        else:
            dr = d // _LANES
            sr = jnp.roll(rows, dr, axis=0)
            sv = jnp.roll(val, dr, axis=0)
            sc = jnp.roll(cnt, dr, axis=0)
        ok = (flat >= d) & (sr == rows)
        val = val + jnp.where(ok, sv, 0)
        cnt = cnt + jnp.where(ok, sc, 0)
        d *= 2
    nr = _roll_flat_back(rows)
    leader = (rows != nr) | (flat == total - 1)
    return leader, val, cnt


def _kernel(win_ref, pk_hbm, pkr_hbm, out_rows_ref, out_keys_ref, plane_vmem, sems,
            *, slots: int, mode: str, sel: int, qb: int, seg_log2: int):
    b = pl.program_id(0)

    def _cp(s):
        src = pkr_hbm if s % 2 else pk_hbm
        return pltpu.make_async_copy(
            src.at[pl.ds(win_ref[b, s], 1)], plane_vmem.at[s], sems.at[s]
        )

    for s in range(slots):
        _cp(s).start()
    for s in range(slots):
        _cp(s).wait()

    x = plane_vmem[:, :, :, :].reshape(slots * PK_CHUNK // _LANES, _LANES)
    sub, lane, flat = _iotas(x.shape)
    run = PK_CHUNK
    while run < slots * PK_CHUNK:
        x = _merge_packed(x, run, sub, lane, flat)
        run *= 2

    rows = jax.lax.shift_right_logical(x, qb)  # packed values are non-negative
    qcon = jnp.bitwise_and(x, jnp.int32((1 << qb) - 1))
    live = (x != jnp.int32(_I32_MAX)) & (qcon > 0)
    val = jnp.where(live, qcon, 0)
    cnt = jnp.where(live, 1, 0)
    leader, vsum, csum = _segment_int(rows, val, cnt, seg_log2, flat)
    live = leader & live & (vsum > 0)
    if mode == "count":
        # AND candidate ranking: matched-slot count dominates, quantized score
        # breaks ties (saturated — ranking only, the rescore is exact)
        rank = csum * 65536 + jnp.minimum(vsum, 65535)
    else:
        rank = vsum
    # tie-break toward the lower plane chunk (= lower doc row: the merged plane
    # is ascending in row); slots <= 128 so the chunk index fits 7 bits
    chunk = sub // 8
    key = jnp.where(live, rank * 128 + (127 - chunk), jnp.int32(-(2**31)))
    row_pay = jnp.where(live, rows, -1)

    imin = jnp.full((8, _LANES), -(2**31), jnp.int32)
    tops = [imin for _ in range(sel)]
    pays = [jnp.full((8, _LANES), -1, jnp.int32) for _ in range(sel)]
    for c in range(x.shape[0] // 8):
        tk = key[c * 8 : (c + 1) * 8]
        tr = row_pay[c * 8 : (c + 1) * 8]
        for lvl in range(sel):
            sw = tk > tops[lvl]
            tops[lvl], tk = jnp.where(sw, tk, tops[lvl]), jnp.where(sw, tops[lvl], tk)
            pays[lvl], tr = jnp.where(sw, tr, pays[lvl]), jnp.where(sw, pays[lvl], tr)
    # (an in-kernel full sort of this shortlist was measured SLOWER than the
    # XLA-side lax.top_k — 63 of its 78 bitonic stages are sub-128 lane rolls,
    # the expensive stage class; hybrid_100k regressed 5.7 -> 6.0 ms)
    out_keys_ref[0] = jnp.concatenate(tops, axis=0)
    out_rows_ref[0] = jnp.concatenate(pays, axis=0)


@functools.partial(jax.jit, static_argnames=("slots", "mode", "sel", "qb", "seg_log2",
                                             "interpret"))
def _run(win, pk, pk_rev, slots: int, mode: str, sel: int, qb: int, seg_log2: int,
         interpret: bool):
    b = win.shape[0]
    pb = pk.shape[0] // PK_CHUNK
    pk3 = pk.reshape(pb, 8, _LANES)
    pkr3 = pk_rev.reshape(pb, 8, _LANES)
    kernel = functools.partial(
        _kernel, slots=slots, mode=mode, sel=sel, qb=qb, seg_log2=seg_log2
    )
    out_shape = (b, sel * 8, _LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1,) + out_shape[1:], lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,) + out_shape[1:], lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((slots, 1, 8, _LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    out_rows, out_keys = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
            jax.ShapeDtypeStruct(out_shape, jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(win, pk3, pkr3)
    flat = out_shape[1] * _LANES
    return out_rows.reshape(b, flat), out_keys.reshape(b, flat)


def pack_query_chunks(term_ids, chunk_base, chunk_counts, slots: int, max_chunks: int,
                      dead_block: int):
    """Water-fill the query terms' impact chunks into `slots` merge slots.

    Chunk (term i, impact level j) has fill rank j*Q + i; the first `slots`
    ranked live chunks get a slot, the rest are dropped (deeper impact
    truncation — the graceful-degradation contract documented in
    docs/benchmarks.md). Dead slots point at the snapshot's sentinel block.
    Returns win [B, slots] i32 block indices.
    """
    if term_ids.ndim == 1:
        term_ids = term_ids[None, :]
    b, q = term_ids.shape
    valid = term_ids >= 0
    safe = jnp.maximum(term_ids, 0)
    counts = jnp.where(valid, jnp.take(chunk_counts, safe), 0)  # [B, Q]
    base = jnp.take(chunk_base, safe)  # [B, Q]
    maxc = max(1, max_chunks)
    j = jnp.arange(maxc, dtype=jnp.int32)[None, :, None]  # [1, maxc, 1]
    qi = jnp.arange(q, dtype=jnp.int32)[None, None, :]  # [1, 1, Q]
    live = j < counts[:, None, :]  # [B, maxc, Q]
    rank = jnp.where(live, j * q + qi, jnp.int32(_DEAD_RANK)).reshape(b, maxc * q)
    blk = jnp.where(live, base[:, None, :] + j, jnp.int32(dead_block)).reshape(b, maxc * q)
    rank_s, blk_s = jax.lax.sort((rank, blk), num_keys=1)
    if maxc * q >= slots:
        win = blk_s[:, :slots]
    else:
        win = jnp.pad(blk_s, ((0, 0), (0, slots - maxc * q)),
                      constant_values=dead_block)
    return win.astype(jnp.int32)


def slots_for_query(q: int) -> int:
    """Static merge-plane slot count: every term always lands at least its top
    impact chunk (slots >= q), with a floor that covers 16-term queries to two
    chunks (2048 budget) per term."""
    s = MIN_SLOTS
    while s < q:
        s *= 2
    if s > 128:
        # the in-kernel tie-break packs the plane chunk index into 7 bits; the
        # engine's 128-term query cap (search/unified.py fetch planning) keeps
        # real queries far below this
        raise ValueError(f"chunked BM25 kernel supports at most 128 query terms, got {q}")
    return s


def chunked_candidates_sel(term_ids, pk_chunks, pk_chunks_rev, chunk_base, chunk_counts,
                           *, qb: int, max_chunks: int, mode: str = "any",
                           sel: int = _SEL_LEVELS):
    """Raw-array chunked-kernel entry: [B, Q] term ids -> (rows, keys), each
    [B, sel*1024]: the per-(sublane, lane)-slot top-`sel` candidates as i32 keys
    monotone in (quantized budgeted score | matched count), rows -1 dead.
    Usable inside shard_map (all inputs are plain local arrays)."""
    if term_ids.ndim == 1:
        term_ids = term_ids[None, :]
    b, q = term_ids.shape
    slots = slots_for_query(q)
    pb = pk_chunks.shape[0] // PK_CHUNK
    win = pack_query_chunks(term_ids, chunk_base, chunk_counts, slots, max_chunks, pb - 1)
    # segmented-sum pass count: a doc repeats at most once per query term slot
    seg_log2 = 1
    while (1 << seg_log2) < 2 * q:
        seg_log2 += 1
    interpret = jax.default_backend() == "cpu"
    return _run(win, pk_chunks, pk_chunks_rev, slots, mode, sel, qb, seg_log2, interpret)
