"""Mesh-sharded hybrid retrieval: dense scan + BM25 + RRF fusion in ONE XLA program.

The multi-chip generalization of the unified-search hot path (SURVEY.md §2.7's
required equivalent): the corpus — embedding matrix AND CSR postings — is sharded over
the mesh "data" axis; a replicated query batch (dense vectors + padded term ids) runs
both lanes locally on every shard, local top-k candidates merge across ICI with
all-gathers, and weighted reciprocal-rank fusion of the two global rankings happens on
device. Host code sees one jitted call: (queries, term_ids) -> fused top-k frame ids.

Determinism matches the host path: stable lax.top_k merges + (score desc, then lane
order, then candidate position) tie-breaks.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from wax_tpu.index.lex import (
    BM25_B,
    BM25_K1,
    LexIndex,
    LexIndexBuilder,
    dma_window,
    reverse_postings_copies,
)
from wax_tpu.ops.bm25_candidates import candidate_scores_sorted, wide_topk
from wax_tpu.ops.bm25_candidates_pallas import candidate_scores_pallas
from wax_tpu.ops.topk import NEG_INF, blockmax_topk
from wax_tpu.parallel.merge import merge_topk_across_mesh
from wax_tpu.parallel.mesh import corpus_axes, corpus_shards, shard_rows
from wax_tpu.parallel.sharded_scan import ShardedDenseIndex

__all__ = ["ShardedLexIndex", "shard_lex_index", "sharded_hybrid_topk", "sharded_bm25_topk"]

# local-shard row count above which the hybrid's dense lane switches from blockmax
# to the chunkmax DMA kernel (tests lower this to exercise the path on tiny CPU
# corpora)
_CHUNKMAX_MIN_LOCAL_ROWS = 524_288
# local-shard row count above which the hybrid's dense lane switches from exact
# blockmax to the packed select kernel (matching ops/flat_scan.py auto's 100K
# regime); small CPU-test corpora stay on the bit-exact blockmax path
_SELKERNEL_MIN_LOCAL_ROWS = 65_536


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShardedLexIndex:
    """Row-sharded CSR postings: leading axis = shard (laid over the data axis).

    Per-shard arrays are padded to common shapes; `row_base` maps local rows to the
    global row space shared with the dense index.
    """

    doc_rows: jax.Array  # [S, P_max] int32 local row ids
    tfs: jax.Array  # [S, P_max] f32
    offsets: jax.Array  # [S, T+1] int32
    idf: jax.Array  # [S, T] f32 (global idf replicated per shard row)
    doc_len: jax.Array  # [S, N_local] f32
    frame_ids: jax.Array  # [S, N_local] int32
    live: jax.Array  # [S, N_local] bool
    row_base: jax.Array  # [S] int32 global row offset of each shard
    avgdl: jax.Array  # scalar f32
    wnorm: jax.Array | None = None  # [S, P_max] f32 tf-normalized weights (0 = dead)
    doc_rows_rev: jax.Array | None = None  # per-term reversed copies (Pallas lane)
    wnorm_rev: jax.Array | None = None
    # doc-major forward index [S, per, L] (present iff budget truncation active):
    # exact rescore of local candidates (ops/bm25_rescore.py)
    fwd_tids: jax.Array | None = None
    fwd_wnorm: jax.Array | None = None
    # fused forward index [S, per, 2*L2] i32 (index/lex.py fuse_forward): the
    # rescore's single-gather fast path
    fwd_fused: jax.Array | None = None
    # impact-chunked packed postings [S, PB*1024] (present iff budget truncation
    # active; see index/lex.py build_impact_chunks + ops/bm25_chunked_pallas.py)
    pk_chunks: jax.Array | None = None
    pk_chunks_rev: jax.Array | None = None
    chunk_base: jax.Array | None = None  # [S, T]
    chunk_counts: jax.Array | None = None  # [S, T]
    max_df: int = field(metadata=dict(static=True), default=0)
    pk_qb: int = field(metadata=dict(static=True), default=0)
    pk_max_chunks: int = field(metadata=dict(static=True), default=0)
    fwd_width: int = field(metadata=dict(static=True), default=0)


def shard_lex_index(builder: LexIndexBuilder, mesh: Mesh, n_rows_global: int) -> ShardedLexIndex:
    """Split a host lex builder into per-shard CSR arrays over contiguous row ranges.

    Row space must match the dense index (global rows 0..n_rows_global-1 map to the
    same frames in both indexes).
    """
    s = corpus_shards(mesh)
    per = -(-n_rows_global // s)
    full = builder.snapshot()
    # host-side numpy views of the global CSR
    doc_rows = np.asarray(full.doc_rows)
    tfs = np.asarray(full.tfs)
    offsets = np.asarray(full.offsets)
    idf = np.asarray(full.idf)
    doc_len_g = np.asarray(full.doc_len)
    frame_ids_g = np.asarray(full.frame_ids)
    active_g = np.asarray(full.active)
    count = int(full.count)
    t = len(offsets) - 1

    shard_postings = []  # list of (doc_rows_local, tfs, offsets)
    max_p = 1
    max_df = 1
    for si in range(s):
        lo, hi = si * per, min((si + 1) * per, n_rows_global)
        rows_l, tfs_l = [], []
        offs = np.zeros(t + 1, np.int64)
        for tid in range(t):
            a, b = offsets[tid], offsets[tid + 1]
            seg_rows = doc_rows[a:b]
            mask = (seg_rows >= lo) & (seg_rows < hi)
            rl = seg_rows[mask] - lo
            rows_l.append(rl)
            tfs_l.append(tfs[a:b][mask])
            offs[tid + 1] = offs[tid] + len(rl)
            max_df = max(max_df, len(rl))
        rows_cat = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int32)
        tfs_cat = np.concatenate(tfs_l) if tfs_l else np.zeros(0, np.float32)
        max_p = max(max_p, len(rows_cat))
        shard_postings.append((rows_cat, tfs_cat, offs))

    # pad past the last posting by the candidate kernel's DMA window (1024-aligned
    # total) so a window anchored at the final term never reads out of bounds
    max_df_pad = ((max_df + 127) // 128) * 128
    p_pad = ((max_p + dma_window(max_df_pad) + 1023) // 1024) * 1024
    dr = np.zeros((s, p_pad), np.int32)
    tf = np.zeros((s, p_pad), np.float32)
    off = np.zeros((s, t + 1), np.int32)
    dl = np.zeros((s, per), np.float32)
    fid = np.full((s, per), -1, np.int32)
    live = np.zeros((s, per), bool)
    base = np.zeros(s, np.int32)
    wn = np.zeros((s, p_pad), np.float32)
    dr_rev = np.zeros((s, p_pad), np.int32)
    wn_rev = np.zeros((s, p_pad), np.float32)
    avgdl_f = float(full.avgdl)
    for si, (rows_cat, tfs_cat, offs) in enumerate(shard_postings):
        dr[si, : len(rows_cat)] = rows_cat
        tf[si, : len(tfs_cat)] = tfs_cat
        off[si] = offs
        lo, hi = si * per, min((si + 1) * per, n_rows_global)
        w = hi - lo
        if w > 0 and lo < len(doc_len_g):
            src_hi = min(hi, len(doc_len_g))
            dl[si, : src_hi - lo] = doc_len_g[lo:src_hi]
            fid[si, : src_hi - lo] = frame_ids_g[lo:src_hi]
            live[si, : src_hi - lo] = active_g[lo:src_hi] & (np.arange(lo, src_hi) < count)
        base[si] = lo
        if len(rows_cat):
            # per-posting tf-normalized weight (0 for dead rows) so the candidate
            # lane streams postings without any doc_len gather
            pdl = dl[si, rows_cat]
            denom = tfs_cat + BM25_K1 * (1.0 - BM25_B + BM25_B * pdl / max(avgdl_f, 1e-9))
            wn[si, : len(rows_cat)] = np.where(
                live[si, rows_cat], tfs_cat * (BM25_K1 + 1.0) / np.maximum(denom, 1e-9), 0.0
            ).astype(np.float32)
        dr_rev[si], wn_rev[si] = reverse_postings_copies(
            dr[si], wn[si], offs.astype(np.int64)
        )

    pk_sh = pkr_sh = cbase_sh = ccnt_sh = None
    pk_qb = pk_maxc = 0
    if full.fwd_tids is not None:
        from wax_tpu.index.lex import build_impact_chunks

        per_pk, per_pkr, per_cb, per_cc = [], [], [], []
        for si, (rows_cat, tfs_cat, offs) in enumerate(shard_postings):
            pk_i, pkr_i, cb_i, cc_i, pk_qb = build_impact_chunks(
                dr[si], wn[si].astype(np.float64), offs.astype(np.int64),
                idf.astype(np.float64), per,
            )
            per_pk.append(pk_i)
            per_pkr.append(pkr_i)
            per_cb.append(cb_i)
            per_cc.append(cc_i)
            pk_maxc = max(pk_maxc, int(cc_i.max()) if len(cc_i) else 0)
        pb_max = max(len(p) for p in per_pk)
        pk_a = np.full((s, pb_max), np.int32(2**31 - 1), np.int32)
        pkr_a = np.full((s, pb_max), np.int32(2**31 - 1), np.int32)
        for si in range(s):
            pk_a[si, : len(per_pk[si])] = per_pk[si]
            pkr_a[si, : len(per_pkr[si])] = per_pkr[si]
        cbase_a = np.stack(per_cb) if t else np.zeros((s, 1), np.int32)
        ccnt_a = np.stack(per_cc) if t else np.zeros((s, 1), np.int32)
        pk_sh = shard_rows(mesh, jnp.asarray(pk_a))
        pkr_sh = shard_rows(mesh, jnp.asarray(pkr_a))
        cbase_sh = shard_rows(mesh, jnp.asarray(cbase_a))
        ccnt_sh = shard_rows(mesh, jnp.asarray(ccnt_a))

    ftids_sh = fwn_sh = ffused_sh = None
    fwd_width = 0
    if full.fwd_tids is not None:
        ftids_g = np.asarray(full.fwd_tids)
        fwn_g = np.asarray(full.fwd_wnorm)
        l_pad = ftids_g.shape[1]
        ftids = np.full((s, per, l_pad), -1, np.int32)
        fwn = np.zeros((s, per, l_pad), np.float32)
        for si in range(s):
            lo, hi = si * per, min((si + 1) * per, n_rows_global)
            src_hi = min(hi, ftids_g.shape[0])
            if src_hi > lo:
                ftids[si, : src_hi - lo] = ftids_g[lo:src_hi]
                fwn[si, : src_hi - lo] = fwn_g[lo:src_hi]
        ftids_sh = shard_rows(mesh, jnp.asarray(ftids))
        fwn_sh = shard_rows(mesh, jnp.asarray(fwn))
        fwd_width = int(full.fwd_width)
        from wax_tpu.index.lex import fuse_forward

        fz = np.stack([fuse_forward(ftids[si], fwn[si], fwd_width) for si in range(s)])
        ffused_sh = shard_rows(mesh, jnp.asarray(fz))

    return ShardedLexIndex(
        doc_rows=shard_rows(mesh, jnp.asarray(dr)),
        tfs=shard_rows(mesh, jnp.asarray(tf)),
        offsets=shard_rows(mesh, jnp.asarray(off)),
        idf=shard_rows(mesh, jnp.broadcast_to(jnp.asarray(idf)[None, :], (s, max(t, 1))).copy()),
        doc_len=shard_rows(mesh, jnp.asarray(dl)),
        frame_ids=shard_rows(mesh, jnp.asarray(fid)),
        live=shard_rows(mesh, jnp.asarray(live)),
        row_base=shard_rows(mesh, jnp.asarray(base)),
        avgdl=full.avgdl,
        wnorm=shard_rows(mesh, jnp.asarray(wn)),
        doc_rows_rev=shard_rows(mesh, jnp.asarray(dr_rev)),
        wnorm_rev=shard_rows(mesh, jnp.asarray(wn_rev)),
        fwd_tids=ftids_sh,
        fwd_wnorm=fwn_sh,
        fwd_fused=ffused_sh,
        pk_chunks=pk_sh,
        pk_chunks_rev=pkr_sh,
        chunk_base=cbase_sh,
        chunk_counts=ccnt_sh,
        max_df=((max_df + 127) // 128) * 128,
        pk_qb=pk_qb,
        pk_max_chunks=pk_maxc,
        fwd_width=fwd_width,
    )


def _local_bm25(term_ids, lex_shard, avgdl, w, mode="any"):
    """[B, Q] term ids -> [B, N_local] scores on one shard (arrays have no shard dim).

    "all" mode (FTS5 implicit-AND parity, ops/bm25.py) masks locally: a document lives
    wholly on one shard, so the per-shard matched-term count is the global one.
    """
    doc_rows, tfs, offsets, idf, doc_len, live = lex_shard
    b, q = term_ids.shape
    n_local = doc_len.shape[0]
    valid_term = term_ids >= 0
    safe = jnp.maximum(term_ids, 0)
    off = jnp.take(offsets, safe)
    length = jnp.take(offsets, safe + 1) - off
    j = jnp.arange(w, dtype=jnp.int32)[None, None, :]
    valid = valid_term[..., None] & (j < length[..., None])
    pos = off[..., None] + jnp.minimum(j, jnp.maximum(length[..., None] - 1, 0))
    rows = jnp.take(doc_rows, pos)
    tf = jnp.take(tfs, pos)
    dl = jnp.take(doc_len, rows)
    idf_q = jnp.take(idf, safe)[..., None]
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    contrib = jnp.where(valid, idf_q * (tf * (BM25_K1 + 1.0)) / jnp.maximum(denom, 1e-9), 0.0)
    flat_rows = rows.reshape(b, q * w)
    scores = jnp.zeros((b, n_local), jnp.float32)
    scores = scores.at[jnp.arange(b)[:, None], flat_rows].add(
        contrib.reshape(b, q * w), mode="drop"
    )
    if mode == "all":
        hits = jnp.zeros((b, n_local), jnp.float32)
        hits = hits.at[jnp.arange(b)[:, None], flat_rows].add(
            jnp.where(valid, 1.0, 0.0).reshape(b, q * w), mode="drop"
        )
        n_terms = jnp.sum(valid_term, axis=1, keepdims=True).astype(jnp.float32)
        scores = jnp.where(hits >= n_terms, scores, 0.0)
    return jnp.where(live[None, :], scores, 0.0)


# The Pallas kernel double-buffers [q2, w2] rows+weights scratch in VMEM
# (8 * q2 * w2 bytes) plus the merge plane's temporaries; cap the scratch pair
# at 4 MiB of the ~16 MiB scoped VMEM so the merge working set always fits.
# Budgeted snapshots (dma_window <= 32K at q2=16) pass; an UNBUDGETED corpus
# with a very frequent term falls back to the XLA candidate lane instead of
# failing Mosaic compilation.
_PALLAS_MAX_PLANE_ELEMS = 512 * 1024


def _resolve_lex_backend(lex: "ShardedLexIndex", backend: str, q2: int = 16) -> str:
    """Static per-trace choice of the local BM25 lane implementation.

    "auto" prefers the candidate-set pipeline (no [B, N_local] score plane, no
    scatter — measured ~2 orders of magnitude faster at 1M docs, see
    docs/benchmarks.md): the Pallas VMEM kernel on TPU, its pure-XLA harness
    elsewhere. Snapshots without precomputed weights fall back to the scatter
    lane; planes too wide for VMEM fall back to the XLA candidate lane.
    """
    if backend != "auto":
        return backend
    if lex.wnorm is None:
        return "scatter"
    if jax.default_backend() != "tpu":
        return "candidates"
    if lex.doc_rows_rev is None:
        return "candidates"
    from wax_tpu.index.lex import dma_window

    # the kernel rounds the term-slot count up to the next power of two with a
    # floor of 2 (bm25_candidates_pallas: next_pow2(max(q, 2))) — guard on what
    # it ALLOCATES, not the raw q2
    q2_pow2 = 2
    while q2_pow2 < q2:
        q2_pow2 *= 2
    if q2_pow2 * dma_window(int(lex.max_df)) > _PALLAS_MAX_PLANE_ELEMS:
        return "candidates"
    return "candidates_pallas"


def _local_bm25_candidates_topk(tids, doc_rows, wnorm, offsets, idf, rows_rev, wn_rev,
                                kk, w, mode, pallas: bool,
                                fwd_tids=None, fwd_wnorm=None, rescore: bool = False,
                                chunked=None, fwd_width: int = 0, fwd_fused=None):
    """Per-shard candidate-set BM25 local top-k: (vals, local_rows), -1 rows dead.

    With `rescore` (static), candidates are generated OR-mode ("count"-ranked for
    AND queries) from the budgeted postings and the local top-F is exactly
    rescored against the shard's forward index — AND filtering then uses exact
    counts (ops/bm25_rescore.py). `chunked` (optional tuple of
    (pk, pk_rev, chunk_base, chunk_counts, qb, max_chunks)) switches candidate
    generation to the packed chunked kernel (ops/bm25_chunked_pallas.py)."""
    gen_mode = ("count" if mode == "all" else "any") if rescore else mode
    if rescore and pallas:
        from wax_tpu.ops.bm25_candidates_pallas import _SEL_LEVELS
        from wax_tpu.ops.bm25_rescore import rescore_topk

        # in-kernel selection: sel*1024 candidates, no [B, Q2*W2] plane in HBM
        if chunked is not None:
            from wax_tpu.ops.bm25_chunked_pallas import chunked_candidates_sel

            pk, pkr, cbase, ccnt, pk_qb, pk_maxc = chunked
            cand_rows, keys = chunked_candidates_sel(
                tids, pk, pkr, cbase, ccnt, qb=pk_qb, max_chunks=pk_maxc,
                mode=gen_mode, sel=_SEL_LEVELS,
            )
            f = int(min(max(4 * kk, 256), keys.shape[-1]))
            _, cpos = jax.lax.top_k(keys, f)
            crows = jnp.take_along_axis(cand_rows, cpos, axis=-1)
        else:
            cand_rows, keys = candidate_scores_pallas(
                tids, doc_rows, wnorm, offsets, idf, rows_rev, wn_rev,
                max_df=w, mode=gen_mode, sel=_SEL_LEVELS,
            )
            f = int(min(max(4 * kk, 256), keys.shape[-1]))
            # plain top_k: wide_topk measured slower at this 3072-wide key plane
            _, cpos = jax.lax.top_k(keys, f)
            crows = jnp.take_along_axis(cand_rows, cpos, axis=-1)
        return rescore_topk(tids, crows, fwd_tids, fwd_wnorm, idf, kk, mode,
                            fwd_width=fwd_width, fwd_fused=fwd_fused)
    if pallas:
        rows, scores = candidate_scores_pallas(
            tids, doc_rows, wnorm, offsets, idf, rows_rev, wn_rev, max_df=w, mode=gen_mode
        )
    else:
        rows, scores = candidate_scores_sorted(tids, doc_rows, wnorm, offsets, idf, w, gen_mode)
    if rescore:
        from wax_tpu.ops.bm25_rescore import rescore_topk

        f = int(min(max(4 * kk, 256), scores.shape[-1]))
        cvals, cpos = wide_topk(scores, f, exact=False)
        crows = jnp.where(
            cvals > NEG_INF * 0.5, jnp.take_along_axis(rows, cpos, axis=-1), -1
        )
        return rescore_topk(tids, crows, fwd_tids, fwd_wnorm, idf, kk, mode,
                            fwd_width=fwd_width, fwd_fused=fwd_fused)
    vals, pos = wide_topk(scores, kk)
    sel = jnp.take_along_axis(rows, pos, axis=-1)
    ok = vals > NEG_INF * 0.5
    return jnp.where(ok, vals, NEG_INF), jnp.where(ok, sel, -1)


@functools.lru_cache(maxsize=128)
def _bm25_program(mesh: Mesh, k: int, mode: str, backend: str, w: int, rescore: bool,
                  chunked: bool = False, pk_qb: int = 0, pk_maxc: int = 0,
                  fwd_width: int = 0, use_fused: bool = False):
    """Jitted sharded-BM25 program, memoized per static config.

    Eager shard_map dispatches its body op-by-op — for the candidate-set merge
    network (~60 vectorized stages) that is ~60 s of per-op round-trips on the CPU
    mesh vs ~2 s compiled; memoizing here gives every caller (tests, orchestrator,
    bench) stable jit identity and one compile per (mesh, k, mode, backend, w).
    """
    rows_spec = P(corpus_axes(mesh))

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P()) + (rows_spec,) * 17,
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run2(tids, avgdl, doc_rows, tfs, offsets, idf, doc_len, live, frame_ids, wnorm,
             drr, wnr, ftids, fwn, ffz, pk, pkr, cbase, ccnt):
        n_local = doc_len.shape[1]
        kk = min(k, n_local)
        if backend == "scatter":
            shard = (doc_rows[0], tfs[0], offsets[0], idf[0], doc_len[0], live[0])
            scores = _local_bm25(tids, shard, avgdl, w, mode=mode)
            vals, rows = jax.lax.top_k(jnp.where(scores > 0, scores, NEG_INF), kk)
        else:
            vals, rows = _local_bm25_candidates_topk(
                tids, doc_rows[0], wnorm[0], offsets[0], idf[0], drr[0], wnr[0], kk, w, mode,
                pallas=backend == "candidates_pallas",
                fwd_tids=ftids[0], fwd_wnorm=fwn[0], rescore=rescore,
                chunked=(pk[0], pkr[0], cbase[0], ccnt[0], pk_qb, pk_maxc)
                if chunked else None, fwd_width=fwd_width,
                fwd_fused=ffz[0] if use_fused else None,
            )
        gfids = jnp.where(vals > NEG_INF * 0.5, jnp.take(frame_ids[0], jnp.maximum(rows, 0)), -1)
        return merge_topk_across_mesh(vals, gfids.astype(jnp.int32), k, mesh)

    return run2


def sharded_bm25_topk(
    term_ids, lex: ShardedLexIndex, k: int, mesh: Mesh, mode: str = "any", backend: str = "auto"
):
    """Distributed BM25 top-k: per-shard scoring + ICI merge.

    mode: "any" (OR) or "all" (implicit-AND, FTS5 parity) — same semantics as the
    single-chip ops/bm25.py:bm25_topk. backend: "auto" | "scatter" | "candidates" |
    "candidates_pallas" (see _resolve_lex_backend).
    """
    backend = _resolve_lex_backend(lex, backend, q2=int(term_ids.shape[-1]))
    rescore = backend != "scatter" and lex.fwd_tids is not None
    chunked = (
        rescore and backend == "candidates_pallas" and lex.pk_chunks is not None
    )
    run2 = _bm25_program(mesh, int(k), mode, backend, int(lex.max_df), rescore,
                         chunked, lex.pk_qb, lex.pk_max_chunks, lex.fwd_width,
                         use_fused=rescore and lex.fwd_fused is not None)
    wn = lex.wnorm if lex.wnorm is not None else lex.tfs
    drr = lex.doc_rows_rev if lex.doc_rows_rev is not None else lex.doc_rows
    wnr = lex.wnorm_rev if lex.wnorm_rev is not None else wn
    s = lex.doc_len.shape[0]
    # unused when rescore is False; tiny dummies keep the shard_map arity static
    ftids = lex.fwd_tids if rescore else jnp.full((s, 1, 128), -1, jnp.int32)
    fwn = lex.fwd_wnorm if rescore else jnp.zeros((s, 1, 128), jnp.float32)
    pk, pkr, cbase, ccnt = _chunked_args(lex, chunked, s)
    ffz = lex.fwd_fused if (rescore and lex.fwd_fused is not None) else jnp.full(
        (s, 1, 128), -1, jnp.int32
    )
    return run2(
        term_ids, lex.avgdl, lex.doc_rows, lex.tfs, lex.offsets, lex.idf, lex.doc_len,
        lex.live, lex.frame_ids, wn, drr, wnr, ftids, fwn, ffz, pk, pkr, cbase, ccnt,
    )


def _chunked_args(lex: ShardedLexIndex, chunked: bool, s: int):
    """Chunked-kernel shard arrays, or tiny dummies keeping shard_map arity static."""
    if chunked:
        return lex.pk_chunks, lex.pk_chunks_rev, lex.chunk_base, lex.chunk_counts
    dummy_pk = jnp.full((s, 1024), jnp.int32(2**31 - 1))
    dummy_c = jnp.zeros((s, 1), jnp.int32)
    return dummy_pk, dummy_pk, dummy_c, dummy_c


@functools.lru_cache(maxsize=128)
def _hybrid_program(
    mesh: Mesh,
    k: int,
    fetch: int,
    w: int,
    use_chunkmax: bool,
    use_selkernel: bool,
    lex_backend: str,
    w_dense: float,
    w_bm25: float,
    rrf_k: float,
    lex_rescore: bool,
    lex_chunked: bool = False,
    pk_qb: int = 0,
    pk_maxc: int = 0,
    fwd_width: int = 0,
    use_fused: bool = False,
):
    """Jitted one-program hybrid, memoized per static config (see _bm25_program)."""
    rows_spec = P(corpus_axes(mesh))

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()) + (rows_spec,) * 20,
        out_specs=(P(), P()),
        check_vma=False,
    )
    def run(q, tids, avgdl, emb, d_fids, d_bias, doc_rows, tfs, offsets, idf, doc_len,
            live, l_fids, wnorm, drr, wnr, ftids, fwn, ffz, pk, pkr, cbase, ccnt):
        b = q.shape[0]
        # dense lane: chunkmax (DMA rescore, never materializes [B, N_local] in
        # HBM) once the local shard is large enough for its rescore traffic to
        # win — 6.1 vs 9.1 ms at 1M f32 (docs/benchmarks.md); below the threshold
        # blockmax's single materialized pass is faster
        kk_d = min(fetch, emb.shape[0])
        if use_chunkmax:
            from wax_tpu.ops.chunkmax_scan import chunkmax_scan_topk

            dv, drows = chunkmax_scan_topk(q.astype(jnp.float32), emb, d_bias[None, :], kk_d)
        elif use_selkernel:
            # accumulate-then-select packed kernel — the SAME backend the flat
            # engine's auto policy serves standalone at these shard sizes
            # (ops/flat_scan.py: 333.7us vs blockmax 677 at 100K x 384, overlap
            # 0.9992); measured 0.68 -> 0.33 ms of the 100K hybrid (round 5)
            from wax_tpu.ops.flat_scan import _TB, _packed_sel_scan_topk, _pick_tn

            tb = min(_TB, ((b + 7) // 8) * 8)
            b_pad = ((b + tb - 1) // tb) * tb
            qs = q.astype(emb.dtype)
            if b_pad != b:
                qs = jnp.pad(qs, ((0, b_pad - b), (0, 0)))
            dv, drows = _packed_sel_scan_topk(
                qs, emb, d_bias[None, :], kk_d, tb, _pick_tn(emb.shape[0]),
                jax.default_backend() == "cpu",
            )
            dv, drows = dv[:b], drows[:b]
        else:
            scores_d = jax.lax.dot_general(
                q.astype(emb.dtype), emb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + d_bias[None, :]
            dv, drows = blockmax_topk(scores_d, kk_d)
        dfid = jnp.where(dv > NEG_INF * 0.5, jnp.take(d_fids, jnp.maximum(drows, 0)), -1)
        dv_g, dfid_g = merge_topk_across_mesh(dv, dfid, fetch, mesh)
        # bm25 lane
        kk_l = min(fetch, doc_len.shape[1])
        if lex_backend == "scatter":
            shard = (doc_rows[0], tfs[0], offsets[0], idf[0], doc_len[0], live[0])
            scores_l = _local_bm25(tids, shard, avgdl, w)
            lv, lrows = jax.lax.top_k(jnp.where(scores_l > 0, scores_l, NEG_INF), kk_l)
        else:
            lv, lrows = _local_bm25_candidates_topk(
                tids, doc_rows[0], wnorm[0], offsets[0], idf[0], drr[0], wnr[0], kk_l, w, "any",
                pallas=lex_backend == "candidates_pallas",
                fwd_tids=ftids[0], fwd_wnorm=fwn[0], rescore=lex_rescore,
                chunked=(pk[0], pkr[0], cbase[0], ccnt[0], pk_qb, pk_maxc)
                if lex_chunked else None, fwd_width=fwd_width,
                fwd_fused=ffz[0] if use_fused else None,
            )
        lfid = jnp.where(lv > NEG_INF * 0.5, jnp.take(l_fids[0], jnp.maximum(lrows, 0)), -1)
        lv_g, lfid_g = merge_topk_across_mesh(lv, lfid.astype(jnp.int32), fetch, mesh)

        # on-device weighted RRF over the two global rankings (rank = position + 1)
        ranks = jnp.arange(1, fetch + 1, dtype=jnp.float32)[None, :]
        inc_d = jnp.where(dfid_g >= 0, w_dense / (rrf_k + ranks), 0.0)
        inc_l = jnp.where(lfid_g >= 0, w_bm25 / (rrf_k + ranks), 0.0)
        # merge candidate sets by frame id: concat then segment-combine via sort
        all_fid = jnp.concatenate([dfid_g, lfid_g], axis=1)
        all_inc = jnp.concatenate([inc_d, inc_l], axis=1)
        order = jnp.argsort(all_fid, axis=1)
        fid_s = jnp.take_along_axis(all_fid, order, axis=1)
        inc_s = jnp.take_along_axis(all_inc, order, axis=1)
        same = jnp.concatenate(
            [jnp.zeros_like(fid_s[:, :1], bool), fid_s[:, 1:] == fid_s[:, :-1]], axis=1
        )
        # two-entry groups at most (one per lane): fold the duplicate into its left neighbor
        folded = inc_s + jnp.where(
            jnp.concatenate([same[:, 1:], jnp.zeros_like(same[:, :1])], axis=1),
            jnp.concatenate([inc_s[:, 1:], jnp.zeros_like(inc_s[:, :1])], axis=1),
            0.0,
        )
        score = jnp.where(same | (fid_s < 0), NEG_INF, folded)
        fv, pos = jax.lax.top_k(score, k)
        ffid = jnp.take_along_axis(fid_s, pos, axis=1)
        ffid = jnp.where(fv > NEG_INF * 0.5, ffid, -1)
        return fv, ffid

    return run


def sharded_hybrid_topk(
    queries,
    term_ids,
    dense: ShardedDenseIndex,
    lex: ShardedLexIndex,
    k: int,
    mesh: Mesh,
    w_dense: float = 0.5,
    w_bm25: float = 0.5,
    rrf_k: float = 60.0,
    lex_backend: str = "auto",
):
    """One-program hybrid search: both lanes + ICI merges + on-device RRF fusion.

    Returns (fused_scores [B, k], frame_ids [B, k]).
    """
    n_shards = corpus_shards(mesh)
    lex_backend = _resolve_lex_backend(lex, lex_backend, q2=int(term_ids.shape[-1]))
    fetch = max(2 * k, 16)
    # static dense-lane backend choice: chunkmax needs a prefix-live (contiguous)
    # shard, 2048-aligned local rows, and a rescore-friendly fetch size
    local_rows = dense.emb.shape[0] // n_shards
    use_chunkmax = (
        dense.contiguous
        and local_rows % 2048 == 0
        and local_rows >= _CHUNKMAX_MIN_LOCAL_ROWS
        and min(fetch, local_rows) <= 100
    )
    # mid-size shards: the packed select kernel (the flat engine's own auto pick
    # at 64K-512K rows; approximate-class ranking, overlap 0.9992 at 100K)
    use_selkernel = (
        not use_chunkmax
        and _SELKERNEL_MIN_LOCAL_ROWS <= local_rows
        and min(fetch, local_rows) <= 100
    )
    lex_rescore = lex_backend != "scatter" and lex.fwd_tids is not None
    lex_chunked = (
        lex_rescore and lex_backend == "candidates_pallas" and lex.pk_chunks is not None
    )
    run = _hybrid_program(
        mesh, int(k), fetch, int(lex.max_df), use_chunkmax, use_selkernel, lex_backend,
        float(w_dense), float(w_bm25), float(rrf_k), lex_rescore,
        lex_chunked, lex.pk_qb, lex.pk_max_chunks, lex.fwd_width,
        use_fused=lex_rescore and lex.fwd_fused is not None,
    )
    wn = lex.wnorm if lex.wnorm is not None else lex.tfs
    drr = lex.doc_rows_rev if lex.doc_rows_rev is not None else lex.doc_rows
    wnr = lex.wnorm_rev if lex.wnorm_rev is not None else wn
    s = lex.doc_len.shape[0]
    ftids = lex.fwd_tids if lex_rescore else jnp.full((s, 1, 128), -1, jnp.int32)
    fwn = lex.fwd_wnorm if lex_rescore else jnp.zeros((s, 1, 128), jnp.float32)
    pk, pkr, cbase, ccnt = _chunked_args(lex, lex_chunked, s)
    ffz = lex.fwd_fused if (lex_rescore and lex.fwd_fused is not None) else jnp.full(
        (s, 1, 128), -1, jnp.int32
    )
    return run(
        queries, term_ids, lex.avgdl,
        dense.emb, dense.frame_ids, dense.bias,
        lex.doc_rows, lex.tfs, lex.offsets, lex.idf, lex.doc_len, lex.live, lex.frame_ids,
        wn, drr, wnr, ftids, fwn, ffz, pk, pkr, cbase, ccnt,
    )
