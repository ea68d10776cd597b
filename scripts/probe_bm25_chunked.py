"""Slope-time the chunked packed BM25 candidate lane vs the round-4 sel lane.

Measures, on the bench synthetic corpus (Zipf postings, impact-budgeted):
  sel_old      — candidate_scores_pallas(sel) alone (round-4 kernel)
  sel_chunked  — chunked_candidates_sel alone (packed single-plane kernel)
  lane_old     — sel_old + top_k(F) + forward-index rescore
  lane_chunked — sel_chunked + top_k(F) + forward-index rescore

    python scripts/probe_bm25_chunked.py [N] [BUDGET] [F]
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

from bench import _make_timer, _synth_sharded_lex, robust_slope
from wax_tpu.ops.bm25_candidates_pallas import _SEL_LEVELS, candidate_scores_pallas
from wax_tpu.ops.bm25_chunked_pallas import chunked_candidates_sel
from wax_tpu.ops.bm25_rescore import rescore_topk

def _argi(i: int, default: int) -> int:
    try:
        return int(sys.argv[i])
    except (IndexError, ValueError):
        return default


N = _argi(1, 1_048_576)
BUDGET = _argi(2, 3072)
F = _argi(3, 256)
T, B, QT, K = 16384, 256, 16, 10


_ARRAY_FIELDS = (
    "doc_rows", "tfs", "offsets", "idf", "doc_len", "frame_ids", "live", "row_base",
    "avgdl", "wnorm", "doc_rows_rev", "wnorm_rev", "fwd_tids", "fwd_wnorm", "fwd_fused",
    "pk_chunks", "pk_chunks_rev", "chunk_base", "chunk_counts",
)
_STATIC_FIELDS = ("max_df", "pk_qb", "pk_max_chunks", "fwd_width")


def _cached_synth(n, t, budget):
    """Disk-cache the synthetic corpus (host build is ~7 min at 1M on this VM)."""
    from wax_tpu.parallel.sharded_hybrid import ShardedLexIndex

    cache = f"/tmp/wax_synth_{n}_{t}_{budget}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        kw = {k: jnp.asarray(z[k]) for k in _ARRAY_FIELDS if k in z.files}
        kw.update({k: int(z[k]) for k in _STATIC_FIELDS})
        if "fwd_fused" not in z.files and "fwd_tids" in z.files:
            from wax_tpu.index.lex import fuse_forward

            kw["fwd_fused"] = jnp.asarray(
                fuse_forward(z["fwd_tids"][0], z["fwd_wnorm"][0], int(z["fwd_width"]))[None]
            )
        return ShardedLexIndex(**kw)
    lex = _synth_sharded_lex(n, t, budget)
    arrs = {
        k: np.asarray(getattr(lex, k))
        for k in _ARRAY_FIELDS
        if getattr(lex, k) is not None
    }
    arrs.update({k: getattr(lex, k) for k in _STATIC_FIELDS})
    np.savez(cache, **arrs)
    return lex


def main() -> None:
    lex = _cached_synth(N, T, BUDGET)
    assert lex.pk_chunks is not None, "budget did not truncate; nothing to probe"
    max_df = lex.max_df
    rng = np.random.default_rng(7)
    tids0 = jnp.asarray(rng.integers(0, T, (B, QT)).astype(np.int32))

    def sel_old(tids, dr, wn, off, idf, drr, wnr):
        return candidate_scores_pallas(tids, dr, wn, off, idf, drr, wnr,
                                       max_df=max_df, mode="any", sel=_SEL_LEVELS)

    def sel_chunked(tids, pk, pkr, cb, cc):
        return chunked_candidates_sel(tids, pk, pkr, cb, cc, qb=lex.pk_qb,
                                      max_chunks=lex.pk_max_chunks, mode="any")

    def lane_fused(gen, n_gen_args):
        def fn(tids, *arrs):
            gen_args, (fz, idf) = arrs[:n_gen_args], arrs[n_gen_args:]
            rows, keys = gen(tids, *gen_args)
            _, cpos = jax.lax.top_k(keys, F)
            crows = jnp.take_along_axis(rows, cpos, axis=-1)
            return rescore_topk(tids, crows, None, None, idf, K, "any", fwd_fused=fz)
        return fn

    def lane(gen, n_gen_args):
        # forward-index arrays ride as ARGUMENTS (closing over them bakes 1M-row
        # constants into the executable — the remote compile rejects the payload)
        def fn(tids, *arrs):
            gen_args, (ft, fw, idf) = arrs[:n_gen_args], arrs[n_gen_args:]
            rows, keys = gen(tids, *gen_args)
            _, cpos = jax.lax.top_k(keys, F)
            crows = jnp.take_along_axis(rows, cpos, axis=-1)
            return rescore_topk(tids, crows, ft, fw, idf, K, "any")
        return fn

    old_args = (lex.doc_rows[0], lex.wnorm[0], lex.offsets[0], lex.idf[0],
                lex.doc_rows_rev[0], lex.wnorm_rev[0])
    ch_args = (lex.pk_chunks[0], lex.pk_chunks_rev[0], lex.chunk_base[0],
               lex.chunk_counts[0])
    res_args = (lex.fwd_tids[0], lex.fwd_wnorm[0], lex.idf[0])

    def chained(fn, out_pick):
        @jax.jit
        def run(q, iters, tids, *arrs):
            def body(i, carry):
                q, acc = carry
                t2 = (tids + jnp.int32(i)) % T
                v0 = out_pick(fn(t2, *arrs))
                return q + v0 * 1e-12, acc + v0
            return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]
        return run

    def sel_topk(tids, *arrs):
        rows, keys = sel_chunked(tids, *arrs)
        kv, cpos = jax.lax.top_k(keys, F)
        return jnp.take_along_axis(rows, cpos, axis=-1) + kv

    fwd_width = lex.fwd_width

    def rescore_only(tids, crows, ft, fw, idf):
        # perturb the candidate rows with the (already perturbed) term ids so the
        # gather can't be hoisted out of the timing loop
        crows = (crows + tids[:, :1]) % jnp.int32(N)
        return rescore_topk(tids, crows, ft, fw, idf, K, "any", fwd_width=fwd_width)

    fz0 = lex.fwd_fused[0] if lex.fwd_fused is not None else None

    def rescore_fused(tids, crows, fz, idf):
        crows = (crows + tids[:, :1]) % jnp.int32(N)
        return rescore_topk(tids, crows, None, None, idf, K, "any", fwd_fused=fz)

    def rescore_nopack(tids, crows, ft, fw, idf):
        crows = (crows + tids[:, :1]) % jnp.int32(N)
        return rescore_topk(tids, crows, ft, fw, idf, K, "any")

    def rescore_q1(tids, crows, ft, fw, idf):
        crows = (crows + tids[:, :1]) % jnp.int32(N)
        return rescore_topk(tids[:, :1], crows, ft, fw, idf, K, "any",
                            fwd_width=fwd_width)

    def gather_only(tids, crows, ft, fw, idf):
        crows = (crows + tids[:, :1]) % jnp.int32(N)
        g1 = jnp.take(ft, crows, axis=0)  # [B, F, L]
        g2 = jnp.take(fw, crows, axis=0)
        return (jnp.sum(g1).astype(jnp.float32) * 1e-9 + jnp.sum(g2) * 1e-9,)

    crows0 = jnp.asarray(rng.integers(0, N, (B, F)).astype(np.int32))

    configs = [
        ("sel_old", chained(sel_old, lambda o: o[1][0, 0].astype(jnp.float32)), old_args),
        ("sel_chunked", chained(sel_chunked, lambda o: o[1][0, 0].astype(jnp.float32)), ch_args),
        ("sel+topk", chained(sel_topk, lambda o: o[0, 0].astype(jnp.float32)), ch_args),
        ("rescore_only", chained(rescore_only, lambda o: o[0][0, 0]),
         (crows0,) + res_args),
        ("rescore_nopack", chained(rescore_nopack, lambda o: o[0][0, 0]),
         (crows0,) + res_args),
        ("rescore_fused", chained(rescore_fused, lambda o: o[0][0, 0]),
         (crows0, fz0, lex.idf[0])),
        ("rescore_q1", chained(rescore_q1, lambda o: o[0][0, 0]),
         (crows0,) + res_args),
        ("gather_only", chained(gather_only, lambda o: o[0]),
         (crows0,) + res_args),
        ("lane_old", chained(lane(sel_old, len(old_args)), lambda o: o[0][0, 0]),
         old_args + res_args),
        ("lane_chunked", chained(lane(sel_chunked, len(ch_args)), lambda o: o[0][0, 0]),
         ch_args + res_args),
        ("lane_fused", chained(lane_fused(sel_chunked, len(ch_args)), lambda o: o[0][0, 0]),
         ch_args + (fz0, lex.idf[0])),
    ]
    names = sys.argv[4].split(",") if len(sys.argv) > 4 else None
    q0 = jnp.zeros((1,), jnp.float32)
    for name, run, arrs in configs:
        if names and name not in names:
            continue
        float(run(q0, 1, tids0, *arrs))
        ms, info = robust_slope(
            _make_timer(run, q0, tids0, *arrs), 3, 13, 23, floor_ms=0.2, cap_ms=4000.0
        )
        print(f"{name:14s} {ms:8.3f} ms/batch  dispersion={info.get('dispersion')}", flush=True)


if __name__ == "__main__":
    main()
