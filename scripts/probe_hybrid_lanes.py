"""Decompose the fused 1M hybrid: dense lane vs BM25 candidate lane vs full fusion.

Times three slope-measured configs on the bench.py synthetic corpus (same shapes as
the hybrid_1m driver config): (a) sharded dense top-k alone, (b) sharded candidate
BM25 alone, (c) the fused hybrid. Their deltas locate the remaining time at 1M.

    python scripts/probe_hybrid_lanes.py [N] [BUDGET]
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
from jax.sharding import Mesh

from bench import _make_timer, _unit_data, robust_slope
from probe_bm25_chunked import _cached_synth
from wax_tpu.parallel.sharded_hybrid import (
    ShardedLexIndex,
    sharded_bm25_topk,
    sharded_hybrid_topk,
)
from wax_tpu.parallel.sharded_scan import ShardedDenseIndex, sharded_flat_scan_topk

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 3072
D, B, K, T, QT = 384, 256, 10, 16384, 16


def main() -> None:
    dtype = "bfloat16" if N >= 1_000_000 else "float32"  # mirror bench_hybrid_1m
    emb, q0 = _unit_data(N, D, B, seed=3)
    if dtype == "bfloat16":
        emb = emb.astype(jnp.bfloat16)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    lex = _cached_synth(N, T, BUDGET)
    max_df = lex.max_df
    dense = ShardedDenseIndex(
        emb=emb,
        frame_ids=jnp.asarray(np.arange(N, dtype=np.int32)),
        bias=jnp.zeros((N,), jnp.float32),
        contiguous=True,
    )
    rng = np.random.default_rng(7)
    tids0 = jnp.asarray(rng.integers(0, T, (B, QT)).astype(np.int32))
    lex_arrs = (
        lex.doc_rows, lex.tfs, lex.offsets, lex.idf, lex.doc_len, lex.live,
        lex.frame_ids, lex.row_base, lex.wnorm, lex.doc_rows_rev, lex.wnorm_rev,
        lex.fwd_tids, lex.fwd_wnorm, lex.fwd_fused,
        lex.pk_chunks, lex.pk_chunks_rev, lex.chunk_base, lex.chunk_counts,
    )

    def rebuild_lex(ldr, ltf, loff, lidf, ldl, llive, lfid, lbase, lwn, ldrr, lwnr,
                    lft, lfw, lfz, lpk, lpkr, lcb, lcc):
        return ShardedLexIndex(
            doc_rows=ldr, tfs=ltf, offsets=loff, idf=lidf, doc_len=ldl,
            frame_ids=lfid, live=llive, row_base=lbase, avgdl=lex.avgdl,
            wnorm=lwn, doc_rows_rev=ldrr, wnorm_rev=lwnr,
            fwd_tids=lft, fwd_wnorm=lfw, fwd_fused=lfz,
            pk_chunks=lpk, pk_chunks_rev=lpkr, chunk_base=lcb, chunk_counts=lcc,
            max_df=max_df, pk_qb=lex.pk_qb, pk_max_chunks=lex.pk_max_chunks,
            fwd_width=lex.fwd_width,
        )

    with mesh:
        @jax.jit
        def dense_only(q, iters_, demb, dfid, dbias):
            dn = ShardedDenseIndex(emb=demb, frame_ids=dfid, bias=dbias, contiguous=True)

            def body(i, carry):
                q, acc = carry
                v, _ = sharded_flat_scan_topk(q, dn, K, mesh)
                return q + v[:, :1] * 1e-9, acc + v[0, 0]

            return jax.lax.fori_loop(0, iters_, body, (q, jnp.float32(0)))[1]

        @jax.jit
        def dense_chunkmax(q, iters_, demb, dfid, dbias):
            from wax_tpu.ops.chunkmax_scan import chunkmax_scan_topk

            def body(i, carry):
                q, acc = carry
                v, _ = chunkmax_scan_topk(q.astype(jnp.float32), demb, dbias[None, :], 20)
                return q + v[:, :1] * 1e-9, acc + v[0, 0]

            return jax.lax.fori_loop(0, iters_, body, (q, jnp.float32(0)))[1]

        @jax.jit
        def bm25_only(q, iters_, tids, *arrs):
            lx = rebuild_lex(*arrs)

            def body(i, carry):
                q, acc = carry
                t2 = (tids + jnp.int32(i)) % T
                v, _ = sharded_bm25_topk(t2, lx, K, mesh)
                return q + v[:, :1] * 1e-9, acc + v[0, 0]

            return jax.lax.fori_loop(0, iters_, body, (q, jnp.float32(0)))[1]

        @jax.jit
        def fused(q, iters_, tids, demb, dfid, dbias, *arrs):
            dn = ShardedDenseIndex(emb=demb, frame_ids=dfid, bias=dbias, contiguous=True)
            lx = rebuild_lex(*arrs)

            def body(i, carry):
                q, acc = carry
                t2 = (tids + jnp.int32(i)) % T
                v, _ = sharded_hybrid_topk(q, t2, dn, lx, K, mesh)
                return q + v[:, :1] * 1e-9, acc + v[0, 0]

            return jax.lax.fori_loop(0, iters_, body, (q, jnp.float32(0)))[1]

        names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
        for name, fn, args in (
            ("dense", dense_only, (q0, 1, dense.emb, dense.frame_ids, dense.bias)),
            ("dense_chunkmax", dense_chunkmax, (q0, 1, dense.emb, dense.frame_ids, dense.bias)),
            ("bm25", bm25_only, (q0, 1, tids0) + lex_arrs),
            ("fused", fused, (q0, 1, tids0, dense.emb, dense.frame_ids, dense.bias) + lex_arrs),
        ):
            if names and name not in names:
                continue
            float(fn(*args))
            timer_args = args[:1] + args[2:]
            ms, info = robust_slope(
                _make_timer(fn, *timer_args), 3, 13, 23, floor_ms=0.3, cap_ms=4000.0
            )
            print(f"{name}: {ms:.3f} ms/batch attempts={info['attempts']}", flush=True)


if __name__ == "__main__":
    main()
