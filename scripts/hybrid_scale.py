"""Fused hybrid (dense + BM25 + RRF, one XLA program) at 1M docs on ONE chip.

Extends docs/benchmarks.md's 100K fused-hybrid row by 10x: 1M x 384 dense lane
(blockmax inside the sharded program) + synthetic Zipf CSR postings with an
impact-style per-term cap (the production `lex_postings_budget` regime), 16 query
terms, top-10, slope-timed with bench.robust_slope.

    python scripts/hybrid_scale.py [N] [BUDGET]
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
from wax_tpu.parallel.sharded_hybrid import ShardedLexIndex, sharded_hybrid_topk
from wax_tpu.parallel.sharded_scan import ShardedDenseIndex

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
D, B, K, T, QT = 384, 256, 10, 16384, 16


def main() -> None:
    emb, q0 = _unit_data(N, D, B, seed=9)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))

    rng = np.random.default_rng(5)
    raw_df = (1.0 / np.arange(1, T + 1)) ** 0.7
    df = np.minimum((raw_df / raw_df.sum() * 64 * N).astype(np.int64) + 1, BUDGET)
    max_df = int(((df.max() + 127) // 128) * 128)
    offsets = np.zeros(T + 1, np.int64)
    offsets[1:] = np.cumsum(df)
    total = int(offsets[-1])
    doc_rows = rng.integers(0, N, total).astype(np.int32)
    tfs = rng.integers(1, 5, total).astype(np.float32)
    idf = np.log(1.0 + (N - df + 0.5) / (df + 0.5)).astype(np.float32)

    lex = ShardedLexIndex(
        doc_rows=jnp.asarray(doc_rows[None, :]),
        tfs=jnp.asarray(tfs[None, :]),
        offsets=jnp.asarray(offsets[None, :].astype(np.int32)),
        idf=jnp.asarray(idf[None, :]),
        doc_len=jnp.asarray(np.full((1, N), 64.0, np.float32)),
        frame_ids=jnp.asarray(np.arange(N, dtype=np.int32)[None, :]),
        live=jnp.asarray(np.ones((1, N), bool)),
        row_base=jnp.zeros(1, jnp.int32),
        avgdl=jnp.float32(64.0),
        max_df=max_df,
    )
    dense = ShardedDenseIndex(
        emb=emb,
        frame_ids=jnp.asarray(np.arange(N, dtype=np.int32)),
        bias=jnp.zeros((N,), jnp.float32),
        contiguous=True,  # fully-live synthetic corpus: enables the chunkmax lane
    )
    tids0 = jnp.asarray(rng.integers(0, T, (B, QT)).astype(np.int32))

    with mesh:

        @jax.jit
        def chained(q, iters, tids, demb, dfid, dbias, ldr, ltf, loff, lidf, ldl, llive, lfid, lbase):
            dn = ShardedDenseIndex(emb=demb, frame_ids=dfid, bias=dbias, contiguous=True)
            lx = ShardedLexIndex(
                doc_rows=ldr, tfs=ltf, offsets=loff, idf=lidf, doc_len=ldl,
                frame_ids=lfid, live=llive, row_base=lbase, avgdl=lex.avgdl, max_df=max_df,
            )

            def body(i, carry):
                q, acc = carry
                # perturb the term ids every iteration: with loop-invariant tids
                # XLA hoists the ENTIRE BM25 lane out of the loop and the "hybrid"
                # slope times only the dense lane + fusion (the round-3 numbers
                # had exactly that hole — see docs/benchmarks.md)
                t2 = (tids + jnp.int32(i)) % T
                v, _ = sharded_hybrid_topk(q, t2, dn, lx, K, mesh)
                return q + v[:, :1] * 1e-9, acc + v[0, 0]

            return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

        args = (
            tids0, dense.emb, dense.frame_ids, dense.bias,
            lex.doc_rows, lex.tfs, lex.offsets, lex.idf, lex.doc_len, lex.live,
            lex.frame_ids, lex.row_base,
        )
        float(chained(q0, 1, *args))
        # floor: dense lane reads the 1.6 GB f32 corpus once per batch
        ms, info = robust_slope(
            _make_timer(chained, q0, *args), 3, 13, 23, floor_ms=1.5, cap_ms=6000.0
        )
    print(
        f"fused hybrid N={N} budget={BUDGET}: {ms:.3f} ms/256-query batch "
        f"({256/ms*1e3:,.0f} q/s/chip)  attempts={info['attempts']} "
        f"dispersion={info.get('dispersion')}"
    )


if __name__ == "__main__":
    main()
