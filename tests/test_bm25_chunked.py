"""Chunked packed-postings BM25 candidate kernel (ops/bm25_chunked_pallas.py).

Covers: build_impact_chunks layout invariants, parity with the round-4 sel path
through the public dispatch, water-fill truncation semantics when a query's
chunk demand exceeds the merge plane, and the sharded wiring.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.lex import (
    PK_CHUNK,
    LexIndexBuilder,
    build_impact_chunks,
    packed_row_bits,
)
from wax_tpu.ops.bm25 import bm25_topk
from wax_tpu.ops.bm25_candidates_pallas import bm25_candidates_topk_pallas
from wax_tpu.ops.bm25_chunked_pallas import (
    MIN_SLOTS,
    chunked_candidates_sel,
    pack_query_chunks,
    slots_for_query,
)

I32_MAX = 2**31 - 1


def _budgeted_builder(n_docs=300, n_vocab=50, budget=12, seed=0):
    rng = np.random.default_rng(seed)
    vocab = [f"t{i}" for i in range(n_vocab)]
    b = LexIndexBuilder(postings_budget=budget)
    bu = LexIndexBuilder()
    for i in range(n_docs):
        doc = " ".join(rng.choice(vocab, size=rng.integers(3, 12)))
        b.add(i, doc)
        bu.add(i, doc)
    return b, bu


class TestBuildImpactChunks:
    def test_layout_invariants(self):
        b, _ = _budgeted_builder()
        idx = b.snapshot()
        assert idx.pk_chunks is not None and idx.fwd_tids is not None
        pk = np.asarray(idx.pk_chunks)
        pkr = np.asarray(idx.pk_chunks_rev)
        cbase = np.asarray(idx.chunk_base)
        ccnt = np.asarray(idx.chunk_counts)
        offs = np.asarray(idx.offsets)
        qb = idx.pk_qb
        assert pk.shape[0] % PK_CHUNK == 0
        # last block is the all-sentinel dead-slot target
        assert (pk[-PK_CHUNK:] == I32_MAX).all()
        # rev = per-block reversal
        assert (pkr.reshape(-1, PK_CHUNK)[:, ::-1] == pk.reshape(-1, PK_CHUNK)).all()
        rows_ref = np.asarray(idx.doc_rows)
        for t in range(len(offs) - 1):
            df = offs[t + 1] - offs[t]
            assert ccnt[t] == -(-df // PK_CHUNK) if df else ccnt[t] == 0
            got_rows = []
            for j in range(ccnt[t]):
                blk = pk[(cbase[t] + j) * PK_CHUNK : (cbase[t] + j + 1) * PK_CHUNK]
                live = blk[blk != I32_MAX]
                # live entries lead, pads trail, each chunk row-sorted
                assert (blk[len(live):] == I32_MAX).all()
                chunk_rows = live >> qb
                assert (np.diff(chunk_rows) >= 0).all()
                assert (live & ((1 << qb) - 1)).min() >= 0
                got_rows.extend(chunk_rows.tolist())
            # chunks partition the term's postings (same row multiset)
            assert sorted(got_rows) == sorted(rows_ref[offs[t]: offs[t + 1]].tolist())

    def test_qb_split(self):
        assert packed_row_bits(128) == (8, 12)
        rb, qb = packed_row_bits(1 << 20)
        assert rb == 21 and qb == 10
        with pytest.raises(ValueError):
            packed_row_bits(1 << 26)

    def test_impact_order_across_chunks(self):
        # chunk 0 holds the highest-contribution postings
        rng = np.random.default_rng(3)
        m = 2 * PK_CHUNK + 37
        rows = np.arange(m, dtype=np.int32)
        wn = rng.uniform(0.1, 2.0, m).astype(np.float32)
        offsets = np.array([0, m], np.int64)
        idf = np.ones(1, np.float64)
        pk, _, cbase, ccnt, qb = build_impact_chunks(rows, wn.astype(np.float64),
                                                     offsets, idf, 4096)
        assert ccnt[0] == 3
        order = np.argsort(-wn, kind="stable")
        for j in range(3):
            blk = pk[j * PK_CHUNK: (j + 1) * PK_CHUNK]
            live = blk[blk != I32_MAX]
            expect = np.sort(rows[order[j * PK_CHUNK: (j + 1) * PK_CHUNK]])
            assert (np.sort(live >> qb) == expect).all()


class TestChunkedDispatchParity:
    @pytest.mark.parametrize("mode", ["any", "all"])
    def test_matches_round4_sel_path(self, mode):
        b, _ = _budgeted_builder()
        idx = b.snapshot()
        idx_old = dataclasses.replace(
            idx, pk_chunks=None, pk_chunks_rev=None, chunk_base=None,
            chunk_counts=None, pk_qb=0, pk_max_chunks=0,
        )
        rng = np.random.default_rng(1)
        tids = jnp.asarray(rng.integers(0, 50, (4, 5)).astype(np.int32))
        v1, r1, f1 = bm25_candidates_topk_pallas(tids, idx, 10, mode=mode)
        v2, r2, f2 = bm25_candidates_topk_pallas(tids, idx_old, 10, mode=mode)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
        assert (np.asarray(f1) == np.asarray(f2)).all()

    def test_rescored_scores_are_unbudgeted_exact(self):
        b, bu = _budgeted_builder(seed=5)
        idx = b.snapshot()
        oracle = bu.snapshot()
        rng = np.random.default_rng(2)
        tids = jnp.asarray(rng.integers(0, 50, (4, 4)).astype(np.int32))
        v1, _, f1 = bm25_candidates_topk_pallas(tids, idx, 10, mode="any")
        # every returned doc's score equals its UNBUDGETED oracle score
        vo, _, fo = bm25_topk(tids, oracle, oracle.frame_ids.shape[0], mode="any")
        vo, fo = np.asarray(vo), np.asarray(fo)
        for bi in range(4):
            exact = {int(f): float(v) for f, v in zip(fo[bi], vo[bi]) if f >= 0}
            for f, v in zip(np.asarray(f1)[bi], np.asarray(v1)[bi]):
                if f >= 0:
                    assert abs(exact[int(f)] - float(v)) < 1e-4

    def test_edge_queries(self):
        b, _ = _budgeted_builder()
        idx = b.snapshot()
        # all-invalid query -> dead results
        tids = jnp.full((2, 3), -1, jnp.int32)
        v, r, f = bm25_candidates_topk_pallas(tids, idx, 5, mode="any")
        assert (np.asarray(f) == -1).all()
        # duplicate term ids contribute once per slot (same as the round-4 path)
        idx_old = dataclasses.replace(
            idx, pk_chunks=None, pk_chunks_rev=None, chunk_base=None,
            chunk_counts=None, pk_qb=0, pk_max_chunks=0,
        )
        dup = jnp.asarray([[7, 7, 3, -1]], jnp.int32)
        v1, _, f1 = bm25_candidates_topk_pallas(dup, idx, 5, mode="any")
        v2, _, f2 = bm25_candidates_topk_pallas(dup, idx_old, 5, mode="any")
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)
        assert (np.asarray(f1) == np.asarray(f2)).all()


class TestWaterFill:
    def test_slots_for_query(self):
        assert slots_for_query(4) == MIN_SLOTS
        assert slots_for_query(MIN_SLOTS) == MIN_SLOTS
        assert slots_for_query(MIN_SLOTS + 1) == 2 * MIN_SLOTS
        with pytest.raises(ValueError):
            slots_for_query(200)

    def test_pack_assignment_round_robin(self):
        # 3 terms with 2/1/3 chunks: fill order = all chunk-0s, then chunk-1s, ...
        cbase = jnp.asarray([0, 2, 3], jnp.int32)
        ccnt = jnp.asarray([2, 1, 3], jnp.int32)
        tids = jnp.asarray([[0, 1, 2]], jnp.int32)
        win = np.asarray(pack_query_chunks(tids, cbase, ccnt, 8, 3, dead_block=99))
        assert win[0, :6].tolist() == [0, 2, 3, 1, 4, 5]
        assert (win[0, 6:] == 99).all()

    def test_overflow_drops_deepest_chunks(self):
        # demand (6 chunks) > slots (4): chunk-0s of all three terms survive,
        # then the earliest chunk-1; term 2's chunk-1/2 are dropped
        cbase = jnp.asarray([0, 2, 3], jnp.int32)
        ccnt = jnp.asarray([2, 1, 3], jnp.int32)
        tids = jnp.asarray([[0, 1, 2]], jnp.int32)
        win = np.asarray(pack_query_chunks(tids, cbase, ccnt, 4, 3, dead_block=99))
        assert win[0].tolist() == [0, 2, 3, 1]

    def test_overflow_candidates_limited_to_kept_chunks(self):
        # synthetic single-shard CSR big enough that 16 terms x 3 chunks > 32 slots
        rng = np.random.default_rng(11)
        n, t, df = 8192, 16, 2 * PK_CHUNK + 512  # 3 chunks per term (demand 48)
        offsets = np.arange(t + 1, dtype=np.int64) * df
        rows = np.zeros(t * df, np.int32)
        wn = np.zeros(t * df, np.float32)
        for ti in range(t):
            rows[ti * df: (ti + 1) * df] = np.sort(
                rng.choice(n, size=df, replace=False)
            )
            wn[ti * df: (ti + 1) * df] = rng.uniform(0.5, 2.0, df)
        idf = np.ones(t, np.float64)
        pk, pkr, cbase, ccnt, qb = build_impact_chunks(
            rows, wn.astype(np.float64), offsets, idf, n
        )
        tids = jnp.asarray([np.arange(t, dtype=np.int32)])
        out_rows, keys = chunked_candidates_sel(
            jnp.asarray(tids), jnp.asarray(pk), jnp.asarray(pkr),
            jnp.asarray(cbase), jnp.asarray(ccnt), qb=qb, max_chunks=3,
        )
        got = set(np.asarray(out_rows)[0][np.asarray(out_rows)[0] >= 0].tolist())
        # kept chunks = every term's top-2048 impact head (chunks 0 and 1)
        allowed = set()
        chunk2 = set()
        for ti in range(t):
            seg = slice(ti * df, (ti + 1) * df)
            order = np.argsort(-wn[seg], kind="stable")
            allowed.update(rows[seg][order[: 2 * PK_CHUNK]].tolist())
            chunk2.update(rows[seg][order[2 * PK_CHUNK:]].tolist())
        assert got <= allowed
        assert got  # non-empty
        # and chunk-2-only docs are excluded
        assert not (got & (chunk2 - allowed))


class TestShardedChunked:
    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_sharded_matches_single_chip(self, n_dev):
        from wax_tpu.parallel.mesh import data_mesh
        from wax_tpu.parallel.sharded_hybrid import shard_lex_index, sharded_bm25_topk

        mesh = data_mesh(n_dev)
        b, _ = _budgeted_builder(n_docs=400, n_vocab=60, budget=10, seed=9)
        idx = b.snapshot()
        lex = shard_lex_index(b, mesh, 400)
        assert lex.pk_chunks is not None
        rng = np.random.default_rng(4)
        tids = jnp.asarray(rng.integers(0, 60, (3, 4)).astype(np.int32))
        for mode in ("any", "all"):
            v1, f1 = sharded_bm25_topk(tids, lex, 10, mesh, mode=mode)
            v0, _, f0 = bm25_candidates_topk_pallas(tids, idx, 10, mode=mode)
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), atol=1e-4)
            assert (np.asarray(f1) == np.asarray(f0)).all()
