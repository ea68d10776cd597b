"""Distributed hybrid retrieval on the 8-virtual-device CPU mesh: sharded BM25 parity
with single-chip scoring, and the one-program hybrid matches host-side RRF fusion."""
import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.dense import DenseIndexBuilder
from wax_tpu.index.lex import LexIndexBuilder
from wax_tpu.ops.bm25 import bm25_topk, pad_term_ids
from wax_tpu.ops.flat_scan import flat_scan_topk, normalize_rows
from wax_tpu.ops.fusion import rrf_fuse
from wax_tpu.parallel.mesh import data_mesh
from wax_tpu.parallel.sharded_hybrid import (
    shard_lex_index,
    sharded_bm25_topk,
    sharded_hybrid_topk,
)
from wax_tpu.parallel.sharded_scan import shard_dense_index

TOPICS = ["fox", "quantum", "market", "recipe", "rover", "cat", "river", "music"]


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    docs = []
    for i in range(256):
        t = TOPICS[i % len(TOPICS)]
        docs.append((i, f"document {i} about {t} and the {t} domain with detail {i % 7}"))
    from wax_tpu.embed.hash_embedder import HashEmbedder

    emb = HashEmbedder(64)
    vecs = emb.embed_batch([t for _, t in docs])
    return docs, vecs, emb


@pytest.fixture(scope="module")
def built(corpus):
    docs, vecs, emb = corpus
    dense = DenseIndexBuilder(dim=64)
    dense.add_batch(np.asarray([fid for fid, _ in docs]), vecs)
    lex = LexIndexBuilder()
    lex.add_batch(docs)
    return dense, lex, emb


class TestShardedBm25:
    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_matches_single_chip(self, built, n_dev):
        dense, lex, emb = built
        mesh = data_mesh(n_dev)
        snap = lex.snapshot()
        sharded = shard_lex_index(lex, mesh, n_rows_global=int(snap.doc_len.shape[0]))
        tids = jnp.asarray(pad_term_ids(lex.query_term_ids("fox domain detail"))[None, :])
        v_ref, _, f_ref = bm25_topk(tids, snap, 10, mode="any")
        v_sh, f_sh = sharded_bm25_topk(tids, sharded, 10, mesh)
        ref = {(int(f), round(float(v), 4)) for f, v in zip(np.asarray(f_ref)[0], np.asarray(v_ref)[0]) if f >= 0}
        got = {(int(f), round(float(v), 4)) for f, v in zip(np.asarray(f_sh)[0], np.asarray(v_sh)[0]) if f >= 0}
        assert ref == got


class TestShardedHybrid:
    def test_fused_matches_host_rrf(self, built):
        dense, lex, emb = built
        mesh = data_mesh(8)
        dsnap = dense.snapshot()
        lsnap = lex.snapshot()
        d_sh = shard_dense_index(dsnap, mesh)
        l_sh = shard_lex_index(lex, mesh, n_rows_global=dsnap.capacity)
        query = "quantum domain detail"
        qv = normalize_rows(jnp.asarray(emb.embed(query)[None, :]))
        tids = jnp.asarray(pad_term_ids(lex.query_term_ids(query))[None, :])

        k = 10
        fetch = max(2 * k, 16)
        fv, ff = sharded_hybrid_topk(qv, tids, d_sh, l_sh, k, mesh)

        # host-side oracle: same lanes, host RRF with equal weights
        dv, _, df = flat_scan_topk(qv, dsnap, fetch, backend="xla")
        lv, _, lf = bm25_topk(tids, lsnap, fetch, mode="any")
        lanes = {
            "dense": [(int(f), float(v)) for f, v in zip(np.asarray(df)[0], np.asarray(dv)[0]) if f >= 0],
            "bm25": [(int(f), float(v)) for f, v in zip(np.asarray(lf)[0], np.asarray(lv)[0]) if f >= 0],
        }
        fused = rrf_fuse(lanes, {"dense": 0.5, "bm25": 0.5}, rrf_k=60.0, top_k=k)
        oracle = [(h.frame_id, round(h.score, 6)) for h in fused]
        got = [
            (int(f), round(float(v), 6))
            for f, v in zip(np.asarray(ff)[0], np.asarray(fv)[0])
            if f >= 0
        ]
        assert {g[0] for g in got} == {o[0] for o in oracle}
        for (gf, gv), (of, ov) in zip(sorted(got), sorted(oracle)):
            assert gf == of and gv == pytest.approx(ov, abs=1e-5)

    def test_batch_queries(self, built):
        dense, lex, emb = built
        mesh = data_mesh(4)
        dsnap = dense.snapshot()
        d_sh = shard_dense_index(dsnap, mesh)
        l_sh = shard_lex_index(lex, mesh, n_rows_global=dsnap.capacity)
        queries = ["fox domain", "market detail", "music document"]
        qv = normalize_rows(jnp.asarray(emb.embed_batch(queries)))
        tids = jnp.asarray(np.stack([pad_term_ids(lex.query_term_ids(q)) for q in queries]))
        fv, ff = sharded_hybrid_topk(qv, tids, d_sh, l_sh, 5, mesh)
        ff = np.asarray(ff)
        assert ff.shape == (3, 5)
        assert (ff[:, 0] >= 0).all()


class TestShardedBm25Modes:
    def test_all_mode_matches_single_chip(self, built):
        dense, lex, emb = built
        mesh = data_mesh(8)
        snap = lex.snapshot()
        sharded = shard_lex_index(lex, mesh, n_rows_global=int(snap.doc_len.shape[0]))
        tids = jnp.asarray(pad_term_ids(lex.query_term_ids("quantum domain detail"))[None, :])
        v_ref, _, f_ref = bm25_topk(tids, snap, 10, mode="all")
        v_sh, f_sh = sharded_bm25_topk(tids, sharded, 10, mesh, mode="all")
        ref = {(int(f), round(float(v), 4)) for f, v in zip(np.asarray(f_ref)[0], np.asarray(v_ref)[0]) if f >= 0}
        got = {(int(f), round(float(v), 4)) for f, v in zip(np.asarray(f_sh)[0], np.asarray(v_sh)[0]) if f >= 0}
        assert ref and ref == got


class TestOrchestratorShardedLanes:
    def test_results_match_default_config(self, tmp_path):
        from wax_tpu.embed.hash_embedder import HashEmbedder
        from wax_tpu.orchestrator.config import OrchestratorConfig
        from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
        from wax_tpu.storage.store import StoreOptions

        docs = [f"note {i} about {TOPICS[i % len(TOPICS)]} with detail {i % 5}" for i in range(40)]
        results = {}
        for name, cfg in {
            "default": OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024)),
            "sharded": OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024), sharded_lanes=True),
        }.items():
            with MemoryOrchestrator(tmp_path / f"{name}.wxs", HashEmbedder(64), cfg) as orch:
                for d in docs:
                    orch.remember(d)
                if name == "sharded":
                    assert orch.engine.lex_sharded and orch.engine.vector.kind == "sharded"
                results[name] = [
                    [(h.frame_id, round(h.score, 6)) for h in orch.search(q).hits]
                    for q in ("quantum detail", "river note", "market domain detail")
                ]
        assert results["sharded"] == results["default"]


class TestChunkmaxDenseLane:
    def test_chunkmax_lane_matches_blockmax_lane(self, monkeypatch):
        """The large-shard dense backend (chunkmax) must return the same hybrid
        results as the default blockmax lane (threshold lowered to exercise it on
        the CPU mesh; 2048-row shard, 1 device keeps alignment)."""
        import wax_tpu.parallel.sharded_hybrid as sh
        from wax_tpu.embed.hash_embedder import HashEmbedder

        rng = np.random.default_rng(11)
        n = 2048
        docs = [(i, f"chunky doc {i} about {TOPICS[i % len(TOPICS)]}") for i in range(n)]
        emb = HashEmbedder(64)
        vecs = emb.embed_batch([t for _, t in docs])
        dense_b = DenseIndexBuilder(dim=64)
        dense_b.add_batch(np.asarray([fid for fid, _ in docs]), vecs)
        lex_b = LexIndexBuilder()
        lex_b.add_batch(docs)
        mesh = data_mesh(1)
        snap = dense_b.snapshot()
        assert snap.contiguous and snap.capacity % 2048 == 0
        sharded_d = shard_dense_index(snap, mesh)
        assert sharded_d.contiguous
        sharded_l = shard_lex_index(lex_b, mesh, n_rows_global=int(sharded_d.emb.shape[0]))
        q = normalize_rows(jnp.asarray(emb.embed_batch(["quantum domain doc"])))
        from wax_tpu.ops.bm25 import pad_term_ids

        tids = jnp.asarray(pad_term_ids(lex_b.query_term_ids("quantum domain"))[None, :])

        v_block, f_block = sharded_hybrid_topk(q, tids, sharded_d, sharded_l, 10, mesh)
        monkeypatch.setattr(sh, "_CHUNKMAX_MIN_LOCAL_ROWS", 1024)
        v_chunk, f_chunk = sharded_hybrid_topk(q, tids, sharded_d, sharded_l, 10, mesh)
        np.testing.assert_array_equal(np.asarray(f_block), np.asarray(f_chunk))
        np.testing.assert_allclose(np.asarray(v_block), np.asarray(v_chunk), rtol=1e-5)

    def test_tombstoned_shard_stays_on_blockmax(self, monkeypatch):
        """A non-contiguous (tombstoned) index must NOT take the chunkmax lane
        (its rescore assumes prefix liveness) — and results stay correct."""
        import wax_tpu.parallel.sharded_hybrid as sh
        from wax_tpu.embed.hash_embedder import HashEmbedder

        n = 2048
        docs = [(i, f"tomb doc {i} about {TOPICS[i % len(TOPICS)]}") for i in range(n)]
        emb = HashEmbedder(64)
        vecs = emb.embed_batch([t for _, t in docs])
        dense_b = DenseIndexBuilder(dim=64)
        dense_b.add_batch(np.asarray([fid for fid, _ in docs]), vecs)
        for fid in range(0, 100, 3):
            dense_b.remove(fid)
        lex_b = LexIndexBuilder()
        lex_b.add_batch(docs)
        for fid in range(0, 100, 3):
            lex_b.remove(fid)
        mesh = data_mesh(1)
        snap = dense_b.snapshot()
        assert not snap.contiguous
        sharded_d = shard_dense_index(snap, mesh)
        sharded_l = shard_lex_index(lex_b, mesh, n_rows_global=int(sharded_d.emb.shape[0]))
        q = normalize_rows(jnp.asarray(emb.embed_batch(["market domain doc"])))
        from wax_tpu.ops.bm25 import pad_term_ids

        tids = jnp.asarray(pad_term_ids(lex_b.query_term_ids("market domain"))[None, :])
        monkeypatch.setattr(sh, "_CHUNKMAX_MIN_LOCAL_ROWS", 1024)
        v, f = sharded_hybrid_topk(q, tids, sharded_d, sharded_l, 10, mesh)
        removed = set(range(0, 100, 3))
        assert removed.isdisjoint(set(int(x) for x in np.asarray(f)[0] if x >= 0))


def test_lex_backend_auto_guards_vmem(monkeypatch):
    """auto never selects the Pallas kernel when q2 * dma_window(max_df) exceeds
    the VMEM scratch budget — an unbudgeted corpus with a very frequent term must
    fall back to the XLA candidate lane, not fail Mosaic compilation."""
    import dataclasses

    import jax as _jax

    from wax_tpu.parallel import sharded_hybrid as sh

    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    lexb = LexIndexBuilder()
    lexb.add_batch([(i, f"doc {i} about topic {i % 5}") for i in range(64)])
    mesh = data_mesh(2)
    lex = sh.shard_lex_index(lexb, mesh, 64)
    assert sh._resolve_lex_backend(lex, "auto", q2=16) == "candidates_pallas"
    big = dataclasses.replace(lex, max_df=200_000)
    assert sh._resolve_lex_backend(big, "auto", q2=16) == "candidates"
    # wide query batches tighten the guard too
    assert sh._resolve_lex_backend(lex, "auto", q2=16 * 1024) == "candidates"
    # explicit backend is never overridden
    assert sh._resolve_lex_backend(big, "candidates_pallas", q2=16) == "candidates_pallas"
    # the kernel pads q to next_pow2 with a FLOOR OF 2: q2=1 must be guarded as
    # if it were 2. max_df=300_000 → dma_window = 524288 == _PALLAS_MAX_PLANE_ELEMS,
    # so a floor-of-1 guard would pass (1×524288 fits) while the kernel actually
    # allocates 2×524288 and would fail Mosaic compilation.
    from wax_tpu.index.lex import dma_window

    assert dma_window(300_000) == sh._PALLAS_MAX_PLANE_ELEMS
    at_max = dataclasses.replace(lex, max_df=300_000)
    assert sh._resolve_lex_backend(at_max, "auto", q2=1) == "candidates"
    # non-pow2 q pads up: window 131072 (max_df=100_000) fits 4 slots exactly —
    # q2=3 pads to 4 (pallas ok), q2=5 pads to 8 (rejected)
    assert 4 * dma_window(100_000) == sh._PALLAS_MAX_PLANE_ELEMS
    quarter = dataclasses.replace(lex, max_df=100_000)
    assert sh._resolve_lex_backend(quarter, "auto", q2=3) == "candidates_pallas"
    assert sh._resolve_lex_backend(quarter, "auto", q2=5) == "candidates"
