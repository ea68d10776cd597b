"""End-to-end orchestrator flows: remember/recall/search/flush/reopen, chunking,
sessions, handoffs, access stats, forget.

Mirrors the reference's MemoryOrchestratorTests + WaxSessionTests integration axis.
"""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.rag.config import FastRAGConfig
from wax_tpu.storage.store import StoreOptions
from wax_tpu.text.chunker import ChunkingStrategy

CFG = OrchestratorConfig(
    store=StoreOptions(wal_size=512 * 1024),
    chunking=ChunkingStrategy(target_tokens=64, overlap_tokens=8),
    rag=FastRAGConfig(deterministic_now_ms=1_700_010_000_000),
)

MEMORIES = [
    "Max the golden retriever was born on March 3, 2021 in Austin and loves swimming.",
    "Maria moved to Barcelona in 2019 where she works as an architect.",
    "The wifi password at the cabin is sunflower42.",
    "Quarterly revenue grew twelve percent while costs stayed flat.",
]


@pytest.fixture()
def orch(tmp_path):
    o = MemoryOrchestrator(tmp_path / "mem.wxs", HashEmbedder(128), CFG)
    yield o
    o.close()


class TestRememberRecall:
    def test_remember_then_recall(self, orch):
        for m in MEMORIES:
            orch.remember(m)
        ctx = orch.recall("when was Max the dog born")
        assert ctx.items
        assert "Max" in ctx.items[0].text

    def test_search_api(self, orch):
        for m in MEMORIES:
            orch.remember(m)
        resp = orch.search("wifi password cabin")
        assert resp.hits
        assert "sunflower42" in (orch.engine.frames.content(resp.hits[0].frame_id) or "")

    def test_long_content_chunks(self, orch):
        long = " ".join(f"Sentence {i} about project alpha milestones." for i in range(200))
        res = orch.remember(long)
        assert len(res.chunk_ids) > 1
        meta = orch.store.frame_meta(res.chunk_ids[0])
        assert meta.parent_id == res.document_id
        assert meta.chunk_count == len(res.chunk_ids)

    def test_metadata_and_tags(self, orch):
        res = orch.remember("tagged memory", metadata={"topic": "test"}, tags=("alpha",))
        m = orch.store.frame_meta(res.document_id)
        assert m.metadata["topic"] == "test" and "alpha" in m.tags

    def test_forget(self, orch):
        res = orch.remember("a secret to forget")
        assert orch.forget(res.document_id)
        resp = orch.search("secret forget")
        assert all(h.frame_id != res.document_id for h in resp.hits)


class TestPersistence:
    def test_flush_reopen_preserves_search(self, tmp_path):
        p = tmp_path / "mem.wxs"
        with MemoryOrchestrator(p, HashEmbedder(128), CFG) as o:
            for m in MEMORIES:
                o.remember(m)
            o.flush()
        with MemoryOrchestrator(p, HashEmbedder(128), CFG) as o2:
            resp = o2.search("Barcelona architect")
            assert resp.hits
            content = o2.engine.frames.content(resp.hits[0].frame_id)
            assert "Barcelona" in content
            # vector lane restored from the vec segment
            assert len(o2.engine.vector) > 0

    def test_unflushed_data_recovered_via_wal(self, tmp_path):
        p = tmp_path / "mem.wxs"
        o = MemoryOrchestrator(p, HashEmbedder(128), CFG)
        o.remember(MEMORIES[0])
        o.flush()
        o.remember(MEMORIES[2])  # never flushed
        o.close()
        with MemoryOrchestrator(p, HashEmbedder(128), CFG) as o2:
            resp = o2.search("wifi password")
            assert resp.hits, "WAL-recovered memory must be searchable"
            assert len(o2.engine.vector) == 2  # pending embedding replayed

    def test_access_stats_persist(self, tmp_path):
        p = tmp_path / "mem.wxs"
        with MemoryOrchestrator(p, HashEmbedder(128), CFG) as o:
            o.remember(MEMORIES[0])
            o.recall("Max dog")
            assert len(o.access_stats) > 0
            o.flush()
        with MemoryOrchestrator(p, HashEmbedder(128), CFG) as o2:
            assert len(o2.access_stats) > 0

    def test_double_flush_identical_state(self, tmp_path):
        p = tmp_path / "mem.wxs"
        with MemoryOrchestrator(p, HashEmbedder(128), CFG) as o:
            o.remember(MEMORIES[0])
            g1 = o.flush()
            g2 = o.flush()
            assert g2 == g1 + 1


class TestSessions:
    def test_session_tagging(self, orch):
        sid = orch.session_start("exp1")
        res = orch.remember("session scoped memory")
        m = orch.store.frame_meta(res.document_id)
        assert f"session:{sid}" in m.tags
        orch.session_end()
        res2 = orch.remember("untagged")
        assert not any(t.startswith("session:") for t in orch.store.frame_meta(res2.document_id).tags)

    def test_handoff_roundtrip(self, orch):
        orch.handoff("agent A state: working on task 7")
        orch.handoff("agent B state: finished task 7")
        meta, content = orch.handoff_latest()
        assert "agent B" in content


class TestStats:
    def test_runtime_stats_shape(self, orch):
        orch.remember(MEMORIES[0])
        orch.recall("Max")
        st = orch.runtime_stats()
        assert st["lex_docs"] >= 1 and st["vector_count"] >= 1
        assert "wal" in st and "store" in st

    def test_embedding_memoizer_hits(self, orch):
        orch.remember(MEMORIES[0])
        orch.remember(MEMORIES[0])
        assert orch.memoizer.stats["hits"] > 0


class TestWarmup:
    def test_warmup_traces_lanes(self, tmp_path):
        """warmup() pre-traces both lanes; the subsequent first query must not
        rebuild snapshots (the warmup built them) and must return normally."""
        from wax_tpu.embed.hash_embedder import HashEmbedder
        from wax_tpu.orchestrator import MemoryOrchestrator, OrchestratorConfig

        o = MemoryOrchestrator(tmp_path / "w.wxs", HashEmbedder(64), OrchestratorConfig())
        for i in range(20):
            o.remember(f"warm doc {i} about topic {i % 3}")
        o.flush()
        o.close()
        o2 = MemoryOrchestrator(tmp_path / "w.wxs", HashEmbedder(64), OrchestratorConfig())
        o2.warmup(background=False)
        snaps_after_warmup = o2.engine.stats["lex_snapshots"]
        resp = o2.search("topic 1 doc")
        assert resp.hits
        assert o2.engine.stats["lex_snapshots"] == snaps_after_warmup  # no rebuild
        o2.close()

    def test_background_warmup_races_close(self, tmp_path):
        from wax_tpu.embed.hash_embedder import HashEmbedder
        from wax_tpu.orchestrator import MemoryOrchestrator, OrchestratorConfig

        o = MemoryOrchestrator(tmp_path / "w2.wxs", HashEmbedder(64), OrchestratorConfig())
        o.remember("single doc")
        o.flush()
        o.warmup(background=True)
        o.close()  # joins the warmup thread; must not raise


class TestAnalyzerVersioning:
    def test_analyzer_mismatch_rebuilds_lex_on_open(self, tmp_path, monkeypatch, caplog):
        """A store written under a different analyze() version must NOT be served
        with its stale vocab (queries would silently never match): the open path
        rebuilds the text index from frames."""
        import logging

        import wax_tpu.index.lex as lexmod
        from wax_tpu.search import engine_cache

        p = tmp_path / "mem.wxs"
        with MemoryOrchestrator(p, HashEmbedder(128), CFG) as o:
            for m in MEMORIES:
                o.remember(m)
            o.flush()
        # simulate an old store: the segment on disk carries the CURRENT version
        # string, so pretend the runtime analyzer moved on
        engine_cache.clear()  # the cache handover would bypass the segment read
        monkeypatch.setattr(lexmod, "ANALYZER_VERSION", "u61-next")
        with caplog.at_level(logging.WARNING, logger="wax_tpu"):
            with MemoryOrchestrator(p, HashEmbedder(128), CFG) as o2:
                resp = o2.search("Barcelona architect")
                assert resp.hits
                assert "Barcelona" in o2.engine.frames.content(resp.hits[0].frame_id)
                assert len(o2.engine.lex) == len(MEMORIES)
        assert any("analyzer" in r.message for r in caplog.records)

    def test_pre_versioning_segment_treated_as_mismatch(self, tmp_path, caplog):
        """Segments written before the attr existed rebuild too (round-3 stores)."""
        import logging
        import unittest.mock as mock

        from wax_tpu.orchestrator import orchestrator as orch_mod
        from wax_tpu.search import engine_cache

        p = tmp_path / "mem.wxs"
        orig = orch_mod.serialize_lex  # patch the orchestrator's BOUND name

        def strip_analyzer(builder):
            blob, attrs = orig(builder)
            attrs.pop("analyzer", None)
            return blob, attrs

        with mock.patch.object(orch_mod, "serialize_lex", strip_analyzer):
            with MemoryOrchestrator(p, HashEmbedder(128), CFG) as o:
                for m in MEMORIES:
                    o.remember(m)
                o.flush()
        engine_cache.clear()
        with caplog.at_level(logging.WARNING, logger="wax_tpu"):
            with MemoryOrchestrator(p, HashEmbedder(128), CFG) as o2:
                assert o2.search("wifi password").hits
                assert len(o2.engine.lex) == len(MEMORIES)
        assert any("analyzer" in r.message for r in caplog.records)  # rebuild fired
