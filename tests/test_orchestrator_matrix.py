"""Orchestrator behavior matrix: session/handoff chains, batch-vs-single parity,
supersede chains, stats/importance interplay, flush-cycle invariants.

Extends tests/test_orchestrator.py toward the reference's integration breadth
(reference: Tests/WaxIntegrationTests MemoryOrchestratorTests + session/handoff
suites)."""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions
from wax_tpu.types import SearchRequest

CFG = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))


@pytest.fixture()
def orch(tmp_path):
    o = MemoryOrchestrator(tmp_path / "mx.wxs", HashEmbedder(64), CFG)
    yield o
    o.close()


class TestSessionsAndHandoffs:
    def test_handoff_latest_per_session(self, orch):
        orch.session_start("alpha")
        orch.handoff("state A1")
        orch.handoff("state A2")
        orch.session_end()
        orch.session_start("beta")
        orch.handoff("state B1")
        orch.session_end()
        meta, text = orch.handoff_latest()
        assert "B1" in text
        meta_a, text_a = orch.handoff_latest(session_id="alpha")
        assert "A2" in text_a and meta_a.metadata["session_id"] == "alpha"

    def test_handoff_project_scope_and_pending_tasks(self, orch):
        orch.handoff("infra state", project="infra", pending_tasks=["rotate keys"])
        orch.handoff("app state", project="app")
        meta, text = orch.handoff_latest(project="infra")
        assert "infra state" in text
        assert "rotate keys" in meta.metadata["pending_tasks"]
        assert orch.handoff_latest(project="nonexistent") is None

    def test_handoff_latest_empty(self, orch):
        assert orch.handoff_latest() is None

    def test_session_tag_applied_only_within_session(self, orch):
        orch.remember("untagged memory outside")
        orch.session_start("s1")
        r = orch.remember("tagged memory inside")
        orch.session_end()
        m = orch.store.frame_meta(r.document_id)
        assert any("s1" in t for t in m.tags)
        r2 = orch.remember("after session ends")
        m2 = orch.store.frame_meta(r2.document_id)
        assert not any("s1" in t for t in m2.tags)

    def test_handoffs_survive_flush_reopen(self, tmp_path):
        p = tmp_path / "ho.wxs"
        o = MemoryOrchestrator(p, HashEmbedder(64), CFG)
        o.session_start("persist")
        o.handoff("durable handoff state")
        o.flush()
        o.close()
        o2 = MemoryOrchestrator(p, HashEmbedder(64), CFG)
        try:
            got = o2.handoff_latest(session_id="persist")
            assert got is not None and "durable" in got[1]
        finally:
            o2.close()


class TestBatchSingleParity:
    DOCS = [
        "the alpha subsystem handles ingest",
        "the beta subsystem handles retrieval",
        "gamma manages the storage engine",
    ]

    def test_same_results_batch_vs_single(self, tmp_path):
        a = MemoryOrchestrator(tmp_path / "single.wxs", HashEmbedder(64), CFG)
        b = MemoryOrchestrator(tmp_path / "batch.wxs", HashEmbedder(64), CFG)
        try:
            for d in self.DOCS:
                a.remember(d)
            b.remember_batch(self.DOCS)
            qa = [h.frame_id for h in a.search(SearchRequest(query="beta retrieval")).hits]
            qb = [h.frame_id for h in b.search(SearchRequest(query="beta retrieval")).hits]
            ca = [a.store.frame_content(f) for f in qa]
            cb = [b.store.frame_content(f) for f in qb]
            assert ca == cb  # same contents in the same order
        finally:
            a.close()
            b.close()

    def test_empty_batch(self, orch):
        assert orch.remember_batch([]) == []

    def test_batch_with_metadata_rows(self, orch):
        res = orch.remember_batch(
            ["doc one text", "doc two text"],
            metadatas=[{"k": "1"}, {"k": "2"}],
        )
        assert len(res) == 2
        assert orch.store.frame_meta(res[0].document_id).metadata["k"] == "1"
        assert orch.store.frame_meta(res[1].document_id).metadata["k"] == "2"


class TestSupersedeChains:
    def test_search_returns_only_newest(self, orch):
        r1 = orch.remember("project deadline is March 3rd")
        fid2 = orch.store.supersede(r1.document_id, "project deadline is April 7th", kind="document")
        hits = orch.search(SearchRequest(query="project deadline")).hits
        ids = [h.frame_id for h in hits]
        assert fid2 in ids and r1.document_id not in ids

    def test_chain_of_three(self, orch):
        r1 = orch.remember("version one of the note")
        f2 = orch.store.supersede(r1.document_id, "version two of the note", kind="document")
        f3 = orch.store.supersede(f2, "version three of the note", kind="document")
        m1 = orch.store.frame_meta(r1.document_id)
        m2 = orch.store.frame_meta(f2)
        m3 = orch.store.frame_meta(f3)
        assert m1.superseded_by == f2 and m2.superseded_by == f3
        assert m3.supersedes == f2 and m3.superseded_by is None
        hits = orch.search(SearchRequest(query="version note")).hits
        assert [h.frame_id for h in hits][:1] == [f3]

    def test_timeline_includes_superseded_on_request(self, orch):
        r1 = orch.remember("old fact text")
        orch.store.supersede(r1.document_id, "new fact text", kind="document")
        vis = orch.store.timeline(include_superseded=False)
        all_ = orch.store.timeline(include_superseded=True)
        assert len(all_) > len(vis)


class TestFlushCycleInvariants:
    def test_interleaved_mutations_across_flushes(self, tmp_path):
        p = tmp_path / "il.wxs"
        o = MemoryOrchestrator(p, HashEmbedder(64), CFG)
        r1 = o.remember("first era document")
        o.flush()
        o.forget(r1.document_id)
        r2 = o.remember("second era document")
        o.flush()
        o.store.supersede(r2.document_id, "second era revised", kind="document")
        o.close()  # close commits pending state
        o2 = MemoryOrchestrator(p, HashEmbedder(64), CFG)
        try:
            hits = o2.search(SearchRequest(query="era document revised")).hits
            texts = [o2.store.frame_content(h.frame_id).decode() for h in hits]
            assert any("revised" in t for t in texts)
            assert not any("first era" in t for t in texts)
        finally:
            o2.close()

    def test_flush_count_and_stats_progress(self, orch):
        s0 = orch.runtime_stats()
        orch.remember("stat generating doc")
        orch.flush()
        s1 = orch.runtime_stats()
        assert s1["store"]["commits"] > s0["store"]["commits"]
        assert s1["store"]["frame_count"] >= s0["store"]["frame_count"] + 1

    def test_readonly_sees_committed_only(self, tmp_path):
        p = tmp_path / "ro.wxs"
        o = MemoryOrchestrator(p, HashEmbedder(64), CFG)
        o.remember("committed doc")
        o.flush()
        o.close()
        o2 = MemoryOrchestrator(p, HashEmbedder(64), CFG, readonly=True)
        try:
            assert o2.search(SearchRequest(query="committed doc")).hits
            with pytest.raises(Exception):
                o2.remember("should fail read-only")
        finally:
            o2.close()


class TestAccessStatsInterplay:
    def test_recall_records_access(self, orch):
        r = orch.remember("frequently accessed topic")
        for _ in range(3):
            orch.recall("frequently accessed topic")
        count, last = orch.access_stats.stats_for(r.document_id)
        assert count >= 1 and last is not None

    def test_stats_disabled_config(self, tmp_path):
        cfg = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024), enable_access_stats=False)
        o = MemoryOrchestrator(tmp_path / "ns.wxs", HashEmbedder(64), cfg)
        try:
            o.remember("untracked doc")
            o.recall("untracked doc")
            assert len(o.access_stats) == 0
        finally:
            o.close()
