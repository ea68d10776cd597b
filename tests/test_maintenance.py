"""Maintenance: surrogate optimization idempotence, index compaction, live-set rewrite
with id remapping + verification (reference: MemoryOrchestrator+Maintenance tests)."""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.maintenance import Maintainer
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions
from wax_tpu.types import FrameKind

CFG = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))


@pytest.fixture()
def orch(tmp_path):
    o = MemoryOrchestrator(tmp_path / "m.wxs", HashEmbedder(64), CFG)
    yield o
    o.close()


class TestSurrogates:
    def test_creates_then_current(self, orch):
        orch.remember("First memory. It has several sentences. Some are more important than others.")
        orch.remember("Second memory about the quarterly budget and infrastructure costs.")
        m = Maintainer(orch)
        r1 = m.optimize_surrogates()
        assert r1.surrogates_created == 2
        r2 = m.optimize_surrogates()
        assert r2.surrogates_created == 0 and r2.surrogates_current == 2

    def test_updates_on_superseded_content(self, orch):
        res = orch.remember("Original content about topic A.")
        m = Maintainer(orch)
        m.optimize_surrogates()
        # supersede the document -> old one no longer live, no new surrogate for it
        orch.store.supersede(res.document_id, "Replacement content about topic B.", kind="document")
        r = m.optimize_surrogates()
        assert r.surrogates_created >= 1  # surrogate for the replacement


class TestCompaction:
    def test_compact_drops_tombstones(self, orch):
        ids = [orch.remember(f"memory number {i}").document_id for i in range(6)]
        for fid in ids[:3]:
            orch.forget(fid)
        m = Maintainer(orch)
        gen = m.compact_indexes()
        assert gen >= 1
        assert len(orch.engine.lex) == 3
        assert len(orch.engine.vector) == 3
        resp = orch.search("memory number")
        assert all(h.frame_id in ids[3:] for h in resp.hits)


class TestLiveSetRewrite:
    def test_rewrite_drops_dead_and_remaps(self, orch):
        keep_a = orch.remember("alpha memory kept").document_id
        dead = orch.remember("beta memory doomed").document_id
        keep_b = orch.remember("gamma memory kept too").document_id
        orch.flush()
        orch.forget(dead)
        orch.flush()
        m = Maintainer(orch)
        before_size = orch.store.fd.size()
        report = m.rewrite_live_set()
        assert report.executed
        assert report.frames_after < report.frames_before
        # search still works with remapped ids
        resp = orch.search("gamma memory")
        assert resp.hits
        content = orch.engine.frames.content(resp.hits[0].frame_id)
        assert "gamma" in content
        assert orch.store.verify(deep=True)["ok"]
        # reopen from disk: everything consistent
        path = orch.path
        orch.close()
        with MemoryOrchestrator(path, HashEmbedder(64), CFG) as o2:
            resp = o2.search("alpha memory")
            assert resp.hits
            assert "alpha" in o2.engine.frames.content(resp.hits[0].frame_id)

    def test_rewrite_preserves_chunk_links(self, orch):
        long = " ".join(f"Sentence {i} about project delta." for i in range(400))
        dead = orch.remember("soon gone").document_id
        res = orch.remember(long)
        orch.flush()
        orch.forget(dead)
        m = Maintainer(orch)
        m.rewrite_live_set()
        # chunk parents must still resolve
        chunks = [
            fid
            for fid in range(orch.store.frame_count())
            if (meta := orch.store.frame_meta(fid)) and meta.kind == FrameKind.CHUNK.value
        ]
        assert chunks
        for fid in chunks:
            parent = orch.store.frame_meta(fid).parent_id
            assert parent is not None
            assert orch.store.frame_meta(parent).kind == FrameKind.DOCUMENT.value

    def test_scheduled_gates(self, orch):
        m = Maintainer(orch)
        rep = m.maybe_scheduled_rewrite()
        assert not rep.executed and rep.reason == "disabled"

    def test_dead_bytes_counts(self, orch):
        fid = orch.remember("x" * 5000).document_id
        orch.flush()
        m = Maintainer(orch)
        base = m.dead_bytes()
        orch.forget(fid)
        assert m.dead_bytes() > base
