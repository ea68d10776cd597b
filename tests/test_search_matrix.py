"""Unified-search combination matrix: constraints compose, modes interact with
filters, diagnostics are faithful, WAL pressure triggers auto-commit.

Mirrors the reference's UnifiedSearchTests/HybridSearchTests breadth (reference:
Tests/WaxIntegrationTests — filter/mode/diagnostic combinations, not single axes).
"""
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions
from wax_tpu.types import SearchMode, SearchRequest, TimeRange

CFG = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))


@pytest.fixture(scope="module")
def orch(tmp_path_factory):
    o = MemoryOrchestrator(
        tmp_path_factory.mktemp("sm") / "m.wxs", HashEmbedder(64), CFG
    )
    rows = [
        ("red apple pie recipe", {"cat": "food"}, 1_000),
        ("green apple orchard visit", {"cat": "travel"}, 2_000),
        ("apple laptop review", {"cat": "tech"}, 3_000),
        ("banana bread recipe", {"cat": "food"}, 4_000),
        ("orchard pruning guide", {"cat": "garden"}, 5_000),
    ]
    o._fids = []
    for text, md, ts in rows:
        r = o.remember(text, metadata=md, timestamp_ms=ts)
        o._fids.append(r.document_id)
    yield o
    o.close()


def _ids(resp):
    return [h.frame_id for h in resp.hits]


class TestConstraintComposition:
    def test_metadata_filter_alone(self, orch):
        resp = orch.search(SearchRequest(query="apple", metadata_filter={"cat": "food"}))
        metas = [orch.store.frame_meta(f).metadata["cat"] for f in _ids(resp)]
        assert metas and set(metas) == {"food"}

    def test_metadata_plus_time_range(self, orch):
        resp = orch.search(
            SearchRequest(
                query="recipe",
                metadata_filter={"cat": "food"},
                time_range=TimeRange(3_500, None),
            )
        )
        for f in _ids(resp):
            m = orch.store.frame_meta(f)
            assert m.metadata["cat"] == "food" and m.timestamp_ms >= 3_500

    def test_frame_filter_plus_metadata(self, orch):
        allowed = frozenset(orch._fids[:2])
        resp = orch.search(
            SearchRequest(
                query="apple", frame_filter=allowed, metadata_filter={"cat": "travel"}
            )
        )
        ids = _ids(resp)
        assert ids == [orch._fids[1]]  # intersection of both constraints

    def test_contradictory_filters_empty(self, orch):
        resp = orch.search(
            SearchRequest(
                query="apple",
                frame_filter=frozenset({orch._fids[0]}),
                metadata_filter={"cat": "tech"},
            )
        )
        assert _ids(resp) == []

    def test_mode_text_respects_filters(self, orch):
        resp = orch.search(
            SearchRequest(query="apple", mode=SearchMode.TEXT_ONLY, metadata_filter={"cat": "tech"})
        )
        assert _ids(resp) == [orch._fids[2]]

    def test_mode_vector_respects_filters(self, orch):
        resp = orch.search(
            SearchRequest(query="apple laptop", mode=SearchMode.VECTOR_ONLY, metadata_filter={"cat": "tech"})
        )
        for f in _ids(resp):
            assert orch.store.frame_meta(f).metadata["cat"] == "tech"

    def test_unknown_metadata_key_filters_all(self, orch):
        resp = orch.search(SearchRequest(query="apple", metadata_filter={"nope": "x"}))
        assert _ids(resp) == []


class TestDiagnosticsFaithfulness:
    def test_lane_provenance(self, orch):
        resp = orch.search(SearchRequest(query="apple recipe", include_diagnostics=True))
        assert resp.hits
        for h in resp.hits:
            d = h.diagnostics
            assert d is not None
            assert d.rrf_score > 0
            assert set(d.lane_ranks) <= {"bm25", "vector", "structured", "temporal"}
            # every contributing lane rank is a positive position
            assert all(r >= 1 for r in d.lane_ranks.values())

    def test_diagnostics_off_by_default(self, orch):
        resp = orch.search(SearchRequest(query="apple"))
        assert all(h.diagnostics is None for h in resp.hits)

    def test_rrf_score_consistent_with_ranks(self, orch):
        resp = orch.search(SearchRequest(query="apple recipe", include_diagnostics=True, rrf_k=60.0))
        for h in resp.hits:
            d = h.diagnostics
            # rrf score can never exceed the sum of perfect-rank contributions
            assert d.rrf_score <= sum(1.0 / (60.0 + r) for r in d.lane_ranks.values()) + 1e-9

    def test_preview_bytes_cap(self, orch):
        long_orch = orch
        r = long_orch.remember("x" * 9000 + " cappedpreviewmarker", timestamp_ms=6_000)
        resp = long_orch.search(SearchRequest(query="cappedpreviewmarker", preview_max_bytes=100))
        hit = next(h for h in resp.hits if h.frame_id in (r.document_id, *r.chunk_ids))
        # cap applies to the content window; the snippet may add ellipsis glyphs
        assert len(hit.preview.encode()) <= 100 + 8
        long_orch.forget(r.document_id)


class TestRrfKSensitivity:
    def test_rrf_k_changes_blend_not_membership_topwise(self, orch):
        lo = orch.search(SearchRequest(query="apple recipe", rrf_k=5.0))
        hi = orch.search(SearchRequest(query="apple recipe", rrf_k=500.0))
        assert _ids(lo) and _ids(hi)
        # both contain the strongest lexical match somewhere
        assert orch._fids[0] in _ids(lo) and orch._fids[0] in _ids(hi)


class TestWalPressure:
    def test_auto_commit_under_wal_pressure(self, tmp_path):
        cfg = OrchestratorConfig(store=StoreOptions(wal_size=64 * 1024, auto_commit_fill=0.5))
        o = MemoryOrchestrator(tmp_path / "wal.wxs", HashEmbedder(32), cfg)
        try:
            for i in range(200):
                o.remember(f"wal pressure doc {i} " + "pad " * 30)
            stats = o.store.stats()
            assert stats["auto_commits"] >= 1  # proactive commit fired
            # nothing lost
            assert o.store.frame_count() >= 200
        finally:
            o.close()

    def test_recovery_after_auto_commit_cycle(self, tmp_path):
        p = tmp_path / "wal2.wxs"
        cfg = OrchestratorConfig(store=StoreOptions(wal_size=64 * 1024, auto_commit_fill=0.5))
        o = MemoryOrchestrator(p, HashEmbedder(32), cfg)
        for i in range(120):
            o.remember(f"cycle doc {i} " + "pad " * 30)
        o.close()
        o2 = MemoryOrchestrator(p, HashEmbedder(32), cfg)
        try:
            assert o2.search(SearchRequest(query="cycle doc")).hits
            assert o2.store.frame_count() >= 120
        finally:
            o2.close()
