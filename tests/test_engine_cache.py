"""Process-wide engine cache: warm re-open reclaims parked builders iff the committed
segment checksums match (reference: UnifiedSearchEngineCache.swift:53-123)."""
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.search import engine_cache
from wax_tpu.storage.store import StoreOptions

CFG = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))


@pytest.fixture(autouse=True)
def fresh_cache():
    engine_cache.clear()
    yield
    engine_cache.clear()


class TestEngineCache:
    def test_warm_reopen_reclaims_and_matches_cold(self, tmp_path):
        p = tmp_path / "c.wxs"
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o:
            for i in range(20):
                o.remember(f"memory {i} about topic {i % 3}")
            o.flush()
            cold_hits = [h.frame_id for h in o.search("topic 1 memory").hits]
        before = engine_cache.cache_stats()
        assert before["parks"] == 1
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o2:
            assert engine_cache.cache_stats()["hits"] == 1
            warm_hits = [h.frame_id for h in o2.search("topic 1 memory").hits]
        assert warm_hits == cold_hits

    def test_entry_survives_reclaim_and_copies_are_independent(self, tmp_path):
        # Copy-on-reclaim: the parked entry keeps serving later opens (the reference
        # cache serves concurrent readers, UnifiedSearchEngineCache.swift:53-123),
        # and each reclaimed copy is mutation-independent.
        from wax_tpu.search import engine_cache

        engine_cache.clear()
        p = tmp_path / "share.wxs"
        o = MemoryOrchestrator(p, HashEmbedder(64), CFG)
        o.remember("shared warm engines about herons")
        o.flush()
        o.close()
        a = engine_cache.reclaim(*next(iter(engine_cache._entries)))
        b = engine_cache.reclaim(*next(iter(engine_cache._entries)))
        assert a is not None and b is not None
        assert engine_cache.cache_stats()["entries"] == 1  # entry still parked
        a[0].add(123456, "mutating one copy")
        assert 123456 in a[0] and 123456 not in b[0]

    def test_stale_checksum_not_reclaimed(self, tmp_path):
        p = tmp_path / "s.wxs"
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o:
            o.remember("first")
            o.flush()
        # mutate + flush through a second orchestrator WITHOUT parking (simulate an
        # external writer): reopen, add, flush, then poison the parked entry by
        # clearing and re-parking nothing
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o2:
            o2.remember("second")
            o2.flush()
        # o2's open legitimately reclaimed o1's park (same shas). Now clear the cache
        # so o2's park is gone, then re-park o1's STALE entry by hand: o3 must not
        # take it (its key carries the old checksums, not the current ones).
        engine_cache.clear()
        engine_cache.park(p, b"stale-lex-sha", b"stale-vec-sha", object(), object())
        hits_before = engine_cache.cache_stats()["hits"]
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o3:
            assert engine_cache.cache_stats()["hits"] == hits_before
            assert len(o3.search("second").hits) >= 1

    def test_unflushed_pending_replays_after_reclaim(self, tmp_path):
        """Parked builders include journaled-but-uncommitted adds; reopen must see
        them exactly once (WAL catch-up is idempotent against the reclaimed state)."""
        p = tmp_path / "u.wxs"
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o:
            o.remember("committed doc about alpha")
            o.flush()
            o.remember("pending doc about omega")  # journaled only
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o2:
            assert engine_cache.cache_stats()["hits"] == 1
            hits = o2.search("pending omega").hits
            assert len({h.frame_id for h in hits}) == len(hits)
            assert hits and "omega" in (o2.store.frame_content(hits[0].frame_id) or b"").decode()
            assert len(o2.engine.lex) == o2.store.frame_count()

    def test_never_created_store_not_polluted_by_same_path(self, tmp_path):
        p = tmp_path / "n.wxs"
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o:
            o.remember("ghost doc")  # never flushed -> no committed segments
        assert engine_cache.cache_stats()["parks"] == 0  # (None, None) never parked
        p.unlink()
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o2:
            assert not o2.search("ghost doc").hits
