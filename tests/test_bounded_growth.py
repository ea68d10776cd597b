"""Repeated unchanged flushes must not re-write index segments (reference: the WAL
compaction bounded-drift fix, README:158 — unchanged commits grew the file ~7.7MB/run
before the fix)."""
from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions

CFG = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))


def test_unchanged_flushes_bounded(tmp_path):
    with MemoryOrchestrator(tmp_path / "g.wxs", HashEmbedder(128), CFG) as o:
        for i in range(50):
            o.remember(f"memory number {i} with some body text to give segments size")
        o.flush()
        size_after_first = o.store.fd.size()
        catalog_after_first = len(o.store.toc.segment_catalog)
        for _ in range(8):
            o.flush()
        growth = o.store.fd.size() - size_after_first
        catalog_growth = len(o.store.toc.segment_catalog) - catalog_after_first
        # only TOC + footer pages per flush — index segments must not be duplicated
        assert growth < 8 * 64 * 1024, f"file grew {growth} bytes over 8 no-op flushes"
        assert catalog_growth == 0, f"segment catalog grew by {catalog_growth}"


def test_changed_segments_still_written(tmp_path):
    with MemoryOrchestrator(tmp_path / "g.wxs", HashEmbedder(128), CFG) as o:
        o.remember("first memory")
        o.flush()
        gen1 = o.store.toc.manifests["lex"].offset
        o.remember("second memory changes the postings")
        o.flush()
        assert o.store.toc.manifests["lex"].offset != gen1
        assert o.search("second memory").hits
