"""Error paths: misbehaving embedders, open validation, read-only mode.

Mirrors the reference's error-test axis (MemoryOrchestratorErrorTests,
OpenValidationTests, and the WrongDimensionTextEmbedder / WrongCountBatchEmbedder
mocks in Mocks/MockEmbedders.swift:9-75).
"""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.embed.provider import ExecutionMode
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreError, StoreOptions, WaxStore

CFG = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))


class WrongDimensionEmbedder(HashEmbedder):
    """Claims one dimension, produces another."""

    @property
    def dimensions(self):
        return 64

    def embed(self, text):
        return np.zeros(32, np.float32)

    def embed_batch(self, texts):
        return np.zeros((len(texts), 32), np.float32)


class WrongCountBatchEmbedder(HashEmbedder):
    """Returns fewer vectors than texts."""

    def embed_batch(self, texts):
        return super().embed_batch(list(texts)[: max(0, len(texts) - 1)])


class TestEmbedderErrors:
    def test_wrong_dimension_rejected(self, tmp_path):
        with MemoryOrchestrator(tmp_path / "m.wxs", WrongDimensionEmbedder(), CFG) as o:
            with pytest.raises(ValueError):
                o.remember("dimension mismatch must fail loudly")

    def test_wrong_count_rejected(self, tmp_path):
        with MemoryOrchestrator(tmp_path / "m.wxs", WrongCountBatchEmbedder(64), CFG) as o:
            with pytest.raises(Exception):
                o.remember("count mismatch must fail loudly")

    def test_network_provider_rejected_when_on_device_required(self, tmp_path):
        class NetEmbedder(HashEmbedder):
            @property
            def execution_mode(self):
                return ExecutionMode.MAY_USE_NETWORK

        with pytest.raises(ValueError):
            MemoryOrchestrator(tmp_path / "m.wxs", NetEmbedder(16), CFG)


class TestOpenValidation:
    def test_open_missing_file(self, tmp_path):
        with pytest.raises(StoreError):
            WaxStore.open(tmp_path / "nope.wxs")

    def test_open_non_store_file(self, tmp_path):
        p = tmp_path / "junk.wxs"
        p.write_bytes(b"this is not a store file, just bytes " * 300)
        with pytest.raises(StoreError):
            WaxStore.open(p)

    def test_create_over_existing_fails(self, tmp_path):
        p = tmp_path / "s.wxs"
        WaxStore.create(p, StoreOptions(wal_size=256 * 1024)).close()
        with pytest.raises(StoreError):
            WaxStore.create(p, StoreOptions(wal_size=256 * 1024))


class TestReadOnly:
    def test_readonly_search_but_no_writes(self, tmp_path):
        p = tmp_path / "m.wxs"
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o:
            o.remember("read-only visible memory")
            o.flush()
        ro = MemoryOrchestrator(p, HashEmbedder(64), CFG, readonly=True)
        try:
            assert ro.search("visible memory").hits
            with pytest.raises(StoreError):
                ro.remember("should fail")
            with pytest.raises(StoreError):
                ro.flush()
        finally:
            ro.close()

    def test_readonly_missing_store(self, tmp_path):
        with pytest.raises(StoreError):
            MemoryOrchestrator(tmp_path / "absent.wxs", HashEmbedder(64), CFG, readonly=True)

    def test_concurrent_readers_allowed(self, tmp_path):
        p = tmp_path / "m.wxs"
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o:
            o.remember("shared memory")
            o.flush()
        r1 = MemoryOrchestrator(p, HashEmbedder(64), CFG, readonly=True)
        r2 = MemoryOrchestrator(p, HashEmbedder(64), CFG, readonly=True)
        try:
            assert r1.search("shared").hits and r2.search("shared").hits
        finally:
            r1.close()
            r2.close()


class TestEmbedderMismatchGuard:
    """The vec segment records the provider identity that built it; opening with a
    different provider must not silently mix embedding spaces."""

    def _write(self, path, seed="wax-tpu"):
        with MemoryOrchestrator(path, HashEmbedder(64, seed=seed), CFG) as o:
            o.remember("Max the golden retriever was born in Austin.")
            o.remember("The quarterly report is due on Friday afternoon.")
            o.flush()

    def test_identity_recorded_in_vec_attrs(self, tmp_path):
        p = tmp_path / "m.wxs"
        self._write(p)
        store = WaxStore.open(p, CFG.store, readonly=True)
        attrs = store.toc.manifests["vec"].attrs
        store.close()
        assert attrs.get("embedder") == HashEmbedder(64).identity

    def test_mismatch_errors_by_default(self, tmp_path):
        p = tmp_path / "m.wxs"
        self._write(p)
        with pytest.raises(StoreError, match="embedder"):
            MemoryOrchestrator(p, HashEmbedder(64, seed="other"), CFG)

    def test_same_identity_reopens(self, tmp_path):
        p = tmp_path / "m.wxs"
        self._write(p)
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o:
            assert o.search("golden retriever").hits

    def test_reindex_rebuilds_in_new_space(self, tmp_path):
        import dataclasses

        p = tmp_path / "m.wxs"
        self._write(p)
        cfg = dataclasses.replace(CFG, embedder_mismatch="reindex")
        with MemoryOrchestrator(p, HashEmbedder(64, seed="other"), cfg) as o:
            # dense lane must work against vectors re-embedded with the NEW provider:
            # a pure-vector query (no lexical overlap scored via dense rank presence)
            resp = o.search("golden retriever puppy")
            assert resp.hits
            # and the rebuilt index covers every embedded frame
            assert len(o.engine.vector) == 2

    def test_ignore_keeps_stale_index(self, tmp_path):
        import dataclasses

        p = tmp_path / "m.wxs"
        self._write(p)
        cfg = dataclasses.replace(CFG, embedder_mismatch="ignore")
        with MemoryOrchestrator(p, HashEmbedder(64, seed="other"), cfg) as o:
            assert len(o.engine.vector) == 2  # untouched (stale) vectors

    def test_legacy_store_without_identity_opens(self, tmp_path):
        """Stores written before the identity attr (e.g. via WaxSession, which has no
        embedder) open without tripping the guard."""
        from wax_tpu.session import WaxSession

        p = tmp_path / "m.wxs"
        store = WaxStore.create(p, CFG.store)
        s = WaxSession(store, dim=64)
        s.put("session-written frame", embedding=np.ones(64, np.float32) / 8.0)
        s.commit()
        store.close()
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o:
            assert o.search("session-written frame").hits

    def test_failed_open_releases_writer_lock(self, tmp_path):
        """A guard failure inside open must release the writer lease so a corrected
        retry (same process) can proceed."""
        p = tmp_path / "m.wxs"
        self._write(p)
        with pytest.raises(StoreError):
            MemoryOrchestrator(p, HashEmbedder(64, seed="other"), CFG)
        # corrected retry succeeds immediately — no dangling flock
        with MemoryOrchestrator(p, HashEmbedder(64), CFG) as o:
            assert o.search("golden retriever").hits
