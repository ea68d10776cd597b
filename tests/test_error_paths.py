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
