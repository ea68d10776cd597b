"""Concurrency stress: concurrent ingest + recall + flush cycles against one
orchestrator must neither crash nor corrupt state.

The host-side analogue of the reference's race-testing axis (reference:
ConcurrencyStressTests.swift:5-36 — concurrent ingest+recall, rapid cycles — with
Swift actor isolation replaced by the orchestrator's entry-point lock)."""
import threading

import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions

CFG = OrchestratorConfig(store=StoreOptions(wal_size=1024 * 1024))


class TestConcurrencyStress:
    def test_concurrent_ingest_and_recall(self, tmp_path):
        orch = MemoryOrchestrator(tmp_path / "c.wxs", HashEmbedder(64), CFG)
        errors: list[Exception] = []
        n_writers, n_readers, per = 4, 4, 12

        def writer(tid):
            try:
                for i in range(per):
                    orch.remember(f"writer {tid} memory {i} about topic {i % 3}")
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        def reader(tid):
            try:
                for i in range(per):
                    orch.recall(f"topic {i % 3} memory")
                    orch.search(f"writer memory {i}")
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_writers)] + [
            threading.Thread(target=reader, args=(t,)) for t in range(n_readers)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert not errors, errors
        assert orch.store.frame_count() >= n_writers * per
        orch.flush()
        assert orch.store.verify(deep=True)["ok"]
        orch.close()

    def test_concurrent_engine_searches(self, tmp_path):
        """Parallel searches against one vector engine snapshot (the analogue of
        MetalVectorEnginePoolTests' transient-buffer-pool stress)."""
        import numpy as np

        from wax_tpu.search.vector_engines import FlatVectorEngine

        rng = np.random.default_rng(0)
        eng = FlatVectorEngine(dim=64)
        vecs = rng.standard_normal((2000, 64)).astype(np.float32)
        eng.add_batch(np.arange(2000), vecs)
        errors, results = [], {}

        def searcher(tid):
            try:
                q = vecs[tid * 10 : tid * 10 + 4]
                results[tid] = eng.search(q, 5)[1]
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=searcher, args=(t,)) for t in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        for tid, fids in results.items():
            assert (fids[:, 0] == np.arange(tid * 10, tid * 10 + 4)).all()

    def test_rapid_flush_cycles_under_writes(self, tmp_path):
        orch = MemoryOrchestrator(tmp_path / "f.wxs", HashEmbedder(64), CFG)
        errors: list[Exception] = []
        stop = threading.Event()

        def flusher():
            try:
                while not stop.is_set():
                    orch.flush()
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        t = threading.Thread(target=flusher)
        t.start()
        try:
            for i in range(30):
                orch.remember(f"interleaved memory {i}")
        finally:
            stop.set()
            t.join(timeout=120)
        assert not errors, errors
        orch.flush()
        report = orch.store.verify(deep=True)
        assert report["ok"], report
        # reopen: all memories visible
        path = orch.path
        orch.close()
        with MemoryOrchestrator(path, HashEmbedder(64), CFG) as o2:
            assert len([m for m in o2.timeline()]) >= 30


class TestStructuredConcurrency:
    def test_concurrent_facts_and_search(self, tmp_path):
        """Structured mutations + hybrid searches from racing threads: the
        entry-point lock serializes sqlite access; no errors, consistent end state."""
        import threading

        from wax_tpu.structured.memory import FactValue

        orch = MemoryOrchestrator(tmp_path / "sc.wxs", HashEmbedder(64), CFG)
        orch.remember("Rex the dog belongs to Ana and lives in Lisbon.")
        errors: list = []
        stop = threading.Event()

        def facts_worker():
            i = 0
            try:
                while not stop.is_set() and i < 40:
                    orch.entity_upsert(f"Entity{i % 7}", kind="thing")
                    orch.fact_assert(f"Entity{i % 7}", "counter", FactValue.integer(i))
                    i += 1
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        def search_worker():
            try:
                for _ in range(30):
                    if stop.is_set():
                        break
                    orch.search("who owns Rex")
                    orch.facts_query(subject="Entity0")
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=facts_worker), threading.Thread(target=search_worker)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        stop.set()
        assert not errors, errors
        # every predicate supersede chain ends with exactly one open span
        for e in range(7):
            rows = orch.facts_query(subject=f"Entity{e}", predicate="counter")
            assert len(rows) <= 1
        orch.flush()
        assert orch.store.verify(deep=True)["ok"]
        orch.close()


class TestWarmupLocking:
    """warmup()'s background trace must hold the reader lock while it touches
    live builders (it used to race writers and could cache a torn lex snapshot
    under the new generation)."""

    def test_warmup_racing_writes_yields_consistent_search(self, tmp_path):
        from wax_tpu.embed.hash_embedder import HashEmbedder
        from wax_tpu.orchestrator.config import OrchestratorConfig
        from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator

        for trial in range(5):
            p = tmp_path / f"warm{trial}.wxs"
            o = MemoryOrchestrator(p, HashEmbedder(64), OrchestratorConfig())
            o.remember("seed doc about alpine lakes")
            o.warmup(background=True)
            for i in range(30):  # races the warmup trace
                o.remember(f"doc {i} about glacier hiking route {i}")
            resp = o.search("glacier hiking")
            assert resp.hits
            # the generation-keyed snapshot cache must reflect ALL writes
            snap = o.engine.lex_snapshot()
            assert int(snap.count) == 31
            o.close()

    def test_close_immediately_after_background_warmup(self, tmp_path):
        from wax_tpu.embed.hash_embedder import HashEmbedder
        from wax_tpu.orchestrator.config import OrchestratorConfig
        from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator

        p = tmp_path / "warmclose.wxs"
        o = MemoryOrchestrator(p, HashEmbedder(64), OrchestratorConfig())
        o.remember("only doc")
        o.warmup(background=True)
        o.close()  # must not deadlock or leave the thread using parked builders
        with MemoryOrchestrator(p, HashEmbedder(64), OrchestratorConfig()) as o2:
            assert o2.search("only doc").hits
