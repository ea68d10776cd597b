"""Benchmarks-as-tests: env-gated ingest/search/recall benchmarks with JSON output and
percentile guardrails, plus a soak/stability profile.

Mirrors the reference's benchmark test axis (reference: RAGBenchmarks.swift:28-789 —
ingest text/hybrid at 200/1K/5K/10K docs, search latency, FastRAG build, cold open;
scales via WAX_BENCHMARK_SCALE smoke|standard|stress in RAGBenchmarkSupport.swift:15-60;
JSON emission + guardrails per README:190-203; ProductionReadinessStabilityTests.swift
:34-210 — soak profiles with RSS and latency-percentile drift gates).

Run: WAX_TPU_BENCHMARK=1 [WAX_TPU_BENCHMARK_SCALE=smoke|standard|stress]
     [WAX_TPU_BENCHMARK_OUTPUT=path.json] python -m pytest tests/test_benchmarks.py -q
"""
import json
import os
import resource
import time

import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions

pytestmark = pytest.mark.skipif(
    os.environ.get("WAX_TPU_BENCHMARK") != "1",
    reason="benchmarks are env-gated: set WAX_TPU_BENCHMARK=1",
)

SCALES = {"smoke": 200, "standard": 1000, "stress": 5000}
SCALE = os.environ.get("WAX_TPU_BENCHMARK_SCALE", "smoke")
N_DOCS = SCALES.get(SCALE, 200)

_results: list[dict] = []


def _emit(metric: str, value: float, unit: str) -> None:
    rec = {"metric": metric, "value": round(value, 4), "unit": unit, "scale": SCALE}
    _results.append(rec)
    print(json.dumps(rec))


def teardown_module(module):
    out = os.environ.get("WAX_TPU_BENCHMARK_OUTPUT")
    if out:
        with open(out, "w") as f:
            json.dump(_results, f, indent=1)


def _docs(n):
    topics = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    return [
        f"Document {i} discusses {topics[i % 8]} subsystem details and change {i % 23} "
        f"with outcome {i % 5} measured over window {i % 11}."
        for i in range(n)
    ]


@pytest.fixture(scope="module")
def corpus():
    return _docs(N_DOCS)


CFG = OrchestratorConfig(store=StoreOptions(wal_size=16 * 1024 * 1024))


class TestIngestBench:
    def test_ingest_throughput(self, tmp_path, corpus):
        orch = MemoryOrchestrator(tmp_path / "b.wxs", HashEmbedder(384), CFG)
        t0 = time.perf_counter()
        for d in corpus:
            orch.remember(d)
        dt = time.perf_counter() - t0
        orch.flush()
        orch.close()
        _emit(f"ingest_docs_per_s_{SCALE}", len(corpus) / dt, "docs/s")
        # guardrail: must beat 50 docs/s even on a throttled host
        assert len(corpus) / dt > 50

    def test_ingest_batched_throughput(self, tmp_path, corpus):
        """remember_batch: one WAL batch + one embed batch per call — the TPU-first
        ingest path (the per-doc number above mirrors the reference's per-doc actor
        calls; this row is what a bulk loader would use)."""
        orch = MemoryOrchestrator(tmp_path / "bb.wxs", HashEmbedder(384), CFG)
        bs = 256
        t0 = time.perf_counter()
        for i in range(0, len(corpus), bs):
            orch.remember_batch(corpus[i : i + bs])
        dt = time.perf_counter() - t0
        orch.flush()
        orch.close()
        _emit(f"ingest_batched_docs_per_s_{SCALE}", len(corpus) / dt, "docs/s")
        assert len(corpus) / dt > 100


class TestSearchBench:
    @pytest.fixture(scope="class")
    def orch(self, tmp_path_factory, corpus):
        p = tmp_path_factory.mktemp("bench") / "s.wxs"
        o = MemoryOrchestrator(p, HashEmbedder(384), CFG)
        for d in corpus:
            o.remember(d)
        o.flush()
        yield o
        o.close()

    def test_warm_search_latency(self, orch):
        queries = [f"subsystem {t} outcome" for t in ("alpha", "beta", "gamma", "delta")] * 8
        orch.search(queries[0])  # warm
        lat = []
        for q in queries:
            t0 = time.perf_counter()
            orch.search(q)
            lat.append(time.perf_counter() - t0)
        p50, p95 = np.percentile(lat, [50, 95])
        _emit(f"warm_search_p50_{SCALE}", p50 * 1e3, "ms")
        _emit(f"warm_search_p95_{SCALE}", p95 * 1e3, "ms")
        assert p95 < 60.0, f"p95 {p95*1e3:.1f} ms over guardrail"

    def test_recall_build_latency(self, orch):
        orch.recall("alpha subsystem change")  # warm
        lat = []
        for i in range(16):
            t0 = time.perf_counter()
            ctx = orch.recall(f"subsystem change {i % 5} outcome")
            lat.append(time.perf_counter() - t0)
            assert ctx.total_tokens <= ctx.budget_tokens
        _emit(f"recall_build_p50_{SCALE}", np.percentile(lat, 50) * 1e3, "ms")

    def test_cold_open_to_first_query(self, orch, tmp_path):
        """True cold open: full store recovery + segment deserialization + device
        upload + first query, with the process-wide engine cache CLEARED (otherwise
        the parked engines short-circuit the very path being measured) and the jit
        executables warm (a fresh process gets them from the persistent compile
        cache next to the store — the production steady state; the reference's 17 ms
        similarly excludes Metal pipeline compilation)."""
        from wax_tpu.search import engine_cache

        path = orch.path
        orch.flush()
        orch.close()
        # warm the jit executables for the DESERIALIZED engines' shapes (clearing
        # the engine cache first — a reclaimed builder can carry different capacity
        # padding than a deserialized one, which would leave the measured run
        # compiling), then drop all warm engine state again
        engine_cache.clear()
        warm = MemoryOrchestrator(path, HashEmbedder(384), CFG)
        warm.search("alpha subsystem")
        warm.close()
        engine_cache.clear()
        t0 = time.perf_counter()
        o3 = MemoryOrchestrator(path, HashEmbedder(384), CFG)
        o3.search("alpha subsystem")
        dt = time.perf_counter() - t0
        o3.close()
        _emit(f"cold_open_first_query_{SCALE}", dt * 1e3, "ms")


class TestSoak:
    def test_soak_stability(self, tmp_path):
        """Sustained ingest+recall cycles: RSS growth and latency drift bounded
        (reference: ProductionReadinessStabilityTests soak/burn profiles)."""
        orch = MemoryOrchestrator(tmp_path / "soak.wxs", HashEmbedder(128), CFG)
        cycles = 6 if SCALE == "smoke" else 12
        per = 25
        rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        first_lat = last_lat = None
        for c in range(cycles):
            for i in range(per):
                orch.remember(f"soak cycle {c} memory {i} about region {i % 4}")
            lat = []
            for i in range(8):
                t0 = time.perf_counter()
                orch.recall(f"region {i % 4} memory")
                lat.append(time.perf_counter() - t0)
            p50 = float(np.percentile(lat, 50))
            if first_lat is None:
                first_lat = p50
            last_lat = p50
            orch.flush()
        rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        orch.close()
        _emit("soak_latency_drift_ratio", last_lat / max(first_lat, 1e-9), "x")
        _emit("soak_rss_growth", (rss1 - rss0) / 1024, "MiB")
        assert last_lat / max(first_lat, 1e-9) < 8.0, "recall latency drifted"


class TestWalBench:
    """WAL workload matrix (reference: WALCompactionBenchmarks — append/commit
    latency over payload-size x batch-shape combinations, JSON output, guardrails)."""

    def test_wal_workload_matrix(self, tmp_path):
        from wax_tpu.storage.store import WaxStore

        matrix = [
            ("small_single", 64, 1, 400),
            ("small_batch", 64, 32, 12),
            ("large_single", 8192, 1, 100),
            ("large_batch", 8192, 32, 4),
        ]
        for name, payload, batch, rounds in matrix:
            s = WaxStore.create(tmp_path / f"wal_{name}.wxs", StoreOptions(wal_size=8 * 1024 * 1024))
            blob = b"w" * payload
            t0 = time.perf_counter()
            n = 0
            for _ in range(rounds):
                if batch == 1:
                    s.put(blob)
                    n += 1
                else:
                    s.put_batch([(blob, {}) for _ in range(batch)])
                    n += batch
            el = time.perf_counter() - t0
            _emit(f"wal_append_{name}", n / el, "frames/s")
            t0 = time.perf_counter()
            s.commit()
            _emit(f"wal_commit_after_{name}", (time.perf_counter() - t0) * 1e3, "ms")
            assert s.verify(deep=True)["ok"]
            s.close()

    def test_wal_cycling_under_sustained_writes(self, tmp_path):
        """Sustained writes through a small ring force proactive commits (the
        compaction pressure path); throughput must not collapse and the store must
        stay consistent."""
        from wax_tpu.storage.store import WaxStore

        s = WaxStore.create(tmp_path / "cyc.wxs", StoreOptions(wal_size=256 * 1024))
        blob = b"c" * 2048
        lat = []
        for i in range(300):
            t0 = time.perf_counter()
            s.put(blob)
            lat.append(time.perf_counter() - t0)
        lat_ms = np.asarray(lat) * 1e3
        _emit("wal_cycling_put_p50", float(np.percentile(lat_ms, 50)), "ms")
        _emit("wal_cycling_put_p99", float(np.percentile(lat_ms, 99)), "ms")
        _emit("wal_cycling_commits", float(s.stats_counters.get("commits", 0)), "count")
        s.commit()
        assert s.verify(deep=True)["ok"]
        # guardrail: p50 append must stay sub-10ms even on the throttled host
        assert np.percentile(lat_ms, 50) < 10.0
        s.close()
