"""MCP server under concurrent interleaved sessions — remember/recall/flush/forget
races through the public tool surface.

The reference gates production readiness on long-running stability under load
(reference: Tests/WaxTests/ProductionReadinessStabilityTests.swift:34-210); the MCP
server is wax-tpu's long-lived surface, so the equivalent here is many threads
driving one server (the orchestrator's writer-preferring RWLock serializes writers
and overlaps readers) with deep verification at the end. Memory (RSS drift) gating
for the long-running server lives in scripts/soak.py --mcp-rounds.
"""
from __future__ import annotations

import random
import threading

import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions
from wax_tpu.surfaces.mcp_server import McpServer


@pytest.fixture()
def server(tmp_path):
    cfg = OrchestratorConfig(store=StoreOptions(wal_size=1024 * 1024))
    orch = MemoryOrchestrator(tmp_path / "stress.wxs", HashEmbedder(64), cfg)
    srv = McpServer(orch)
    yield srv
    orch.close()


def _call(server, tool, args, mid):
    resp = server.handle(
        {"jsonrpc": "2.0", "id": mid, "method": "tools/call", "params": {"name": tool, "arguments": args}}
    )
    assert resp is not None
    return resp


class TestConcurrentSessions:
    N_THREADS = 6
    OPS_PER_THREAD = 30

    def test_interleaved_sessions_race(self, server):
        """Each thread plays an agent session: start, remember/search/recall mix,
        occasional flush and forget, end. No errors other than the expected
        not-found ones; the store passes deep verify afterwards."""
        errors: list[str] = []
        remembered: dict[int, list[int]] = {i: [] for i in range(self.N_THREADS)}
        barrier = threading.Barrier(self.N_THREADS)

        def agent(tid: int):
            rng = random.Random(1000 + tid)
            try:
                barrier.wait(timeout=30)
                _call(server, "wax_session_start", {"name": f"agent-{tid}"}, tid * 1000)
                for i in range(self.OPS_PER_THREAD):
                    op = rng.randint(0, 9)
                    mid = tid * 1000 + i + 1
                    if op <= 3:
                        r = _call(
                            server,
                            "wax_remember",
                            {"content": f"thread {tid} fact {i}: topic-{rng.randint(0, 5)} value {rng.random():.4f}"},
                            mid,
                        )
                        if "error" in r:
                            errors.append(f"remember: {r['error']}")
                        else:
                            import json as _json

                            payload = _json.loads(r["result"]["content"][0]["text"])
                            remembered[tid].append(payload["document_id"])
                    elif op <= 5:
                        r = _call(server, "wax_search", {"query": f"topic-{rng.randint(0, 5)} thread"}, mid)
                        if "error" in r:
                            errors.append(f"search: {r['error']}")
                    elif op == 6:
                        r = _call(server, "wax_recall", {"query": f"what is thread {tid} topic"}, mid)
                        if "error" in r:
                            errors.append(f"recall: {r['error']}")
                    elif op == 7:
                        r = _call(server, "wax_flush", {}, mid)
                        if "error" in r:
                            errors.append(f"flush: {r['error']}")
                    elif op == 8 and remembered[tid]:
                        victim = remembered[tid].pop(rng.randrange(len(remembered[tid])))
                        r = _call(server, "wax_forget", {"frame_id": victim}, mid)
                        if "error" in r:
                            errors.append(f"forget: {r['error']}")
                    else:
                        r = _call(server, "wax_stats", {}, mid)
                        if "error" in r:
                            errors.append(f"stats: {r['error']}")
                _call(server, "wax_session_end", {}, tid * 1000 + 999)
            except Exception as e:  # noqa: BLE001
                errors.append(f"thread {tid}: {type(e).__name__}: {e}")

        threads = [threading.Thread(target=agent, args=(i,)) for i in range(self.N_THREADS)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive(), "stress thread hung (lock starvation?)"
        assert not errors, errors[:5]

        # post-conditions: flush + deep verify, surviving memories searchable
        _call(server, "wax_flush", {}, 99_990)
        orch = server.orch
        orch.flush()
        report = orch.store.verify(deep=True)
        assert not report["errors"], report
        alive = [fid for fids in remembered.values() for fid in fids]
        assert alive, "expected surviving memories"
        resp = orch.search("topic-1 thread")
        assert resp.hits is not None

    def test_concurrent_readers_overlap_one_writer(self, server):
        """Searches keep succeeding while a writer thread streams remembers."""
        stop = threading.Event()
        errors: list[str] = []

        def writer():
            for i in range(40):
                r = _call(server, "wax_remember", {"content": f"stream item {i} kiwi"}, 5000 + i)
                if "error" in r:
                    errors.append(str(r["error"]))
            stop.set()

        def reader(rid: int):
            n = 0
            while not stop.is_set() or n == 0:
                r = _call(server, "wax_search", {"query": "kiwi stream"}, 6000 + rid * 100 + n)
                if "error" in r:
                    errors.append(str(r["error"]))
                    break
                n += 1
                if n > 200:
                    break

        ts = [threading.Thread(target=writer)] + [
            threading.Thread(target=reader, args=(i,)) for i in range(3)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=120)
            assert not t.is_alive()
        assert not errors, errors[:3]
