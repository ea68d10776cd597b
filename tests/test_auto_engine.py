"""Recall-aware automatic vector-engine routing (AutoVectorEngine).

The round-5 verdict item: engine="auto" must MEASURE recall before serving an
approximate engine, clear >=0.95 recall@10 on uniform / clustered /
hard-clustered geometries at its chosen budget, and expose a stats-visible
reason. Small-scale CPU versions of the three geometry suites; the serving-scale
IVF numbers are in docs/benchmarks.md.
"""
from __future__ import annotations

import numpy as np
import pytest

from wax_tpu.search.vector_engines import AutoVectorEngine, FlatVectorEngine

N, D, K = 6000, 64, 10


def _normalize(x):
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)


def _geometry(kind: str, rng):
    if kind == "uniform":
        return _normalize(rng.normal(size=(N, D)).astype(np.float32))
    n_centers, sigma = (40, 0.3) if kind == "clustered" else (20, 0.05)
    centers = _normalize(rng.normal(size=(n_centers, D)).astype(np.float32))
    assign = rng.integers(0, n_centers, N)
    pts = centers[assign] + sigma * rng.normal(size=(N, D)).astype(np.float32)
    return _normalize(pts)


def _exact_recall(auto_fids, exact_fids):
    hits = total = 0
    for a, e in zip(auto_fids, exact_fids):
        ref = {int(f) for f in e if f >= 0}
        hits += len(ref & {int(f) for f in a if f >= 0})
        total += len(ref)
    return hits / max(total, 1)


class TestAutoRouting:
    @pytest.mark.parametrize("geometry", ["uniform", "clustered", "hard-clustered"])
    def test_recall_above_target_on_all_geometries(self, geometry):
        rng = np.random.default_rng(hash(geometry) % 2**31)
        vecs = _geometry(geometry, rng)
        auto = AutoVectorEngine(dim=D, ann_rows=4000)  # force the ANN decision path
        exact = FlatVectorEngine(dim=D)
        fids = np.arange(N, dtype=np.int64)
        auto.add_batch(fids, vecs)
        exact.add_batch(fids, vecs)
        q = _normalize(
            vecs[rng.choice(N, 32, replace=False)]
            + 0.05 * rng.normal(size=(32, D)).astype(np.float32)
        )
        _, got = auto.search(q, K)
        _, ref = exact.search(q, K)
        stats = auto.stats()
        assert stats["engine"] in ("ivf", "flat")
        assert "reason" in stats and stats["measured_recall"] is not None
        rec = _exact_recall(got, ref)
        assert rec >= 0.95, f"{geometry}: end-to-end recall {rec} ({stats})"

    def test_small_corpus_routes_to_flat(self):
        auto = AutoVectorEngine(dim=D)
        rng = np.random.default_rng(0)
        auto.add_batch(np.arange(100), _normalize(rng.normal(size=(100, D)).astype(np.float32)))
        auto.search(_normalize(rng.normal(size=(2, D)).astype(np.float32)), 5)
        stats = auto.stats()
        assert stats["engine"] == "flat"
        assert "exact fused scan" in stats["reason"]
        assert stats["measured_recall"] == 1.0

    def test_unreachable_target_falls_back_to_exact(self):
        rng = np.random.default_rng(3)
        auto = AutoVectorEngine(dim=D, ann_rows=1000, recall_target=1.5)
        vecs = _geometry("uniform", rng)[:2000]
        auto.add_batch(np.arange(2000), vecs)
        q = _normalize(rng.normal(size=(4, D)).astype(np.float32))
        _, got = auto.search(q, K)
        stats = auto.stats()
        assert stats["engine"] == "flat"
        assert "serving the exact scan" in stats["reason"]
        # exact fallback == flat engine results
        exact = FlatVectorEngine(dim=D)
        exact.add_batch(np.arange(2000), vecs)
        _, ref = exact.search(q, K)
        assert (got == ref).all()

    def test_decision_reevaluated_per_generation(self):
        rng = np.random.default_rng(4)
        auto = AutoVectorEngine(dim=D, ann_rows=1000)
        auto.add_batch(np.arange(500), _normalize(rng.normal(size=(500, D)).astype(np.float32)))
        auto.search(_normalize(rng.normal(size=(1, D)).astype(np.float32)), 5)
        assert auto.stats()["engine"] == "flat"
        gen0 = auto._route_gen
        auto.add_batch(
            500 + np.arange(1500), _normalize(rng.normal(size=(1500, D)).astype(np.float32))
        )
        auto.search(_normalize(rng.normal(size=(1, D)).astype(np.float32)), 5)
        assert auto._route_gen != gen0  # re-measured on the grown corpus
        assert auto.stats()["engine"] in ("ivf", "flat")


class TestAutoSerialization:
    def test_round_trip_preserves_kind_and_vectors(self):
        from wax_tpu.orchestrator.serialization import (
            deserialize_vector_engine,
            serialize_vector_engine,
        )

        rng = np.random.default_rng(5)
        auto = AutoVectorEngine(dim=D)
        vecs = _normalize(rng.normal(size=(50, D)).astype(np.float32))
        auto.add_batch(np.arange(50), vecs)
        blob, attrs = serialize_vector_engine(auto)
        assert attrs["engine"] == "auto"
        back = deserialize_vector_engine(blob, attrs)
        assert isinstance(back, AutoVectorEngine)
        q = _normalize(rng.normal(size=(3, D)).astype(np.float32))
        _, f1 = auto.search(q, 5)
        _, f2 = back.search(q, 5)
        assert (f1 == f2).all()
