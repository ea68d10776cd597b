"""Vector engine abstraction: preference factory, flat/hnsw parity on easy queries,
serialization dispatch, orchestrator running fully on the HNSW engine."""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.orchestrator.serialization import (
    deserialize_vector_engine,
    serialize_vector_engine,
)
from wax_tpu.search.vector_engines import (
    FlatVectorEngine,
    HNSWVectorEngine,
    make_vector_engine,
)
from wax_tpu.storage.store import StoreOptions


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(3)
    v = rng.standard_normal((800, 32)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


class TestFactory:
    def test_preferences(self):
        # "auto" = the recall-aware router (exact scan below AUTO_ANN_ROWS,
        # measured-recall IVF above — tests/test_auto_engine.py)
        assert make_vector_engine("auto", 16).kind == "auto"
        assert make_vector_engine("flat", 16).kind == "flat"
        assert make_vector_engine("hnsw", 16).kind == "hnsw"
        assert make_vector_engine("ivf", 16).kind == "ivf"
        with pytest.raises(ValueError):
            make_vector_engine("metal", 16)


class TestParity:
    def test_self_query_parity(self, vecs):
        flat = FlatVectorEngine(dim=32)
        hnsw = HNSWVectorEngine(dim=32, m=8, ef_construction=60)
        ids = np.arange(len(vecs))
        flat.add_batch(ids, vecs)
        hnsw.add_batch(ids, vecs)
        q = vecs[:16]
        _, f_flat = flat.search(q, 1)
        _, f_hnsw = hnsw.search(q, 1)
        np.testing.assert_array_equal(f_flat[:, 0], np.arange(16))
        np.testing.assert_array_equal(f_hnsw[:, 0], np.arange(16))

    def test_empty_engines(self):
        for eng in (FlatVectorEngine(dim=8), HNSWVectorEngine(dim=8)):
            vals, fids = eng.search(np.ones((2, 8), np.float32), 3)
            assert fids.shape == (2, 3) and (fids == -1).all()

    def test_k_exceeds_count_padded(self, vecs):
        flat = FlatVectorEngine(dim=32)
        flat.add_batch(np.arange(4), vecs[:4])
        vals, fids = flat.search(vecs[:1], 10)
        assert fids.shape == (1, 10)
        assert (fids[0, 4:] == -1).all()


class TestSerializationDispatch:
    @pytest.mark.parametrize("kind", ["flat", "hnsw", "ivf"])
    def test_roundtrip(self, vecs, kind):
        eng = make_vector_engine(kind, 32, **({"m": 8, "ef_construction": 60} if kind == "hnsw" else {}))
        eng.add_batch(np.arange(100), vecs[:100])
        blob, attrs = serialize_vector_engine(eng)
        assert attrs["engine"] == kind
        eng2 = deserialize_vector_engine(blob, attrs)
        assert eng2.kind == kind and len(eng2) == 100
        _, f1 = eng.search(vecs[:4], 3)
        _, f2 = eng2.search(vecs[:4], 3)
        np.testing.assert_array_equal(f1, f2)


class TestShardedEngine:
    def test_matches_flat(self, vecs):
        from wax_tpu.search.vector_engines import ShardedFlatVectorEngine

        flat = FlatVectorEngine(dim=32)
        sh = ShardedFlatVectorEngine(dim=32)
        ids = np.arange(len(vecs))
        flat.add_batch(ids, vecs)
        sh.add_batch(ids, vecs)
        v1, f1 = flat.search(vecs[:8], 10)
        v2, f2 = sh.search(vecs[:8], 10)
        np.testing.assert_array_equal(f1, f2)
        np.testing.assert_allclose(v1, v2, atol=1e-5)

    def test_orchestrator_end_to_end(self, tmp_path):
        cfg = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024), vector_engine="sharded")
        p = tmp_path / "sh.wxs"
        with MemoryOrchestrator(p, HashEmbedder(64), cfg) as o:
            o.remember("the mesh-sharded engine indexes this memory")
            resp = o.search("mesh sharded memory")
            assert resp.hits
            o.flush()
        with MemoryOrchestrator(p, HashEmbedder(64), cfg) as o2:
            assert o2.engine.vector.kind == "sharded"
            assert o2.search("sharded engine").hits


class TestOrchestratorOnHnsw:
    def test_end_to_end(self, tmp_path):
        cfg = OrchestratorConfig(
            store=StoreOptions(wal_size=512 * 1024), vector_engine="hnsw"
        )
        p = tmp_path / "m.wxs"
        with MemoryOrchestrator(p, HashEmbedder(64), cfg) as o:
            o.remember("The treasure is buried under the old lighthouse.")
            o.remember("Council meeting notes from last tuesday.")
            resp = o.search("where is the treasure buried")
            assert resp.hits
            o.flush()
        with MemoryOrchestrator(p, HashEmbedder(64), cfg) as o2:
            assert o2.engine.vector.kind == "hnsw"
            resp = o2.search("treasure lighthouse")
            assert resp.hits


class TestBf16AutoMode:
    def test_auto_flips_to_bf16_at_threshold(self, monkeypatch):
        import jax.numpy as jnp
        import wax_tpu.search.vector_engines as ve

        monkeypatch.setattr(ve, "BF16_AUTO_ROWS", 1000)
        rng = np.random.default_rng(0)
        eng = ve.FlatVectorEngine(dim=32)  # device_dtype defaults to "auto"
        vecs = rng.standard_normal((900, 32)).astype(np.float32)
        eng.add_batch(np.arange(900), vecs)
        assert eng.snapshot().emb.dtype == jnp.float32
        more = rng.standard_normal((200, 32)).astype(np.float32)
        eng.add_batch(np.arange(900, 1100), more)
        snap = eng.snapshot()
        assert snap.emb.dtype == jnp.bfloat16

        # recall vs an exact f32 engine: bf16 top-10 overlap stays high
        exact = ve.FlatVectorEngine(dim=32, device_dtype=None)
        exact.add_batch(np.arange(1100), np.concatenate([vecs, more]))
        q = rng.standard_normal((16, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        _, f_bf = eng.search(q, 10)
        _, f_ex = exact.search(q, 10)
        overlap = np.mean([
            len(set(f_bf[i]) & set(f_ex[i])) / 10 for i in range(len(q))
        ])
        assert overlap >= 0.9, overlap

    def test_explicit_none_stays_f32(self):
        import jax.numpy as jnp
        from wax_tpu.search.vector_engines import FlatVectorEngine

        eng = FlatVectorEngine(dim=16, device_dtype=None)
        eng.add_batch(np.arange(10), np.random.default_rng(1).standard_normal((10, 16)).astype(np.float32))
        assert eng.snapshot().emb.dtype == jnp.float32


class TestIVFIncrementalAdds:
    """IVF inserts slot into existing buckets without re-running k-means (the
    USearch-add analogue); removals/upserts/2x growth force a full retrain."""

    def _engine(self, n0=512, dim=32, seed=0):
        from wax_tpu.search.vector_engines import IVFVectorEngine

        rng = np.random.default_rng(seed)
        v = rng.standard_normal((n0, dim)).astype(np.float32)
        e = IVFVectorEngine(dim=dim, n_clusters=8)
        e.add_batch(np.arange(n0), v)
        e.snapshot()  # initial full build
        return e, rng

    def test_incremental_add_is_searchable_without_retrain(self):
        e, rng = self._engine()
        full_builds = e.snapshot_count
        new = rng.standard_normal((16, 32)).astype(np.float32)
        e.add_batch(np.arange(1000, 1016), new)
        vals, fids = e.search(new, k=1)
        assert e.incremental_count == 1
        # every new vector finds itself (nprobe default covers its own bucket)
        assert set(fids[:, 0].tolist()) == set(range(1000, 1016))
        assert e._trained_count == 512  # no retrain happened

    def test_remove_forces_full_rebuild(self):
        e, rng = self._engine()
        assert e.remove(5)
        e.add(2000, rng.standard_normal(32).astype(np.float32))
        e.search(rng.standard_normal((1, 32)).astype(np.float32), k=4)
        assert e.incremental_count == 0
        assert e._trained_count == 512  # rebuilt over 512 live (512 - 1 + 1)

    def test_upsert_forces_full_rebuild(self):
        e, rng = self._engine()
        e.add(5, rng.standard_normal(32).astype(np.float32))  # fid 5 already present
        e.search(rng.standard_normal((1, 32)).astype(np.float32), k=4)
        assert e.incremental_count == 0
        # the stale copy must be gone: searching the NEW vector finds fid 5 once
        snap = e.snapshot()
        ids = np.asarray(snap.ids)
        assert (ids == 5).sum() == 1

    def test_growth_bound_retrains(self):
        e, rng = self._engine(n0=128)
        big = rng.standard_normal((512, 32)).astype(np.float32)
        e.add_batch(np.arange(5000, 5512), big)  # 5x growth > 2x bound
        e.search(big[:4], k=4)
        assert e.incremental_count == 0 and e._trained_count == 640

    def test_full_probe_exactness_after_incremental(self):
        e, rng = self._engine()
        new = rng.standard_normal((8, 32)).astype(np.float32)
        e.add_batch(np.arange(3000, 3008), new)
        q = rng.standard_normal((4, 32)).astype(np.float32)
        e.nprobe = 8  # all clusters -> exhaustive
        _, fids = e.search(q, k=10)
        # oracle over the builder's live vectors
        state = e.builder.state_arrays()
        live = state["active"]
        vecs, fr = state["emb"][live], state["frame_ids"][live]
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        oracle = np.asarray(fr)[np.argsort(-(qn @ vecs.T), axis=1)[:, :10]]
        overlap = np.mean([
            len(set(fids[i].tolist()) & set(oracle[i].tolist())) / 10 for i in range(4)
        ])
        assert overlap == 1.0

    def test_intra_batch_upsert_forces_full_rebuild(self):
        e, rng = self._engine()
        v = rng.standard_normal((2, 32)).astype(np.float32)
        # same NEW fid twice in one batch: builder keeps the second copy only
        e.add_batch(np.asarray([4000, 4000]), v)
        e.search(rng.standard_normal((1, 32)).astype(np.float32), k=4)
        assert e.incremental_count == 0
        snap = e.snapshot()
        assert (np.asarray(snap.ids) == 4000).sum() == 1

    def test_random_interleaving_full_probe_exactness(self):
        """Property: after ANY interleaving of adds/removes/upserts/searches, a
        full-probe search equals the brute-force oracle over the live set."""
        from wax_tpu.search.vector_engines import IVFVectorEngine

        rng = np.random.default_rng(42)
        e = IVFVectorEngine(dim=16, n_clusters=4)
        live: dict[int, np.ndarray] = {}
        next_fid = 0
        for step in range(60):
            op = rng.random()
            if op < 0.55 or not live:
                v = rng.standard_normal(16).astype(np.float32)
                e.add(next_fid, v)
                live[next_fid] = v / np.linalg.norm(v)
                next_fid += 1
            elif op < 0.75:
                fid = int(rng.choice(list(live)))
                assert e.remove(fid)
                del live[fid]
            elif op < 0.85:
                fid = int(rng.choice(list(live)))
                v = rng.standard_normal(16).astype(np.float32)
                e.add(fid, v)  # upsert
                live[fid] = v / np.linalg.norm(v)
            else:
                q = rng.standard_normal((2, 16)).astype(np.float32)
                e.nprobe = 4
                _, fids = e.search(q, k=min(5, len(live)))
                mat = np.stack([live[f] for f in sorted(live)])
                ids = np.asarray(sorted(live))
                qn = q / np.linalg.norm(q, axis=1, keepdims=True)
                k = min(5, len(live))
                oracle = ids[np.argsort(-(qn @ mat.T), axis=1)[:, :k]]
                for r in range(2):
                    assert set(fids[r, :k].tolist()) == set(oracle[r].tolist()), step


class TestIVFEngineSpill:
    def test_spilled_engine_builds_and_searches(self, tmp_path):
        import numpy as np

        from wax_tpu.search.vector_engines import IVFVectorEngine

        rng = np.random.default_rng(4)
        centers = rng.standard_normal((16, 32)).astype(np.float32) * 3
        vecs = centers[rng.integers(0, 16, 4096)] + rng.standard_normal((4096, 32)).astype(np.float32)
        eng = IVFVectorEngine(dim=32, n_clusters=16, spill="auto")
        eng.add_batch(np.arange(4096), vecs)
        vals, fids = eng.search(vecs[:4], k=5)
        assert eng._snap.spilled
        for r in range(4):
            assert fids[r][0] == r  # self-match survives dedup
            live = fids[r][fids[r] >= 0]
            assert len(live) == len(set(live.tolist()))

    def test_spilled_engine_adds_force_full_repack(self):
        import numpy as np

        from wax_tpu.search.vector_engines import IVFVectorEngine

        rng = np.random.default_rng(5)
        eng = IVFVectorEngine(dim=16, n_clusters=8, spill="auto")
        eng.add_batch(np.arange(512), rng.standard_normal((512, 16)).astype(np.float32))
        eng.search(rng.standard_normal((1, 16)).astype(np.float32), k=3)
        eng.add_batch(np.arange(512, 520), rng.standard_normal((8, 16)).astype(np.float32))
        eng.search(rng.standard_normal((1, 16)).astype(np.float32), k=3)
        assert eng.incremental_count == 0  # spill disables in-place slotting
        assert eng._snap.spilled

    def test_spill_survives_serialization(self):
        import numpy as np

        from wax_tpu.orchestrator.serialization import (
            deserialize_vector_engine,
            serialize_vector_engine,
        )
        from wax_tpu.search.vector_engines import IVFVectorEngine

        rng = np.random.default_rng(6)
        eng = IVFVectorEngine(dim=16, n_clusters=8, spill="auto")
        eng.add_batch(np.arange(256), rng.standard_normal((256, 16)).astype(np.float32))
        blob, attrs = serialize_vector_engine(eng)
        assert attrs["spill"] == "auto"
        eng2 = deserialize_vector_engine(blob, attrs)
        assert eng2.spill == "auto"
        eng2.search(rng.standard_normal((1, 16)).astype(np.float32), k=3)
        assert eng2._snap.spilled
