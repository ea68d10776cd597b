"""IVF index: k-means build, packing invariants, recall vs the flat oracle, exactness
at full probe, serialization via the vector-engine layer is covered separately."""
import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.dense import DenseIndexBuilder
from wax_tpu.index.ivf import build_ivf, ivf_search_topk, kmeans
from wax_tpu.ops.flat_scan import flat_scan_topk


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(2)
    centers = rng.standard_normal((50, 64)).astype(np.float32) * 3.0
    assign = rng.integers(0, 50, 8000)
    vecs = centers[assign] + rng.standard_normal((8000, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    queries = centers[rng.integers(0, 50, 32)] + rng.standard_normal((32, 64)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return vecs, queries


@pytest.fixture(scope="module")
def oracle(clustered):
    vecs, queries = clustered
    d = DenseIndexBuilder(dim=64)
    d.add_batch(np.arange(len(vecs)), vecs)
    _, _, fids = flat_scan_topk(jnp.asarray(queries), d.snapshot(), 10, backend="xla")
    return np.asarray(fids)


def _recall(found, truth, k=10):
    return np.mean([len(set(found[i, :k].tolist()) & set(truth[i, :k].tolist())) / k for i in range(len(found))])


class TestBuild:
    def test_kmeans_runs(self, clustered):
        vecs, _ = clustered
        cent, assign = kmeans(jnp.asarray(vecs[:2000]), 32, iters=4)
        assert cent.shape == (32, 64)
        assert int(jnp.max(assign)) < 32

    def test_every_vector_packed_once(self, clustered):
        vecs, _ = clustered
        idx = build_ivf(vecs, np.arange(len(vecs)), n_clusters=64)
        ids = np.asarray(idx.ids)
        live = ids[ids >= 0]
        assert len(live) == len(vecs)
        assert len(np.unique(live)) == len(vecs)

    def test_bucket_capacity_respected(self, clustered):
        vecs, _ = clustered
        idx = build_ivf(vecs, np.arange(len(vecs)), n_clusters=64)
        assert idx.emb.shape[0] * idx.emb.shape[1] >= len(vecs)


class TestSearch:
    def test_recall_modest_probe(self, clustered, oracle):
        vecs, queries = clustered
        idx = build_ivf(vecs, np.arange(len(vecs)), n_clusters=64, seed=1)
        _, fids = ivf_search_topk(jnp.asarray(queries), idx, k=10, nprobe=8)
        rec = _recall(np.asarray(fids), oracle)
        assert rec >= 0.9, rec

    def test_exact_at_full_probe(self, clustered, oracle):
        vecs, queries = clustered
        idx = build_ivf(vecs, np.arange(len(vecs)), n_clusters=32, seed=1)
        _, fids = ivf_search_topk(jnp.asarray(queries), idx, k=10, nprobe=32)
        assert _recall(np.asarray(fids), oracle) == 1.0

    def test_nprobe_monotone(self, clustered, oracle):
        vecs, queries = clustered
        idx = build_ivf(vecs, np.arange(len(vecs)), n_clusters=64, seed=1)
        recalls = []
        for p in (1, 4, 16, 64):
            _, fids = ivf_search_topk(jnp.asarray(queries), idx, k=10, nprobe=p)
            recalls.append(_recall(np.asarray(fids), oracle))
        assert recalls == sorted(recalls) or recalls[-1] >= recalls[0]
        assert recalls[-1] == 1.0

    def test_self_query(self, clustered):
        vecs, _ = clustered
        idx = build_ivf(vecs, np.arange(len(vecs)), n_clusters=64, seed=1)
        _, fids = ivf_search_topk(jnp.asarray(vecs[:8]), idx, k=1, nprobe=4)
        np.testing.assert_array_equal(np.asarray(fids)[:, 0], np.arange(8))

    def test_k_exceeds_candidates(self, clustered):
        vecs, _ = clustered
        idx = build_ivf(vecs[:50], np.arange(50), n_clusters=4, bucket_size=16)
        vals, fids = ivf_search_topk(jnp.asarray(vecs[:2]), idx, k=40, nprobe=1)
        assert fids.shape == (2, 40)

    def test_train_rows_subsample_build(self, clustered):
        """Bounded k-means training set (build_ivf train_rows): assignments still
        cover every row, self-query stays exact, and recall at wide nprobe is intact
        (the 10M-scale HBM-bounded build path, scripts/ivf_recall_scale.py)."""
        vecs, queries = clustered
        idx = build_ivf(
            vecs, np.arange(len(vecs)), n_clusters=64, seed=1, train_rows=len(vecs) // 4
        )
        assert int(jnp.sum(idx.ids >= 0)) == len(vecs)  # every row packed exactly once
        _, fids = ivf_search_topk(jnp.asarray(vecs[:8]), idx, k=1, nprobe=4)
        np.testing.assert_array_equal(np.asarray(fids)[:, 0], np.arange(8))
        _, wide = ivf_search_topk(jnp.asarray(queries), idx, k=10, nprobe=64)
        # probing every cluster is exhaustive regardless of training-sample quality
        oracle_scores = np.asarray(jnp.asarray(queries) @ jnp.asarray(vecs).T)
        oracle = np.argsort(-oracle_scores, axis=1)[:, :10]
        assert _recall(np.asarray(wide), oracle) == 1.0


class TestSpill:
    """Boundary replication (build_ivf(spill=...)): recall lever + dedup contract."""

    def _build(self, clustered, spill):
        vecs, _ = clustered
        return build_ivf(
            vecs, np.arange(len(vecs)), n_clusters=64, bucket_size=256,
            iters=4, spill=spill,
        )

    def test_spill_flag_and_extra_copies(self, clustered):
        base = self._build(clustered, 0.0)
        sp = self._build(clustered, 0.25)
        assert not base.spilled and sp.spilled
        n_base = int(np.sum(np.asarray(base.ids) >= 0))
        n_sp = int(np.sum(np.asarray(sp.ids) >= 0))
        assert n_base == len(clustered[0])
        assert n_sp > n_base  # replicas landed

    def test_no_duplicate_fids_in_results(self, clustered):
        vecs, queries = clustered
        sp = self._build(clustered, "auto")
        _, fids = ivf_search_topk(jnp.asarray(queries), sp, k=10, nprobe=4)
        got = np.asarray(fids)
        for row in got:
            live = row[row >= 0]
            assert len(live) == len(set(live.tolist()))

    def test_recall_improves_at_fixed_nprobe(self, clustered, oracle):
        vecs, queries = clustered
        base = self._build(clustered, 0.0)
        sp = self._build(clustered, "auto")
        _, f_base = ivf_search_topk(jnp.asarray(queries), base, k=10, nprobe=2)
        _, f_sp = ivf_search_topk(jnp.asarray(queries), sp, k=10, nprobe=2)
        r_base = _recall(np.asarray(f_base), oracle)
        r_sp = _recall(np.asarray(f_sp), oracle)
        assert r_sp >= r_base

    def test_exact_at_full_probe_with_spill(self, clustered, oracle):
        vecs, queries = clustered
        sp = self._build(clustered, "auto")
        _, fids = ivf_search_topk(jnp.asarray(queries), sp, k=10, nprobe=sp.n_clusters)
        assert _recall(np.asarray(fids), oracle) == 1.0

    def test_pallas_kernel_parity_on_spilled(self, clustered):
        from wax_tpu.ops.ivf_kernel import ivf_search_topk_pallas

        vecs, queries = clustered
        sp = self._build(clustered, "auto")
        v1, f1 = ivf_search_topk(jnp.asarray(queries), sp, k=10, nprobe=4)
        v2, f2 = ivf_search_topk_pallas(jnp.asarray(queries), sp, k=10, nprobe=4)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)

    def test_live_slots_remain_prefix(self, clustered):
        sp = self._build(clustered, "auto")
        ids = np.asarray(sp.ids)
        for c in range(ids.shape[0]):
            live = ids[c] >= 0
            n = int(live.sum())
            assert live[:n].all() and not live[n:].any()
