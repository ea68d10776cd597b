"""HNSW: build correctness, recall@10 vs flat-scan oracle across the efSearch sweep,
upsert/remove, serialization round-trip.

The recall-parity-vs-oracle axis is the HNSW analogue of the reference's crash-count
assertions (SURVEY.md §4 implications; BASELINE.md config: M=16, efSearch sweep vs
flat-scan ground truth).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.dense import DenseIndexBuilder
from wax_tpu.index.graph import HNSWBuilder
from wax_tpu.ops.beam_search import hnsw_search
from wax_tpu.ops.flat_scan import flat_scan_topk, normalize_rows


def _recall_at_k(found: np.ndarray, truth: np.ndarray, k: int) -> float:
    hits = 0
    for f, t in zip(found, truth):
        hits += len(set(f[:k].tolist()) & set(t[:k].tolist()))
    return hits / (len(found) * k)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    n, d = 3000, 64
    # clustered data (realistic for embeddings; also harder for graphs than uniform)
    centers = rng.standard_normal((20, d)) * 2.0
    assign = rng.integers(0, 20, n)
    vecs = (centers[assign] + rng.standard_normal((n, d))).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    queries = (centers[rng.integers(0, 20, 32)] + rng.standard_normal((32, d))).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    return vecs, queries


@pytest.fixture(scope="module")
def built(corpus):
    vecs, _ = corpus
    b = HNSWBuilder(dim=64, m=16, ef_construction=100, seed=0)
    b.add_batch(np.arange(len(vecs)), vecs)
    return b


@pytest.fixture(scope="module")
def oracle(corpus):
    vecs, queries = corpus
    d = DenseIndexBuilder(dim=64)
    d.add_batch(np.arange(len(vecs)), vecs)
    idx = d.snapshot()
    _, _, fids = flat_scan_topk(jnp.asarray(queries), idx, 10, backend="xla")
    return np.asarray(fids)


class TestRecall:
    def test_recall_at_10(self, built, corpus, oracle):
        _, queries = corpus
        graph = built.snapshot()
        _, fids = hnsw_search(jnp.asarray(queries), graph, k=10, ef=64)
        rec = _recall_at_k(np.asarray(fids), oracle, 10)
        assert rec >= 0.9, f"recall@10 {rec:.3f} below 0.9"

    def test_ef_sweep_monotone_ish(self, built, corpus, oracle):
        _, queries = corpus
        graph = built.snapshot()
        recalls = []
        for ef in (16, 64, 256):
            _, fids = hnsw_search(jnp.asarray(queries), graph, k=10, ef=ef)
            recalls.append(_recall_at_k(np.asarray(fids), oracle, 10))
        assert recalls[-1] >= recalls[0]
        assert recalls[-1] >= 0.95, recalls

    def test_exact_vector_found(self, built, corpus):
        vecs, _ = corpus
        graph = built.snapshot()
        q = jnp.asarray(vecs[42][None, :])
        vals, fids = hnsw_search(q, graph, k=1, ef=64)
        assert int(fids[0, 0]) == 42
        assert float(vals[0, 0]) == pytest.approx(1.0, abs=1e-4)


class TestMutation:
    def test_remove_masks(self, corpus):
        vecs, _ = corpus
        b = HNSWBuilder(dim=64, m=8, ef_construction=60)
        b.add_batch(np.arange(500), vecs[:500])
        b.remove(42)
        graph = b.snapshot()
        q = jnp.asarray(vecs[42][None, :])
        _, fids = hnsw_search(q, graph, k=5, ef=32)
        assert 42 not in np.asarray(fids)

    def test_upsert(self, corpus):
        vecs, _ = corpus
        b = HNSWBuilder(dim=64, m=8, ef_construction=60)
        b.add_batch(np.arange(200), vecs[:200])
        newvec = vecs[300]
        b.add(7, newvec)  # upsert id 7 with a different vector
        graph = b.snapshot()
        _, fids = hnsw_search(jnp.asarray(newvec[None, :]), graph, k=1, ef=32)
        assert int(fids[0, 0]) == 7

    def test_empty_and_single(self):
        b = HNSWBuilder(dim=8)
        b.add(0, np.ones(8, np.float32))
        graph = b.snapshot()
        _, fids = hnsw_search(jnp.asarray(np.ones((1, 8), np.float32) / np.sqrt(8)), graph, k=3, ef=8)
        out = np.asarray(fids)[0]
        assert out[0] == 0 and (out[1:] == -1).all()


class TestSerialization:
    def test_state_roundtrip(self, corpus):
        vecs, queries = corpus
        b = HNSWBuilder(dim=64, m=8, ef_construction=60)
        b.add_batch(np.arange(400), vecs[:400])
        arrays = b.state_arrays()
        b2 = HNSWBuilder.from_state_arrays(arrays, dim=64)
        g1, g2 = b.snapshot(), b2.snapshot()
        np.testing.assert_array_equal(np.asarray(g1.adjacency), np.asarray(g2.adjacency))
        q = jnp.asarray(queries[:4])
        _, f1 = hnsw_search(q, g1, k=5, ef=32)
        _, f2 = hnsw_search(q, g2, k=5, ef=32)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        # continue building after restore
        b2.add(999, vecs[500])
        assert 999 in b2


def test_snapshot_seed_cap_exact():
    """Seed sampling hits the cap exactly-ish at every size band — the old python
    stride (`seeds[::len//cap+1]`) undershot by up to ~50% just above the cap."""
    import numpy as np

    from wax_tpu.index.graph import HNSWBuilder

    rng = np.random.default_rng(0)
    b = HNSWBuilder(dim=16, m=4)
    b.add_batch(np.arange(3000), rng.standard_normal((3000, 16), dtype=np.float32))
    n1 = int((b._levels[:3000] >= 1).sum())
    for cap in (8, 64, 512, n1 - n1 // 3, 8192):  # n1-n1//3 = the undershoot band
        g = b.snapshot(seed_cap=cap)
        uniq = len(np.unique(np.asarray(g.entries)))
        want = min(cap, 3000)
        assert want - 8 <= uniq <= want + 8, (cap, uniq)
        assert g.entries.shape[0] % 8 == 0
