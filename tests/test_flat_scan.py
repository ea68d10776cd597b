"""Dense flat-scan correctness: XLA path vs numpy oracle, Pallas path vs XLA path.

Mirrors the reference's vector-engine correctness strategy (reference:
Tests/.../MetalVectorEngineBenchmark.swift:18-131 — GPU search checked against exact
results, correctness-after-add) with the TPU twist that the Pallas kernel is checked
tile-by-tile against the XLA oracle, including masking of tombstones and padding.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.dense import DenseIndexBuilder, Similarity
from wax_tpu.ops.flat_scan import flat_scan_topk, normalize_rows
from wax_tpu.ops.topk import NEG_INF, masked_top_k, merge_topk


def _numpy_oracle(q, emb, active, k):
    scores = q @ emb.T
    scores = np.where(active[None, :], scores, -np.inf)
    order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(scores, order, axis=1)
    order = np.where(np.isfinite(vals), order, -1)
    return vals, order


def _build(rng, n=3000, d=64, k_similarity=Similarity.COSINE):
    b = DenseIndexBuilder(dim=d, similarity=k_similarity)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(100, 100 + n)
    b.add_batch(ids, vecs)
    return b, vecs, ids


class TestXlaScan:
    def test_matches_numpy_oracle(self, rng):
        b, vecs, ids = _build(rng)
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((7, 64)).astype(np.float32)))
        vals, rows, fids = flat_scan_topk(q, idx, 10, backend="xla")

        emb_n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        active = np.zeros(idx.capacity, bool)
        active[: len(vecs)] = True
        emb_full = np.zeros((idx.capacity, 64), np.float32)
        emb_full[: len(vecs)] = emb_n
        ovals, orows = _numpy_oracle(np.asarray(q), emb_full, active, 10)
        np.testing.assert_allclose(np.asarray(vals), ovals, rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(rows), orows)
        np.testing.assert_array_equal(np.asarray(fids), ids[orows])

    def test_remove_masks_out(self, rng):
        b, vecs, ids = _build(rng, n=50)
        # query exactly equal to vector 7 -> it must win; after removal it must not appear
        q = normalize_rows(jnp.asarray(vecs[7][None, :]))
        idx = b.snapshot()
        _, _, fids = flat_scan_topk(q, idx, 5, backend="xla")
        assert int(fids[0, 0]) == int(ids[7])
        assert b.remove(int(ids[7]))
        idx2 = b.snapshot()
        _, _, fids2 = flat_scan_topk(q, idx2, 5, backend="xla")
        assert int(ids[7]) not in np.asarray(fids2)

    def test_upsert_replaces(self, rng):
        b, vecs, ids = _build(rng, n=20)
        newvec = rng.standard_normal(64).astype(np.float32)
        b.add(int(ids[3]), newvec)
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(newvec[None, :]))
        vals, _, fids = flat_scan_topk(q, idx, 1, backend="xla")
        assert int(fids[0, 0]) == int(ids[3])
        assert float(vals[0, 0]) == pytest.approx(1.0, abs=1e-5)

    def test_k_larger_than_count(self, rng):
        b, _, _ = _build(rng, n=5)
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32)))
        vals, rows, fids = flat_scan_topk(q, idx, 12, backend="xla")
        assert np.all(np.asarray(fids)[:, 5:] == -1)
        assert np.all(np.asarray(vals)[:, 5:] <= float(NEG_INF))

    def test_dot_similarity(self, rng):
        b = DenseIndexBuilder(dim=32, similarity=Similarity.DOT)
        vecs = rng.standard_normal((100, 32)).astype(np.float32)
        b.add_batch(np.arange(100), vecs)
        idx = b.snapshot()
        q = jnp.asarray(rng.standard_normal((3, 32)).astype(np.float32))
        vals, rows, _ = flat_scan_topk(q, idx, 4, backend="xla")
        scores = np.asarray(q) @ vecs.T
        exp = np.sort(scores, axis=1)[:, ::-1][:, :4]
        np.testing.assert_allclose(np.asarray(vals), exp, rtol=1e-5, atol=1e-5)

    def test_euclidean_similarity(self, rng):
        b = DenseIndexBuilder(dim=16, similarity=Similarity.EUCLIDEAN)
        vecs = rng.standard_normal((64, 16)).astype(np.float32)
        b.add_batch(np.arange(64), vecs)
        idx = b.snapshot()
        q = np.asarray(rng.standard_normal((2, 16)), np.float32)
        _, rows, _ = flat_scan_topk(jnp.asarray(q), idx, 3, backend="xla")
        d2 = ((q[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
        exp = np.argsort(d2, axis=1, kind="stable")[:, :3]
        np.testing.assert_array_equal(np.asarray(rows), exp)


class TestPallasScan:
    @pytest.mark.parametrize("n,bq,k", [(3000, 7, 10), (1024, 1, 1), (5000, 300, 32)])
    def test_matches_xla(self, rng, n, bq, k):
        b, _, _ = _build(rng, n=n)
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((bq, 64)).astype(np.float32)))
        v1, r1, f1 = flat_scan_topk(q, idx, k, backend="xla")
        v2, r2, f2 = flat_scan_topk(q, idx, k, backend="pallas_exact")
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    def test_with_tombstones(self, rng):
        b, vecs, ids = _build(rng, n=2000)
        for fid in ids[::5][:100]:
            b.remove(int(fid))
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((9, 64)).astype(np.float32)))
        v1, r1, f1 = flat_scan_topk(q, idx, 10, backend="xla")
        v2, r2, f2 = flat_scan_topk(q, idx, 10, backend="pallas_exact")
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        removed = set(int(x) for x in ids[::5][:100])
        assert removed.isdisjoint(set(np.asarray(f2).ravel().tolist()))


@pytest.mark.parametrize("backend", ["pallas_packed", "pallas_packed_sel"])
class TestPackedScan:
    """The packed-key kernels: "pallas_packed" (k-pass eviction loop) and
    "pallas_packed_sel" (single accumulate-then-select pass, top-L per lane slot).
    Both deterministic, duplicate-safe, lowest-index ties on the returned k;
    scores compared at <= 2^-12 relative truncation."""

    @pytest.mark.parametrize("n,bq,k", [(3000, 7, 10), (1024, 1, 1), (5000, 64, 32)])
    def test_overlap_vs_oracle(self, rng, n, bq, k, backend):
        b, _, _ = _build(rng, n=n)
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((bq, 64)).astype(np.float32)))
        v1, _, f1 = flat_scan_topk(q, idx, k, backend="xla")
        v2, _, f2 = flat_scan_topk(q, idx, k, backend=backend)
        f1, f2 = np.asarray(f1), np.asarray(f2)
        overlap = np.mean(
            [len(set(f1[r]) & set(f2[r])) / max(1, (f1[r] >= 0).sum()) for r in range(bq)]
        )
        assert overlap >= 0.99, overlap
        # values of agreeing slots match to the truncation bound
        agree = f1 == f2
        np.testing.assert_allclose(
            np.asarray(v1)[agree], np.asarray(v2)[agree], rtol=2**-11, atol=1e-6
        )

    def test_exact_on_separated_scores(self, rng, backend):
        # plant scores whose pairwise relative gaps far exceed the 2^-12 truncation:
        # the packed kernel must then match the oracle exactly
        from wax_tpu.index.dense import DenseIndexBuilder

        n, d = 2560, 64
        base = rng.standard_normal(d).astype(np.float32)
        base /= np.linalg.norm(base)
        vecs = np.empty((n, d), np.float32)
        mix = np.linspace(0.0, 0.95, n)  # distinct alignment per row
        rng.shuffle(mix)
        for i in range(n):
            noise = rng.standard_normal(d).astype(np.float32)
            noise -= noise @ base * base
            v = mix[i] * base + np.sqrt(max(1e-6, 1 - mix[i] ** 2)) * noise / np.linalg.norm(noise)
            vecs[i] = v / np.linalg.norm(v)
        b = DenseIndexBuilder(dim=d)
        b.add_batch(np.arange(n), vecs)
        idx = b.snapshot()
        q = jnp.asarray(base[None, :])
        v1, r1, f1 = flat_scan_topk(q, idx, 10, backend="xla")
        v2, r2, f2 = flat_scan_topk(q, idx, 10, backend=backend)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=2**-11)

    def test_duplicate_multiplicity_and_lowest_index(self, rng, backend):
        from wax_tpu.index.dense import DenseIndexBuilder

        n, d = 4096, 64
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        dup = vecs[50].copy()
        for row in (130, 700, 2049, 3500, 3971):
            vecs[row] = dup
        b = DenseIndexBuilder(dim=d)
        b.add_batch(np.arange(n), vecs)
        idx = b.snapshot()
        q = jnp.asarray(dup[None, :])
        _, _, fids = flat_scan_topk(q, idx, 6, backend=backend)
        assert list(np.asarray(fids[0])) == [50, 130, 700, 2049, 3500, 3971]

    def test_deterministic(self, rng, backend):
        b, _, _ = _build(rng, n=3000)
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32)))
        v1, _, f1 = flat_scan_topk(q, idx, 10, backend=backend)
        v2, _, f2 = flat_scan_topk(q, idx, 10, backend=backend)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    def test_with_tombstones(self, rng, backend):
        b, vecs, ids = _build(rng, n=2560)
        removed = set(int(x) for x in ids[::5][:100])
        for fid in removed:
            b.remove(fid)
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((9, 64)).astype(np.float32)))
        _, _, f2 = flat_scan_topk(q, idx, 10, backend=backend)
        assert removed.isdisjoint(set(np.asarray(f2).ravel().tolist()))


class TestBlockmaxScan:
    @pytest.mark.parametrize("n,bq,k", [(3000, 7, 10), (1024, 1, 1), (5000, 300, 32)])
    def test_matches_xla(self, rng, n, bq, k):
        b, _, _ = _build(rng, n=n)
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((bq, 64)).astype(np.float32)))
        v1, r1, f1 = flat_scan_topk(q, idx, k, backend="xla")
        v2, r2, f2 = flat_scan_topk(q, idx, k, backend="blockmax")
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    def test_with_tombstones(self, rng):
        b, vecs, ids = _build(rng, n=2000)
        for fid in ids[::7][:120]:
            b.remove(int(fid))
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32)))
        _, _, f1 = flat_scan_topk(q, idx, 10, backend="xla")
        _, _, f2 = flat_scan_topk(q, idx, 10, backend="blockmax")
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    def test_duplicate_vectors_lowest_index_tie_break(self, rng):
        # Regression: blockmax gathered candidate chunks in chunk-max-rank order, so
        # exact duplicates in different chunks broke ties by chunk rank instead of
        # lowest global index, diverging from the xla backend's contract.
        from wax_tpu.index.dense import DenseIndexBuilder

        n, d = 4096, 64
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        qv = rng.standard_normal(d).astype(np.float32)
        qv /= np.linalg.norm(qv)
        # identical mid-score vector planted across many 128-chunks...
        noise = rng.standard_normal(d).astype(np.float32)
        dup = 0.9 * qv + 0.1 * noise / np.linalg.norm(noise)
        dup /= np.linalg.norm(dup)
        for row in (130, 700, 2049, 3500, 3971):
            vecs[row] = dup
        # ...plus a strictly higher scorer in the LAST dup's chunk, so that chunk
        # ranks first by chunk-max and (pre-fix) its dup led the candidate order.
        high = 0.99 * qv + 0.01 * noise / np.linalg.norm(noise)
        vecs[3970] = high / np.linalg.norm(high)
        b = DenseIndexBuilder(dim=d)
        b.add_batch(np.arange(n), vecs)
        idx = b.snapshot()
        q = jnp.asarray(qv[None, :])
        v1, r1, f1 = flat_scan_topk(q, idx, 6, backend="xla")
        v2, r2, f2 = flat_scan_topk(q, idx, 6, backend="blockmax")
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        assert list(np.asarray(f2[0])) == [3970, 130, 700, 2049, 3500, 3971]


class TestBlockmax16Scan:
    """bf16-materialized blockmax + exact f32 rescore window (the auto backend for
    mid N): near-exact set, exact values/order for the returned set."""

    def test_overlap_and_exact_values(self, rng):
        b, vecs, ids = _build(rng, n=36000)
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32)))
        v1, _, f1 = flat_scan_topk(q, idx, 10, backend="xla")
        v2, _, f2 = flat_scan_topk(q, idx, 10, backend="blockmax16")
        f1, f2 = np.asarray(f1), np.asarray(f2)
        overlap = np.mean([len(set(f1[r]) & set(f2[r])) / 10 for r in range(16)])
        assert overlap >= 0.99, overlap
        # values are EXACT f32 rescored — agreeing slots match tightly
        agree = f1 == f2
        np.testing.assert_allclose(np.asarray(v1)[agree], np.asarray(v2)[agree], rtol=1e-6)

    def test_duplicates_lowest_index(self, rng):
        from wax_tpu.index.dense import DenseIndexBuilder

        n, d = 36000, 64
        vecs = rng.standard_normal((n, d)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        dup = vecs[77].copy()
        for row in (501, 9000, 20000, 33333):
            vecs[row] = dup
        b = DenseIndexBuilder(dim=d)
        b.add_batch(np.arange(n), vecs)
        idx = b.snapshot()
        _, _, fids = flat_scan_topk(jnp.asarray(dup[None, :]), idx, 5, backend="blockmax16")
        assert list(np.asarray(fids[0])) == [77, 501, 9000, 20000, 33333]

    def test_tombstones_excluded(self, rng):
        b, vecs, ids = _build(rng, n=36000)
        removed = set(int(x) for x in ids[::9][:300])
        for fid in removed:
            b.remove(fid)
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32)))
        _, _, f = flat_scan_topk(q, idx, 10, backend="blockmax16")
        assert removed.isdisjoint(set(np.asarray(f).ravel().tolist()))

    def test_auto_stays_exact_at_mid_n(self, rng):
        # auto keeps the EXACT blockmax at mid N (blockmax16's rescore gather loses
        # on current XLA — see _blockmax16_topk docstring); blockmax16 is opt-in
        b, _, _ = _build(rng, n=36000)
        idx = b.snapshot()
        assert 32768 < idx.capacity < 524288
        q = normalize_rows(jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32)))
        v_auto, _, f_auto = flat_scan_topk(q, idx, 10, backend="auto")
        v_exp, _, f_exp = flat_scan_topk(q, idx, 10, backend="blockmax")
        np.testing.assert_array_equal(np.asarray(f_auto), np.asarray(f_exp))


class TestChunkmaxScan:
    def test_matches_xla_with_tail_padding(self, rng):
        b, vecs, ids = _build(rng, n=3000)
        idx = b.snapshot()
        assert idx.contiguous
        q = normalize_rows(jnp.asarray(rng.standard_normal((13, 64)).astype(np.float32)))
        v1, r1, f1 = flat_scan_topk(q, idx, 10, backend="xla")
        v2, r2, f2 = flat_scan_topk(q, idx, 10, backend="chunkmax")
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-5)

    def test_contiguous_flag_cleared_by_tombstone(self, rng):
        b, _, ids = _build(rng, n=100)
        assert b.snapshot().contiguous
        b.remove(int(ids[3]))
        assert not b.snapshot().contiguous

    def test_rejects_noncontiguous_index(self, rng):
        # chunkmax's prefix live-count rescore is only valid for tombstone-free
        # indexes; explicit backend selection must refuse rather than silently score
        # deleted rows and drop live chunk tails.
        b, _, ids = _build(rng, n=3000)
        b.remove(int(ids[7]))
        idx = b.snapshot()
        q = normalize_rows(jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32)))
        with pytest.raises(ValueError, match="contiguous"):
            flat_scan_topk(q, idx, 10, backend="chunkmax")


class TestTopkUtils:
    def test_masked_top_k(self):
        s = jnp.asarray([[1.0, 5.0, 3.0, 5.0]])
        vals, idx = masked_top_k(s, 3, mask=jnp.asarray([[True, True, True, False]]))
        np.testing.assert_allclose(np.asarray(vals[0]), [5.0, 3.0, 1.0])
        np.testing.assert_array_equal(np.asarray(idx[0]), [1, 2, 0])

    def test_merge_topk_deterministic_ties(self):
        va = jnp.asarray([[5.0, 1.0]])
        ia = jnp.asarray([[10, 11]], dtype=jnp.int32)
        vb = jnp.asarray([[5.0, 2.0]])
        ib = jnp.asarray([[20, 21]], dtype=jnp.int32)
        v, i = merge_topk(va, ia, vb, ib, 3)
        np.testing.assert_allclose(np.asarray(v[0]), [5.0, 5.0, 2.0])
        np.testing.assert_array_equal(np.asarray(i[0]), [10, 20, 21])


class TestAutoDispatchAlignment:
    def test_auto_never_errors_on_512_aligned_capacity(self):
        """Auto dispatch must not raise for capacities that are 512- but not
        2048-aligned (chunkmax tiles in _TN=2048 blocks; auto falls back)."""
        import dataclasses

        import jax.numpy as jnp

        from wax_tpu.index.dense import DenseIndexBuilder

        rng = np.random.default_rng(0)
        b = DenseIndexBuilder(dim=16)
        b.add_batch(np.arange(64), rng.standard_normal((64, 16)).astype(np.float32))
        idx = b.snapshot()
        n = 525_312  # >= 524288 threshold, 512-aligned, NOT 2048-aligned
        idx = dataclasses.replace(
            idx,
            emb=jnp.zeros((n, 16), jnp.float32),
            frame_ids=jnp.full((n,), -1, jnp.int32).at[:64].set(jnp.arange(64)),
            active=jnp.zeros((n,), bool).at[:64].set(True),
        )
        q = normalize_rows(jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32)))
        vals, rows, fids = flat_scan_topk(q, idx, k=5)
        assert fids.shape == (8, 5)
