"""Pallas DMA-gather IVF kernel: parity with the XLA reference path (interpret mode),
padding/masking edges, odd batch sizes."""
import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.ivf import build_ivf, ivf_search_topk
from wax_tpu.ops.ivf_kernel import ivf_search_topk_pallas


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(4)
    centers = rng.standard_normal((40, 64)).astype(np.float32) * 3
    vecs = centers[rng.integers(0, 40, 6000)] + rng.standard_normal((6000, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    idx = build_ivf(vecs, np.arange(6000), n_clusters=48, seed=3)
    return idx, vecs


class TestKernelParity:
    @pytest.mark.parametrize("b,nprobe,k", [(16, 8, 10), (13, 6, 10), (1, 4, 5), (32, 48, 20)])
    def test_matches_reference(self, built, b, nprobe, k):
        idx, vecs = built
        q = jnp.asarray(vecs[:b])
        v1, f1 = ivf_search_topk(q, idx, k=k, nprobe=nprobe)
        v2, f2 = ivf_search_topk_pallas(q, idx, k=k, nprobe=nprobe)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-5)

    def test_self_query(self, built):
        idx, vecs = built
        _, fids = ivf_search_topk_pallas(jnp.asarray(vecs[:8]), idx, k=1, nprobe=4)
        np.testing.assert_array_equal(np.asarray(fids)[:, 0], np.arange(8))

    def test_unaligned_bucket_rejected(self, built):
        idx, vecs = built
        bad = build_ivf(vecs[:200], np.arange(200), n_clusters=4, bucket_size=88)
        with pytest.raises(ValueError):
            ivf_search_topk_pallas(jnp.asarray(vecs[:8]), bad, k=3, nprobe=2)

    def test_padding_never_returned(self, built):
        idx, vecs = built
        # probe buckets exhaustively with k larger than any bucket's live count
        _, fids = ivf_search_topk_pallas(jnp.asarray(vecs[:8]), idx, k=50, nprobe=2)
        f = np.asarray(fids)
        for row in f:
            live = row[row >= 0]
            assert len(np.unique(live)) == len(live)  # no duplicate/padding ids per query
