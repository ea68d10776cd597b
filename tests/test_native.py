"""Native C++ HNSW builder: interface parity with the Python builder, recall vs the
flat-scan oracle, state interop in both directions, engine integration."""
import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.graph import HNSWBuilder
from wax_tpu.native.build import native_available
from wax_tpu.ops.beam_search import hnsw_search

pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((2000, 64)).astype(np.float32)
    return vecs / np.linalg.norm(vecs, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def built(corpus):
    from wax_tpu.index.graph_cpp import CppHNSWBuilder

    b = CppHNSWBuilder(dim=64, m=16, ef_construction=100)
    b.add_batch(np.arange(len(corpus)), corpus)
    return b


class TestCppBuilder:
    def test_count_contains(self, built, corpus):
        assert len(built) == len(corpus)
        assert 5 in built and 999999 not in built

    def test_recall(self, built, corpus):
        graph = built.snapshot()
        q = jnp.asarray(corpus[:16])
        truth = np.argsort(-(corpus[:16] @ corpus.T), axis=1)[:, :10]
        _, fids = hnsw_search(q, graph, k=10, ef=64)
        f = np.asarray(fids)
        rec = np.mean([len(set(f[i].tolist()) & set(truth[i].tolist())) / 10 for i in range(16)])
        assert rec >= 0.9, rec

    def test_remove_and_upsert(self, corpus):
        from wax_tpu.index.graph_cpp import CppHNSWBuilder

        b = CppHNSWBuilder(dim=64, m=8, ef_construction=50)
        b.add_batch(np.arange(300), corpus[:300])
        assert b.remove(7) and 7 not in b
        b.add(7, corpus[400])
        assert 7 in b
        graph = b.snapshot()
        _, fids = hnsw_search(jnp.asarray(corpus[400][None]), graph, k=1, ef=32)
        assert int(fids[0, 0]) == 7

    def test_state_interop_cpp_to_py(self, built, corpus):
        arrays = built.state_arrays()
        py = HNSWBuilder.from_state_arrays(arrays, dim=64)
        g1, g2 = built.snapshot(), py.snapshot()
        np.testing.assert_array_equal(np.asarray(g1.adjacency), np.asarray(g2.adjacency))

    def test_state_interop_py_to_cpp(self, corpus):
        from wax_tpu.index.graph_cpp import CppHNSWBuilder

        py = HNSWBuilder(dim=64, m=8, ef_construction=50)
        py.add_batch(np.arange(200), corpus[:200])
        cpp = CppHNSWBuilder.from_state_arrays(py.state_arrays(), dim=64)
        assert len(cpp) == 200
        # continue building on the imported graph
        cpp.add(500, corpus[500])
        graph = cpp.snapshot()
        _, fids = hnsw_search(jnp.asarray(corpus[500][None]), graph, k=1, ef=32)
        assert int(fids[0, 0]) == 500

    def test_engine_uses_native(self):
        from wax_tpu.index.graph_cpp import CppHNSWBuilder
        from wax_tpu.search.vector_engines import HNSWVectorEngine

        eng = HNSWVectorEngine(dim=16)
        assert isinstance(eng.builder, CppHNSWBuilder)


class TestNativeBpe:
    """C++ BPE merge core parity with the Python loop (text/bpe.py)."""

    def test_batch_parity_with_python(self):
        import random
        import string

        from wax_tpu.text.bpe import BpeEncoder, load_cl100k

        enc = load_cl100k()
        if not enc.exact:
            pytest.skip("cl100k vocab data not present on this machine")
        if enc._native_handle() is None:
            pytest.skip("native toolchain unavailable")
        py = BpeEncoder(enc.ranks)
        py._native_tried = True  # pin the pure-Python path
        rng = random.Random(7)
        samples = [
            "".join(rng.choice(string.ascii_letters + string.digits + " .,!?'é中")
                    for _ in range(rng.randint(1, 40)))
            for _ in range(400)
        ] + ["truetrue", "don't stop", "   ", "\n\n\t", "ё" * 15, "12345678901234"]
        for s in samples:
            assert enc.encode(s) == py.encode(s), repr(s)

    def test_native_roundtrip(self):
        from wax_tpu.text.bpe import load_cl100k

        enc = load_cl100k()
        if not enc.exact or enc._native_handle() is None:
            pytest.skip("exact vocab or toolchain unavailable")
        s = "The quick brown fox — 2026 edition! Привет 你好."
        assert enc.decode(enc.encode(s)) == s

    def test_piece_memo_stable_and_cap_clear(self):
        """The piece->ids memo must be invisible: repeat encodes are identical,
        and a cap-triggered clear mid-encode must not lose previously-hit pieces
        (the hit/fill split regression)."""
        from wax_tpu.text.bpe import BpeEncoder, load_cl100k

        base = load_cl100k()
        if not base.exact:
            pytest.skip("cl100k vocab data not present on this machine")
        enc = BpeEncoder(base.ranks)  # fresh memo
        s = "repeat repeat banana banana split"
        first = enc.encode(s)
        assert enc.encode(s) == first  # pure memo-hit path
        enc._piece_memo_cap = 1  # every miss batch now clears first
        mixed = enc.encode(s + " zxqvnovel997")
        assert mixed[: len(first)] == first
        oracle = BpeEncoder(base.ranks)
        oracle._native_tried = True  # pure-Python, memo still exercised
        assert mixed == oracle.encode(s + " zxqvnovel997")
