"""Two-level (ICI × DCN) topology: parity of every sharded path across mesh shapes.

SURVEY §5's target topology — full candidate all-gathers inside a pod slice (ICI),
only thin [B, k] merged lists across slices (DCN) — exercised on the virtual
8-device CPU mesh as 2×4 / 4×2 slice layouts (+ tp splits) and checked bit-equal
against the flat single-level mesh and the single-chip reference path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.dense import DenseIndexBuilder
from wax_tpu.index.ivf import build_ivf, ivf_search_topk
from wax_tpu.index.lex import LexIndexBuilder
from wax_tpu.ops.bm25 import bm25_topk, pad_term_ids
from wax_tpu.ops.flat_scan import flat_scan_topk
from wax_tpu.parallel.mesh import (
    corpus_shards,
    data_mesh,
    make_two_level_mesh,
)
from wax_tpu.parallel.sharded_hybrid import (
    shard_lex_index,
    sharded_bm25_topk,
    sharded_hybrid_topk,
)
from wax_tpu.parallel.sharded_ivf import shard_ivf_index, sharded_ivf_search_topk
from wax_tpu.parallel.sharded_scan import shard_dense_index, sharded_flat_scan_topk

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")

D = 64
N = 1024
B = 4
K = 10


def _corpus(seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.standard_normal((N, D), dtype=np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((B, D), dtype=np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return emb, q


def _meshes():
    return [
        ("flat8", data_mesh(8)),
        ("2x4", make_two_level_mesh(2, 4)),
        ("4x2", make_two_level_mesh(4, 2)),
        ("2x2x2", make_two_level_mesh(2, 4, tp=2)),
    ]


class TestTwoLevelMeshShapes:
    def test_axes_and_shards(self):
        m = make_two_level_mesh(2, 4)
        assert m.axis_names == ("slice", "data")
        assert corpus_shards(m) == 8
        m2 = make_two_level_mesh(2, 4, tp=2)
        assert m2.axis_names == ("slice", "data", "tp")
        assert corpus_shards(m2) == 4  # tp planes replicate the corpus

    def test_bad_shapes_raise(self):
        with pytest.raises(ValueError):
            make_two_level_mesh(3)  # 3 does not divide 8
        with pytest.raises(ValueError):
            make_two_level_mesh(2, 8)  # 16 devices needed
        with pytest.raises(ValueError):
            make_two_level_mesh(2, 4, tp=3)


class TestDenseParity:
    def test_flat_scan_parity_across_meshes(self):
        emb, q = _corpus()
        b = DenseIndexBuilder(dim=D)
        for i in range(N):
            b.add(i + 1, emb[i])
        idx = b.snapshot()
        ref_v, _, ref_f = flat_scan_topk(jnp.asarray(q), idx, K)
        ref = (np.asarray(ref_v), np.asarray(ref_f))
        for name, mesh in _meshes():
            sh = shard_dense_index(idx, mesh)
            v, f = sharded_flat_scan_topk(jnp.asarray(q), sh, K, mesh)
            np.testing.assert_allclose(np.asarray(v), ref[0], rtol=1e-5, atol=1e-5, err_msg=name)
            np.testing.assert_array_equal(np.asarray(f), ref[1], err_msg=name)


class TestBm25Parity:
    @pytest.fixture(scope="class")
    def lexdata(self):
        rng = np.random.default_rng(3)
        vocab = [f"t{i}" for i in range(50)]
        b = LexIndexBuilder()
        for i in range(300):
            words = rng.choice(vocab, size=rng.integers(3, 12))
            b.add(i + 1, " ".join(words))
        return b

    @pytest.mark.parametrize("mode", ["any", "all"])
    def test_sharded_bm25_parity(self, lexdata, mode):
        b = lexdata
        tids = b.query_term_ids("t1 t2 t3")
        padded = jnp.asarray(pad_term_ids(tids, dfs=b.df)[None, :])
        vals_ref, _, fids_ref = bm25_topk(padded, b.snapshot(), K, mode=mode)
        for name, mesh in _meshes():
            lex = shard_lex_index(b, mesh, b.row_space())
            v, f = sharded_bm25_topk(padded, lex, K, mesh, mode=mode)
            np.testing.assert_allclose(
                np.asarray(v)[0], np.asarray(vals_ref)[0], rtol=1e-5, atol=1e-6, err_msg=name
            )
            np.testing.assert_array_equal(np.asarray(f)[0], np.asarray(fids_ref)[0], err_msg=name)


class TestIvfParity:
    def test_sharded_ivf_parity(self):
        emb, q = _corpus(1)
        idx = build_ivf(emb, np.arange(1, N + 1), n_clusters=16, iters=4, seed=0)
        ref_v, ref_f = ivf_search_topk(jnp.asarray(q), idx, K, nprobe=4)
        refs = {int(f) for f in np.asarray(ref_f)[0] if f >= 0}
        for name, mesh in _meshes():
            sh = shard_ivf_index(idx, mesh)
            v, f = sharded_ivf_search_topk(jnp.asarray(q), sh, K, mesh, nprobe=4)
            got = {int(x) for x in np.asarray(f)[0] if x >= 0}
            assert got == refs, name
            np.testing.assert_allclose(
                np.sort(np.asarray(v)[0])[::-1],
                np.sort(np.asarray(ref_v)[0])[::-1],
                rtol=1e-5,
                atol=1e-5,
                err_msg=name,
            )


class TestHybridParity:
    def test_fused_hybrid_parity_across_meshes(self):
        emb, q = _corpus(2)
        db = DenseIndexBuilder(dim=D)
        lb = LexIndexBuilder()
        rng = np.random.default_rng(5)
        vocab = [f"w{i}" for i in range(40)]
        for i in range(N):
            db.add(i + 1, emb[i])
            lb.add(i + 1, " ".join(rng.choice(vocab, size=8)))
        didx = db.snapshot()
        tids = lb.query_term_ids("w1 w2")
        padded = jnp.asarray(pad_term_ids(tids, dfs=lb.df)[None, :]).repeat(B, axis=0)
        results = {}
        for name, mesh in _meshes():
            dsh = shard_dense_index(didx, mesh)
            lsh = shard_lex_index(lb, mesh, lb.row_space())
            v, f = sharded_hybrid_topk(jnp.asarray(q), padded, dsh, lsh, K, mesh)
            results[name] = (np.asarray(v), np.asarray(f))
        base = results["flat8"]
        for name, (v, f) in results.items():
            np.testing.assert_allclose(v, base[0], rtol=1e-5, atol=1e-6, err_msg=name)
            np.testing.assert_array_equal(f, base[1], err_msg=name)


class TestUnevenLastShard:
    def test_dense_uneven_rows(self):
        """Row count not divisible by the shard count: padding rows must stay
        masked on every topology (the verdict's uneven-last-shard ask)."""
        rng = np.random.default_rng(9)
        n = 1000  # not divisible by 8
        emb = rng.standard_normal((n, D), dtype=np.float32)
        q = rng.standard_normal((3, D), dtype=np.float32)
        b = DenseIndexBuilder(dim=D)
        for i in range(n):
            b.add(i + 1, emb[i])
        idx = b.snapshot()
        ref_v, _, ref_f = flat_scan_topk(jnp.asarray(q), idx, 7)
        for name, mesh in _meshes():
            sh = shard_dense_index(idx, mesh)
            v, f = sharded_flat_scan_topk(jnp.asarray(q), sh, 7, mesh)
            np.testing.assert_array_equal(np.asarray(f), np.asarray(ref_f), err_msg=name)
            assert (np.asarray(f) >= 0).all() or (np.asarray(v)[np.asarray(f) < 0] < -1e30).all()

    def test_lex_and_hybrid_uneven_rows(self):
        """Row count not divisible by the shard count for the LEX and fused-hybrid
        paths (the dense case above only covered the scan): the last shard's
        padding rows carry zero postings and dead frame ids, and every topology —
        incl. tp>1 combined with data sharding in one program — must stay
        bit-equal to the single-chip reference."""
        n = 1000  # not divisible by 8, 4, or the 2x2x2 corpus shards
        rng = np.random.default_rng(11)
        emb = rng.standard_normal((n, D), dtype=np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        q = rng.standard_normal((3, D), dtype=np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        db = DenseIndexBuilder(dim=D)
        lb = LexIndexBuilder()
        vocab = [f"w{i}" for i in range(30)]
        for i in range(n):
            db.add(i + 1, emb[i])
            lb.add(i + 1, " ".join(rng.choice(vocab, size=8)))
        didx = db.snapshot()
        tids = lb.query_term_ids("w1 w2 w3")
        padded1 = jnp.asarray(pad_term_ids(tids, dfs=lb.df)[None, :])
        paddedB = padded1.repeat(3, axis=0)
        for mode in ("any", "all"):
            v_ref, _, f_ref = bm25_topk(padded1, lb.snapshot(), K, mode=mode)
            for name, mesh in _meshes():
                lex = shard_lex_index(lb, mesh, lb.row_space())
                v, f = sharded_bm25_topk(padded1, lex, K, mesh, mode=mode)
                np.testing.assert_allclose(
                    np.asarray(v)[0], np.asarray(v_ref)[0], rtol=1e-5, atol=1e-6,
                    err_msg=f"{name}/{mode}")
                np.testing.assert_array_equal(
                    np.asarray(f)[0], np.asarray(f_ref)[0], err_msg=f"{name}/{mode}")
        results = {}
        for name, mesh in _meshes():
            dsh = shard_dense_index(didx, mesh)
            lsh = shard_lex_index(lb, mesh, lb.row_space())
            v, f = sharded_hybrid_topk(jnp.asarray(q), paddedB, dsh, lsh, K, mesh)
            results[name] = (np.asarray(v), np.asarray(f))
        base = results["flat8"]
        for name, (v, f) in results.items():
            np.testing.assert_allclose(v, base[0], rtol=1e-5, atol=1e-6, err_msg=name)
            np.testing.assert_array_equal(f, base[1], err_msg=name)


class TestOrchestratorTopology:
    """OrchestratorConfig(mesh_slices/mesh_tp): the SERVING path — not just the
    kernels — runs the two-level topology, and results are identical to the flat
    sharded config and the unsharded single-chip config."""

    def _build(self, path, **cfg_kw):
        from wax_tpu.embed.hash_embedder import HashEmbedder
        from wax_tpu.orchestrator.config import OrchestratorConfig
        from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
        from wax_tpu.storage.store import StoreOptions

        o = MemoryOrchestrator(
            path,
            HashEmbedder(D),
            OrchestratorConfig(store=StoreOptions(wal_size=256 * 1024), **cfg_kw),
        )
        for i in range(40):
            o.remember(f"document {i} about topic {i % 7} and color {i % 5}")
        o.flush()
        return o

    def test_search_parity_flat_vs_two_level(self, tmp_path):
        queries = ["document about topic 3", "color 2 document", "topic 6 color 4"]
        configs = {
            "unsharded": {},
            "flat": {"sharded_lanes": True},
            "2slices": {"sharded_lanes": True, "mesh_slices": 2},
            "2x2xtp2": {"sharded_lanes": True, "mesh_slices": 2, "mesh_tp": 2},
        }
        results = {}
        orchs = {}
        try:
            for name, kw in configs.items():
                orchs[name] = self._build(tmp_path / f"{name}.wxs", **kw)
                results[name] = [
                    [(h.frame_id, round(h.score, 5)) for h in orchs[name].search(q).hits]
                    for q in queries
                ]
            base = results["unsharded"]
            for name, got in results.items():
                assert got == base, f"{name} diverged from unsharded"
            # the two-level configs actually carry the slice axis
            assert "slice" in orchs["2slices"].engine.mesh.axis_names
            assert orchs["2x2xtp2"].engine.mesh.axis_names == ("slice", "data", "tp")
            assert orchs["2slices"].engine.vector.mesh == orchs["2slices"].engine.mesh
        finally:
            for o in orchs.values():
                o.close()

    def test_reclaim_rejects_mesh_topology_change(self, tmp_path):
        """Closing under one topology and reopening under another must NOT serve
        the old engine layout from the in-process cache."""
        p = tmp_path / "m.wxs"
        o1 = self._build(p, sharded_lanes=True)
        flat_mesh = o1.engine.vector.mesh
        o1.close()
        o2 = self._build(p, sharded_lanes=True, mesh_slices=2)
        try:
            assert o2.engine.vector.mesh != flat_mesh
            assert "slice" in o2.engine.vector.mesh.axis_names
            assert o2.search("document about topic 3").hits
        finally:
            o2.close()

    def test_topology_without_sharded_lanes_rejected(self):
        from wax_tpu.orchestrator.config import OrchestratorConfig

        with pytest.raises(ValueError, match="sharded_lanes"):
            OrchestratorConfig(mesh_slices=2)
        with pytest.raises(ValueError, match="sharded_lanes"):
            OrchestratorConfig(mesh_tp=2)
