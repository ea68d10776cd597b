"""Forward-index exact rescore (ops/bm25_rescore.py).

The postings budget truncates candidate GENERATION only; the rescore pass must
restore exact unbudgeted BM25 scores for every returned doc, on the single-chip
candidate paths and through the sharded lex lane. (reference: SQLite FTS5 scores
all postings exactly — Sources/WaxTextSearch/FTS5SearchEngine.swift:966.)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.lex import FWD_WIDTH_CAP, LexIndexBuilder
from wax_tpu.ops.bm25 import bm25_topk, pad_term_ids
from wax_tpu.ops.bm25_rescore import exact_rescore, rescore_topk
from wax_tpu.ops.topk import NEG_INF
from wax_tpu.parallel.mesh import data_mesh
from wax_tpu.parallel.sharded_hybrid import shard_lex_index, sharded_bm25_topk


def _zipf_corpus(n_docs=300, vocab=50, seed=3, budget=None):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    b = LexIndexBuilder(postings_budget=budget)
    zipf = (1.0 / np.arange(1, vocab + 1)) ** 0.9
    zipf /= zipf.sum()
    for i in range(n_docs):
        doc = rng.choice(words, size=int(rng.integers(4, 18)), p=zipf)
        b.add(i + 1, " ".join(doc))
    return b


class TestExactRescore:
    def test_matches_numpy_oracle(self):
        """exact_rescore on the forward index == per-doc numpy BM25 sums."""
        b = _zipf_corpus(budget=4)
        idx = b.snapshot()
        assert idx.fwd_tids is not None
        ft = np.asarray(idx.fwd_tids)
        fw = np.asarray(idx.fwd_wnorm)
        idf = np.asarray(idx.idf)
        tids = np.asarray([[0, 1, 5, -1], [2, 2, -1, -1]], np.int32)  # dup slot case
        cand = np.asarray([[0, 3, 7, 299, -1], [1, 4, 250, -1, -1]], np.int32)
        sc, ct = exact_rescore(
            jnp.asarray(tids), jnp.asarray(cand), idx.fwd_tids, idx.fwd_wnorm, idx.idf
        )
        sc, ct = np.asarray(sc), np.asarray(ct)
        for qi in range(2):
            for fi, row in enumerate(cand[qi]):
                if row < 0:
                    assert sc[qi, fi] == 0.0 and ct[qi, fi] == 0
                    continue
                want, cnt = 0.0, 0
                for tid in tids[qi]:
                    if tid < 0:
                        continue
                    m = (ft[row] == tid) & (fw[row] > 0)
                    if m.any():
                        # duplicate query slots each contribute (scatter-path parity)
                        want += float(fw[row][m].sum()) * float(idf[tid])
                        cnt += 1
                np.testing.assert_allclose(sc[qi, fi], want, rtol=1e-5, atol=1e-7)
                assert ct[qi, fi] == cnt

    def test_topk_lowest_row_ties(self):
        """Equal-scored candidates resolve to the lowest doc row, regardless of
        the candidate order fed in."""
        ft = jnp.asarray(np.tile(np.array([[0, -1]], np.int32), (8, 1)))
        fw = jnp.asarray(np.tile(np.array([[0.5, 0.0]], np.float32), (8, 1)))
        idf = jnp.ones((4,), jnp.float32)
        tids = jnp.asarray([[0]], jnp.int32)
        cand = jnp.asarray([[6, 2, 4, -1]], jnp.int32)
        vals, rows = rescore_topk(tids, cand, ft, fw, idf, 2, "any")
        assert np.asarray(rows)[0].tolist() == [2, 4]
        np.testing.assert_allclose(np.asarray(vals)[0], [0.5, 0.5])

    def test_and_mode_counts(self):
        ft = jnp.asarray([[0, 1, -1], [0, -1, -1], [1, 2, -1]], jnp.int32)
        fw = jnp.asarray([[0.4, 0.6, 0.0], [0.9, 0.0, 0.0], [0.2, 0.3, 0.0]], jnp.float32)
        idf = jnp.ones((4,), jnp.float32)
        tids = jnp.asarray([[0, 1]], jnp.int32)
        cand = jnp.asarray([[0, 1, 2]], jnp.int32)
        vals, rows = rescore_topk(tids, cand, ft, fw, idf, 3, "all")
        rows = np.asarray(rows)[0]
        assert rows[0] == 0 and (rows[1:] == -1).all()  # only doc 0 matches both
        assert np.asarray(vals)[0][0] == pytest.approx(1.0)


class TestForwardIndexBuild:
    def test_absent_without_truncation(self):
        b = _zipf_corpus(budget=None)
        assert b.snapshot().fwd_tids is None
        b2 = _zipf_corpus(budget=10**6)  # budget never binds
        assert b2.snapshot().fwd_tids is None

    def test_forward_rows_complete_and_exact(self):
        """Each live doc's forward row holds its full unique-term list with the
        exact scatter-path weights (no budget applied to a doc's own terms)."""
        bb = _zipf_corpus(budget=4)
        bu = _zipf_corpus(budget=None)
        idx = bb.snapshot()
        oracle = bu.snapshot()
        ft, fw = np.asarray(idx.fwd_tids), np.asarray(idx.fwd_wnorm)
        # reconstruct per-doc weights from the UNBUDGETED postings CSR
        dr = np.asarray(oracle.doc_rows)
        wn = np.asarray(oracle.wnorm)
        off = np.asarray(oracle.offsets)
        n_terms = off.shape[0] - 1
        per_doc: dict[int, dict[int, float]] = {}
        for t in range(n_terms):
            for p in range(off[t], off[t + 1]):
                row = int(dr[p])
                if row >= 0 and wn[p] > 0:
                    per_doc.setdefault(row, {})[t] = float(wn[p])
        for row, want in per_doc.items():
            got = {
                int(t): float(w)
                for t, w in zip(ft[row], fw[row])
                if t >= 0 and w > 0
            }
            assert set(got) == set(want), row
            for t in want:
                np.testing.assert_allclose(got[t], want[t], rtol=1e-5)

    def test_tombstoned_rows_zeroed(self):
        b = _zipf_corpus(budget=4)
        b.remove(1)
        b.remove(2)
        idx = b.snapshot()
        ft = np.asarray(idx.fwd_tids)
        assert (ft[0] == -1).all() and (ft[1] == -1).all()

    def test_width_cap_keeps_impact_head(self):
        """A doc wider than FWD_WIDTH_CAP keeps its highest-impact terms."""
        b = LexIndexBuilder(postings_budget=1)
        wide = " ".join(f"t{i}" for i in range(FWD_WIDTH_CAP + 40))
        b.add(1, wide)
        b.add(2, "t0 t1")  # forces truncation of t0/t1 postings (budget 1)
        idx = b.snapshot()
        assert idx.fwd_tids is not None
        ft = np.asarray(idx.fwd_tids)[0]
        assert int((ft >= 0).sum()) == FWD_WIDTH_CAP


class TestShardedRescore:
    @pytest.mark.parametrize("n_dev", [2, 8])
    @pytest.mark.parametrize("mode", ["any", "all"])
    def test_sharded_matches_single_chip(self, n_dev, mode):
        """Sharded budgeted BM25 (with per-shard rescore) == the single-chip
        candidate path on the same budgeted snapshot."""
        from wax_tpu.ops.bm25_candidates import bm25_candidates_topk

        b = _zipf_corpus(budget=8)
        snap = b.snapshot()
        assert snap.fwd_tids is not None
        mesh = data_mesh(n_dev)
        sharded = shard_lex_index(b, mesh, n_rows_global=int(snap.doc_len.shape[0]))
        assert sharded.fwd_tids is not None
        tids = jnp.asarray(pad_term_ids(b.term_ids(["w0", "w2", "w7"]), dfs=b.df)[None, :])
        v_ref, _, f_ref = bm25_candidates_topk(tids, snap, 10, mode=mode)
        v_sh, f_sh = sharded_bm25_topk(tids, sharded, 10, mesh, mode=mode)
        np.testing.assert_allclose(
            np.asarray(v_sh)[0], np.asarray(v_ref)[0], rtol=1e-5, atol=1e-6
        )
        ok = np.asarray(v_ref)[0] > NEG_INF * 0.5
        assert np.asarray(f_sh)[0][ok].tolist() == np.asarray(f_ref)[0][ok].tolist()


class TestAutoBudget:
    def test_resolution_rule(self):
        b = LexIndexBuilder(postings_budget="auto")
        assert b.resolve_postings_budget(100_000) is None
        assert b.resolve_postings_budget(262_144) == 4096
        assert b.resolve_postings_budget(2_097_152) == 8192

    def test_small_corpus_stays_exact(self):
        b = LexIndexBuilder(postings_budget="auto")
        for fid in range(50):
            b.add(fid, "common token here")
        snap = b.snapshot()
        assert snap.fwd_tids is None  # below the auto threshold: no truncation
        assert int(snap.max_df) >= 50

    def test_compact_preserves_auto(self):
        b = LexIndexBuilder(postings_budget="auto")
        for fid in range(20):
            b.add(fid, f"shared word unique{fid}")
        b.remove(3)
        b.compact()
        assert b.postings_budget == "auto"
