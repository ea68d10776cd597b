"""Candidate-set BM25 (ops/bm25_candidates.py) vs the scatter path: exact parity.

The candidate pipeline must return the same top-k sets, frame ids and scores as
ops/bm25.py bm25_topk for every mode/budget/shape — it replaces a [B, N] scatter
plane, not the semantics. Scores may differ only in f32 summation order (≤ few ulp).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.lex import LexIndexBuilder
from wax_tpu.ops.bm25 import bm25_topk, pad_term_ids
from wax_tpu.ops.bm25_candidates import bm25_candidates_topk
from wax_tpu.ops.bm25_candidates_pallas import bm25_candidates_topk_pallas

IMPLS = {"xla": bm25_candidates_topk, "pallas": bm25_candidates_topk_pallas}


def _corpus(n_docs=400, vocab=60, seed=0, budget=None):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(vocab)]
    b = LexIndexBuilder(postings_budget=budget)
    zipf = (1.0 / np.arange(1, vocab + 1)) ** 0.9
    zipf /= zipf.sum()
    for i in range(n_docs):
        k = rng.integers(3, 20)
        doc = rng.choice(words, size=k, p=zipf)
        b.add(i + 1, " ".join(doc))
    return b


def _assert_parity(builder, tids, k, mode, impl="xla"):
    idx = builder.snapshot()
    padded = jnp.asarray(pad_term_ids(tids, dfs=builder.df)[None, :])
    sv, sr, sf = bm25_topk(padded, idx, k, mode=mode)
    cv, cr, cf = IMPLS[impl](padded, idx, k, mode=mode)
    sv, sf = np.asarray(sv)[0], np.asarray(sf)[0]
    cv, cf = np.asarray(cv)[0], np.asarray(cf)[0]
    live_s = sf >= 0
    live_c = cf >= 0
    assert live_s.sum() == live_c.sum(), (mode, sf, cf)
    # same ids up to equal-score ties: group by rounded score
    assert set(sf[live_s]) == set(cf[live_c]) or np.allclose(
        np.sort(sv[live_s]), np.sort(cv[live_c]), rtol=1e-5
    ), (mode, list(zip(sf, sv)), list(zip(cf, cv)))
    np.testing.assert_allclose(cv[live_c], sv[live_s], rtol=1e-5, atol=1e-6)
    # strict id order where scores are not tied with a neighbor
    for i in range(int(live_s.sum())):
        tied = (i > 0 and abs(sv[i] - sv[i - 1]) < 1e-6) or (
            i + 1 < live_s.sum() and abs(sv[i] - sv[i + 1]) < 1e-6
        )
        if not tied:
            assert sf[i] == cf[i], (mode, i, sf, cf)


def _oracle_scores(builder_unbudgeted, tids, mode):
    """fid -> exact unbudgeted BM25 score (and the exact top-k oracle order)."""
    idx = builder_unbudgeted.snapshot()
    n = int(idx.frame_ids.shape[0])
    padded = jnp.asarray(pad_term_ids(tids, dfs=builder_unbudgeted.df)[None, :])
    sv, _, sf = bm25_topk(padded, idx, n, mode=mode)
    sv, sf = np.asarray(sv)[0], np.asarray(sf)[0]
    live = sf >= 0
    return dict(zip(sf[live].tolist(), sv[live].tolist())), sf[live].tolist()


def _assert_rescore(budget, terms, k, mode, impl):
    """Retrieve-then-rescore contract on a budget-truncated snapshot:

    1. every returned score is the EXACT unbudgeted BM25 score of that doc
       (the forward index restores what the postings budget truncated);
    2. recall vs the unbudgeted oracle top-k is >= the budgeted scatter path's;
    3. AND mode never returns a doc that does not match every query term.
    """
    bb = _corpus(budget=budget)
    bu = _corpus(budget=None)  # same seed -> identical docs, untruncated
    tids = bb.term_ids(terms)
    idx = bb.snapshot()
    assert idx.fwd_tids is not None, "budgeted corpus must carry a forward index"
    exact, oracle_order = _oracle_scores(bu, tids, mode)
    padded = jnp.asarray(pad_term_ids(tids, dfs=bb.df)[None, :])
    cv, _, cf = IMPLS[impl](padded, idx, k, mode=mode)
    cv, cf = np.asarray(cv)[0], np.asarray(cf)[0]
    live = cf >= 0
    for fid, score in zip(cf[live].tolist(), cv[live].tolist()):
        assert fid in exact, (mode, fid, "returned a doc the oracle rejects")
        np.testing.assert_allclose(score, exact[fid], rtol=1e-5, atol=1e-6)
    oracle_topk = set(oracle_order[:k])
    if oracle_topk:
        sv, _, sf = bm25_topk(padded, idx, k, mode=mode)
        sf = np.asarray(sf)[0]
        scatter_rec = len(set(sf[sf >= 0].tolist()) & oracle_topk)
        cand_rec = len(set(cf[live].tolist()) & oracle_topk)
        assert cand_rec >= scatter_rec, (mode, budget, cand_rec, scatter_rec)


class TestCandidateParity:
    @pytest.mark.parametrize("impl", ["xla", "pallas"])
    @pytest.mark.parametrize("mode", ["any", "all"])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_queries(self, mode, seed, impl):
        b = _corpus(seed=seed)
        rng = np.random.default_rng(100 + seed)
        for _ in range(10):
            n_q = rng.integers(1, 9)
            terms = [f"w{i}" for i in rng.choice(60, size=n_q, replace=False)]
            tids = b.term_ids(terms)
            if not tids:
                continue
            _assert_parity(b, tids, 10, mode, impl)

    def test_single_term(self):
        b = _corpus()
        _assert_parity(b, b.term_ids(["w0"]), 20, "any")

    def test_no_match(self):
        b = _corpus()
        idx = b.snapshot()
        padded = jnp.asarray(pad_term_ids([10**6])[None, :])  # out-of-vocab id
        cv, cr, cf = bm25_candidates_topk(jnp.minimum(padded, idx.n_terms - 1), idx, 5, mode="all")
        # a single common term in all mode: parity check instead
        _assert_parity(b, b.term_ids(["w59"]), 5, "all")

    @pytest.mark.parametrize("budget", [8, 32])
    def test_budget_rescore(self, budget):
        """Budget-truncated snapshots carry a forward index: the candidate path
        rescores exactly, so it must match or beat the budgeted scatter path
        against the UNBUDGETED oracle (it no longer mirrors the scatter path's
        truncation-underestimated scores)."""
        for terms in (["w0", "w1"], ["w2", "w5", "w9"]):
            for mode in ("any", "all"):
                _assert_rescore(budget, terms, 10, mode, "xla")

    def test_tombstones_excluded(self):
        b = _corpus()
        for fid in range(1, 120):
            b.remove(fid)
        _assert_parity(b, b.term_ids(["w0", "w3"]), 15, "any")
        idx = b.snapshot()
        padded = jnp.asarray(pad_term_ids(b.term_ids(["w0"]), dfs=b.df)[None, :])
        _, _, cf = bm25_candidates_topk(padded, idx, 50, mode="any")
        cf = np.asarray(cf)[0]
        assert all(f >= 120 or f < 0 for f in cf), cf

    def test_batch_queries(self):
        b = _corpus()
        idx = b.snapshot()
        q = np.stack(
            [
                pad_term_ids(b.term_ids(["w0", "w1"]), max_terms=16),
                pad_term_ids(b.term_ids(["w5"]), max_terms=16),
                pad_term_ids(b.term_ids(["w2", "w8", "w20"]), max_terms=16),
            ]
        )
        sv, _, sf = bm25_topk(jnp.asarray(q), idx, 8, mode="any")
        cv, _, cf = bm25_candidates_topk(jnp.asarray(q), idx, 8, mode="any")
        np.testing.assert_allclose(np.asarray(cv), np.asarray(sv), rtol=1e-5, atol=1e-6)

    def test_more_terms_than_16(self):
        b = _corpus(vocab=80)
        terms = [f"w{i}" for i in range(24)]
        tids = b.term_ids(terms)
        _assert_parity(b, tids, 10, "any")


class TestPallasVariants:
    @pytest.mark.parametrize("budget", [8, 32])
    def test_budget_rescore(self, budget):
        for terms in (["w0", "w1"], ["w2", "w5", "w9"]):
            for mode in ("any", "all"):
                _assert_rescore(budget, terms, 10, mode, "pallas")

    def test_tombstones_excluded(self):
        b = _corpus()
        for fid in range(1, 120):
            b.remove(fid)
        _assert_parity(b, b.term_ids(["w0", "w3"]), 15, "any", "pallas")

    def test_batch_and_long_queries(self):
        b = _corpus(vocab=80)
        terms = [f"w{i}" for i in range(24)]
        _assert_parity(b, b.term_ids(terms), 10, "any", "pallas")
        idx = b.snapshot()
        q = np.stack(
            [
                pad_term_ids(b.term_ids(["w0", "w1"]), max_terms=16),
                pad_term_ids(b.term_ids(["w5"]), max_terms=16),
                pad_term_ids(b.term_ids(["w2", "w8", "w20"]), max_terms=16),
            ]
        )
        from wax_tpu.ops.bm25_candidates_pallas import bm25_candidates_topk_pallas

        sv, _, sf = bm25_topk(jnp.asarray(q), idx, 8, mode="any")
        cv, _, cf = bm25_candidates_topk_pallas(jnp.asarray(q), idx, 8, mode="any")
        np.testing.assert_allclose(np.asarray(cv), np.asarray(sv), rtol=1e-5, atol=1e-6)


class TestWideTopk:
    """Two-stage wide-plane top-k (ops/bm25_candidates.wide_topk)."""

    def test_matches_plain_topk_on_distinct_values(self):
        import jax

        from wax_tpu.ops.bm25_candidates import wide_topk

        rng = np.random.default_rng(4)
        for b, w, k in ((7, 4096, 10), (3, 12800, 64), (2, 2048, 300)):
            # distinct values -> tie order cannot differ between the two paths
            x = rng.permutation(w * b).reshape(b, w).astype(np.float32)
            fv, fp = wide_topk(jnp.asarray(x), k)
            pv, pp = jax.lax.top_k(jnp.asarray(x), k)
            np.testing.assert_array_equal(np.asarray(fv), np.asarray(pv))
            np.testing.assert_array_equal(np.asarray(fp), np.asarray(pp))

    def test_narrow_plane_falls_back(self):
        import jax

        from wax_tpu.ops.bm25_candidates import wide_topk

        x = jnp.asarray(np.random.default_rng(5).standard_normal((4, 256)).astype(np.float32))
        fv, fp = wide_topk(x, 10)
        pv, pp = jax.lax.top_k(x, 10)
        np.testing.assert_array_equal(np.asarray(fv), np.asarray(pv))
        np.testing.assert_array_equal(np.asarray(fp), np.asarray(pp))

    def test_hot_lane_survives_slack(self):
        """All of the true top-k planted in ONE lane slot (worst collision case):
        the +2 lookahead slack must still return every planted element when
        k <= (ceil(k/128)+2)... i.e. for k <= 2*128 the planted-lane coverage is
        bounded; verify at k=10 where L=3 tolerates a fully hot lane."""
        from wax_tpu.ops.bm25_candidates import wide_topk

        w, k = 8192, 3  # 3 planted in one lane slot <= L
        x = np.zeros((1, w), np.float32)
        for i, v in zip((128 * 3 + 5, 128 * 17 + 5, 128 * 40 + 5), (9.0, 8.0, 7.0)):
            x[0, i] = v
        fv, fp = wide_topk(jnp.asarray(x), k)
        assert set(np.asarray(fp)[0].tolist()) == {128 * 3 + 5, 128 * 17 + 5, 128 * 40 + 5}


class TestDeepK:
    """k beyond the candidate plane width must pad dead slots, not crash
    (the scatter lane these paths replace accepted any k <= N)."""

    def test_wide_topk_k_exceeds_plane(self):
        import jax

        from wax_tpu.ops.bm25_candidates import wide_topk
        from wax_tpu.ops.topk import NEG_INF

        x = jnp.asarray(np.random.default_rng(9).standard_normal((2, 256)).astype(np.float32))
        v, p = wide_topk(x, 400)
        assert v.shape == (2, 400) and p.shape == (2, 400)
        assert (np.asarray(v)[:, 256:] < NEG_INF * 0.5).all()  # dead-slot convention
        pv, _ = jax.lax.top_k(x, 256)
        np.testing.assert_array_equal(np.asarray(v)[:, :256], np.asarray(pv))

    @pytest.mark.parametrize("budget", [None, 16])
    def test_candidates_topk_deep_k_matches_scatter_liveness(self, budget):
        from wax_tpu.index.lex import LexIndexBuilder
        from wax_tpu.ops.bm25 import bm25_topk, pad_term_ids
        from wax_tpu.ops.bm25_candidates import bm25_candidates_topk

        rng = np.random.default_rng(3)
        b = LexIndexBuilder(postings_budget=budget)
        vocab = [f"w{i}" for i in range(40)]
        for i in range(600):
            b.add(i, " ".join(rng.choice(vocab, size=8)))
        idx = b.snapshot()
        padded = jnp.asarray(pad_term_ids(b.term_ids(["w3", "w7"]), dfs=b.df)[None, :])
        for k in (400, 600):
            v, r, f = bm25_candidates_topk(padded, idx, k, mode="any")
            assert v.shape[-1] == k and f.shape[-1] == k
            live = np.asarray(f)[0] >= 0
            sv, _, sf = bm25_topk(padded, idx, k, mode="any")
            if budget is None:
                assert live.sum() == (np.asarray(sf)[0] >= 0).sum()
                np.testing.assert_allclose(
                    np.sort(np.asarray(v)[0][live]),
                    np.sort(np.asarray(sv)[0][np.asarray(sf)[0] >= 0]),
                    rtol=1e-5,
                )
            else:
                assert live.sum() > 0  # rescore path returns [B, k] without error
