"""BM25 lane: builder semantics + device scoring vs a numpy oracle.

Oracle mirrors classic BM25 (k1=1.2, b=0.75, BM25+ idf) computed directly from the
analyzed corpus — the analogue of the reference's FTS5 ranking tests.
"""
import math

import jax.numpy as jnp

import numpy as np
import pytest

from wax_tpu.index.lex import LexIndexBuilder, analyze, score_from_rank
from wax_tpu.ops.bm25 import bm25_scores, bm25_topk, pad_term_ids

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog"),
    (2, "A fast auburn fox leaped across a sleepy canine"),
    (3, "Quantum computing uses qubits for parallel computation"),
    (4, "The dog sat quietly while the fox ran away"),
    (5, "Stock markets rallied as tech shares surged"),
    (6, "the the the the the repeated stopword document"),
]


def _oracle_scores(docs, query_terms):
    corpus = {fid: analyze(text) for fid, text in docs}
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    scores = {}
    for fid, toks in corpus.items():
        s = 0.0
        for term in dict.fromkeys(query_terms):
            df = sum(1 for t in corpus.values() if term in t)
            if df == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5))
            if idf <= 0.0:
                idf = 1e-6  # FTS5 clamp (fts5_aux.c)
            tf = toks.count(term)
            denom = tf + 1.2 * (1 - 0.75 + 0.75 * len(toks) / avgdl)
            s += idf * (tf * 2.2) / denom
        scores[fid] = s
    return scores


@pytest.fixture()
def built():
    b = LexIndexBuilder()
    b.add_batch(DOCS)
    return b


class TestAnalyze:
    def test_unicode61_style(self):
        assert analyze("Héllo, WORLD_foo bar-baz 42!") == ["hello", "world", "foo", "bar", "baz", "42"]

    def test_empty(self):
        assert analyze("...") == []


class TestScoring:
    def test_matches_oracle(self, built):
        idx = built.snapshot()
        terms = analyze("quick fox")
        tids = pad_term_ids(built.term_ids(terms))
        scores = np.asarray(bm25_scores(tids[None, :], idx))[0]
        oracle = _oracle_scores(DOCS, terms)
        for fid, text in DOCS:
            row = built._row_of[fid]
            assert scores[row] == pytest.approx(oracle[fid], rel=1e-5), (fid, text)

    def test_and_mode(self, built):
        idx = built.snapshot()
        tids = pad_term_ids(built.query_term_ids("quick fox"))
        scores = np.asarray(bm25_scores(tids[None, :], idx, mode="all"))[0]
        # only doc 1 contains both "quick" and "fox"
        nz = {built._frame_ids[i] for i in np.nonzero(scores)[0]}
        assert nz == {1}

    def test_or_mode_topk(self, built):
        idx = built.snapshot()
        tids = pad_term_ids(built.query_term_ids("quick fox"))
        vals, rows, fids = bm25_topk(tids[None, :], idx, 5)
        fids = [f for f in np.asarray(fids)[0].tolist() if f >= 0]
        assert set(fids) == {1, 2, 4}  # docs containing quick or fox
        assert fids[0] == 1  # both terms -> highest score
        v = np.asarray(vals)[0]
        assert all(v[i] >= v[i + 1] for i in range(len(fids) - 1))

    def test_remove_masks(self, built):
        built.remove(1)
        idx = built.snapshot()
        tids = pad_term_ids(built.query_term_ids("quick fox"))
        _, _, fids = bm25_topk(tids[None, :], idx, 5)
        assert 1 not in set(np.asarray(fids)[0].tolist())

    def test_upsert_reindexes(self, built):
        built.add(3, "fox fox fox everywhere")
        idx = built.snapshot()
        tids = pad_term_ids(built.query_term_ids("fox"))
        _, _, fids = bm25_topk(tids[None, :], idx, 1)
        assert int(np.asarray(fids)[0, 0]) == 3

    def test_unknown_terms_only(self, built):
        idx = built.snapshot()
        tids = pad_term_ids(built.query_term_ids("zzz unknownterm"))
        _, _, fids = bm25_topk(tids[None, :], idx, 3)
        assert np.all(np.asarray(fids) == -1)

    def test_batch_queries(self, built):
        idx = built.snapshot()
        t1 = pad_term_ids(built.query_term_ids("fox"))
        t2 = pad_term_ids(built.query_term_ids("quantum qubits"))
        batch = np.stack([t1, t2])
        _, _, fids = bm25_topk(batch, idx, 3)
        f = np.asarray(fids)
        assert 1 in f[0] and 3 in f[1]

    def test_compact_drops_tombstones(self, built):
        built.remove(2)
        built.remove(5)
        built.compact()
        assert len(built) == 4
        idx = built.snapshot()
        tids = pad_term_ids(built.query_term_ids("fox"))
        _, _, fids = bm25_topk(tids[None, :], idx, 5)
        got = {f for f in np.asarray(fids)[0].tolist() if f >= 0}
        assert got == {1, 4}

    def test_score_from_rank_mapping(self):
        # reference scoreFromBM25Rank (FTS5SearchEngine.swift:966-970): -rank,
        # non-finite -> 0
        assert score_from_rank(-2.0) == pytest.approx(2.0)
        assert score_from_rank(0.0) == 0.0
        assert score_from_rank(float("nan")) == 0.0
        assert score_from_rank(float("inf")) == 0.0


class TestLongQueries:
    """>16 distinct terms: exact bucketed scoring up to 128 terms, idf-head selection
    beyond (regression: queries were silently clipped at 16 and AND-mode semantics
    diverged from FTS5)."""

    def _long_corpus(self):
        b = LexIndexBuilder()
        words = [f"tok{i}" for i in range(40)]
        docs = [
            (0, " ".join(words[:24])),        # matches all 24 query terms
            (1, " ".join(words[:16])),        # matches only the first 16
            (2, " ".join(words[8:32])),
            (3, "unrelated content entirely about other things"),
        ]
        b.add_batch(docs)
        return b, words

    def test_and_mode_requires_all_terms_beyond_16(self):
        b, words = self._long_corpus()
        idx = b.snapshot()
        q = " ".join(words[:24])  # 24 distinct terms
        tids = pad_term_ids(b.query_term_ids(q))
        assert tids.shape[0] == 32  # bucketed to the next multiple of 16, not clipped
        vals, _, fids = bm25_topk(jnp.asarray(tids[None, :]), idx, 4, mode="all")
        matched = [int(f) for f, v in zip(np.asarray(fids)[0], np.asarray(vals)[0]) if f >= 0]
        # doc 1 (16/24 terms) passed AND-mode under the old silent 16-term clip
        assert matched == [0]

    def test_scores_exact_beyond_16_terms(self):
        b, words = self._long_corpus()
        idx = b.snapshot()
        terms = [w for w in words[:24]]
        tids = pad_term_ids(b.term_ids(terms))
        scores = np.asarray(bm25_scores(jnp.asarray(tids[None, :]), idx))[0]
        docs = [(0, " ".join(words[:24])), (1, " ".join(words[:16])),
                (2, " ".join(words[8:32])), (3, "unrelated content entirely about other things")]
        oracle = _oracle_scores(docs, terms)
        for fid, _ in docs:
            row = b._row_of[fid]
            assert scores[row] == pytest.approx(oracle[fid], rel=1e-5)

    def test_idf_head_selection_past_hard_cap(self):
        from wax_tpu.ops.bm25 import MAX_QUERY_TERMS_HARD

        b = LexIndexBuilder()
        # "common" appears in many docs (high df); rare terms in one each
        docs = [(i, f"common rare{i}") for i in range(150)]
        b.add_batch(docs)
        raw = b.query_term_ids("common " + " ".join(f"rare{i}" for i in range(140)))
        assert len(raw) == 141
        padded = pad_term_ids(raw, dfs=b.df)
        kept = [t for t in padded.tolist() if t >= 0]
        assert len(kept) == MAX_QUERY_TERMS_HARD
        # the high-df 'common' is dropped first; kept terms are the rarest head
        assert b.query_term_ids("common")[0] not in kept

    def test_pad_deterministic(self):
        b, words = self._long_corpus()
        q = " ".join(words[:24])
        a = pad_term_ids(b.query_term_ids(q), dfs=b.df)
        c = pad_term_ids(b.query_term_ids(q), dfs=b.df)
        np.testing.assert_array_equal(a, c)


class TestPostingsBudget:
    """Impact-ordered per-term postings cap (index/lex.py postings_budget)."""

    def _docs(self):
        # "common" appears in every doc; shorter docs score higher (BM25 length norm)
        docs = []
        for i in range(300):
            filler = " filler" * (i % 30)
            docs.append((i, f"common token document {i}{filler}"))
        return docs

    def test_no_budget_is_exact_baseline(self):
        from wax_tpu.index.lex import LexIndexBuilder

        b1 = LexIndexBuilder()
        b2 = LexIndexBuilder(postings_budget=10_000)  # larger than any df
        for fid, text in self._docs():
            b1.add(fid, text)
            b2.add(fid, text)
        s1, s2 = b1.snapshot(), b2.snapshot()
        assert s1.max_df == s2.max_df
        tids = jnp.asarray(pad_term_ids(b1.query_term_ids("common token"))[None, :])
        v1, _, f1 = bm25_topk(tids, s1, 10)
        v2, _, f2 = bm25_topk(tids, s2, 10)
        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2))

    def test_budget_caps_w_and_keeps_top_ranked(self):
        from wax_tpu.index.lex import LexIndexBuilder

        full = LexIndexBuilder()
        capped = LexIndexBuilder(postings_budget=64)
        for fid, text in self._docs():
            full.add(fid, text)
            capped.add(fid, text)
        sf, sc = full.snapshot(), capped.snapshot()
        assert sf.max_df >= 300 and sc.max_df == 128  # 64 rounded up to lane width
        tids = jnp.asarray(pad_term_ids(full.query_term_ids("common"))[None, :])
        vf, _, ff = bm25_topk(tids, sf, 10)
        vc, _, fc = bm25_topk(tids, sc, 10)
        # single-term query: impact ordering keeps the highest-contribution postings,
        # so the top-10 is EXACTLY the exhaustive top-10
        np.testing.assert_array_equal(np.asarray(ff), np.asarray(fc))
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vc), rtol=1e-6)

    def test_budget_drops_tombstones_first(self):
        from wax_tpu.index.lex import LexIndexBuilder

        b = LexIndexBuilder(postings_budget=4)
        for fid in range(8):
            b.add(fid, f"shared term plus unique{fid}")
        for fid in range(6):
            b.remove(fid)  # only rows 6, 7 stay live
        snap = b.snapshot()
        tids = jnp.asarray(pad_term_ids(b.query_term_ids("shared term"))[None, :])
        _, _, fids = bm25_topk(tids, snap, 4)
        got = {int(f) for f in np.asarray(fids)[0] if f >= 0}
        assert got == {6, 7}


class TestFrozenLexBuilder:
    """v2 npz lex segment: frozen-CSR load path parity with the dict builder."""

    def _built(self):
        b = LexIndexBuilder()
        docs = [
            (0, "alpha beta gamma alpha"),
            (1, "beta delta epsilon"),
            (2, "gamma gamma zeta alpha"),
            (3, "unique pancake syrup"),
        ]
        b.add_batch(docs)
        return b, docs

    def _roundtrip(self, b):
        from wax_tpu.orchestrator.serialization import deserialize_lex, serialize_lex

        blob, attrs = serialize_lex(b)
        assert attrs["format"] == "wxs-lex-cols-v2"
        return deserialize_lex(blob, attrs)

    def _snap_equal(self, a, b):
        import numpy as np

        for f in ("doc_rows", "tfs", "offsets", "idf", "doc_len", "frame_ids", "active"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
            )
        assert int(a.count) == int(b.count)
        assert a.max_df == b.max_df
        np.testing.assert_allclose(float(a.avgdl), float(b.avgdl), rtol=1e-6)

    def test_frozen_snapshot_matches_thawed(self):
        b, _ = self._built()
        b2 = self._roundtrip(b)
        assert b2._frozen is not None
        self._snap_equal(b.snapshot(), b2.snapshot())
        assert len(b2) == len(b) and 2 in b2 and 99 not in b2

    def test_remove_on_frozen_stays_frozen_and_matches(self):
        b, _ = self._built()
        b2 = self._roundtrip(b)
        b.remove(1)
        b2.remove(1)
        assert b2._frozen is not None  # tombstoning must not thaw
        self._snap_equal(b.snapshot(), b2.snapshot())

    def test_add_thaws_and_matches(self):
        b, _ = self._built()
        b2 = self._roundtrip(b)
        b.add(9, "fresh alpha content")
        b2.add(9, "fresh alpha content")
        assert b2._frozen is None
        self._snap_equal(b.snapshot(), b2.snapshot())
        assert b2.query_term_ids("fresh alpha") == b.query_term_ids("fresh alpha")

    def test_serialize_after_thaw_round_trips(self):
        b, _ = self._built()
        b2 = self._roundtrip(b)
        b2.add(9, "more words here")
        b3 = self._roundtrip(b2)
        self._snap_equal(b2.snapshot(), b3.snapshot())

    def test_v1_json_segment_still_readable(self):
        import json

        from wax_tpu.orchestrator.serialization import deserialize_lex

        b, _ = self._built()
        state = b.state()
        payload = {
            "vocab": state["vocab"],
            "doc_terms": state["doc_terms"],
            "doc_len": state["doc_len"],
            "frame_ids": state["frame_ids"],
            "active": state["active"],
        }
        blob = json.dumps(payload, separators=(",", ":")).encode()
        b2 = deserialize_lex(blob, {"format": "wxs-lex-json-v1"})
        self._snap_equal(b.snapshot(), b2.snapshot())

    def test_df_and_empty_builder(self):
        b = LexIndexBuilder()
        b2 = self._roundtrip(b)
        assert len(b2) == 0
        b3, _ = self._built()
        f = self._roundtrip(b3)
        tid = f.query_term_ids("alpha")[0]
        assert f.df(tid) == b3.df(tid) == 2
