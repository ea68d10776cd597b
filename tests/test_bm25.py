"""BM25 lane: builder semantics + device scoring vs a numpy oracle.

Oracle mirrors classic BM25 (k1=1.2, b=0.75, BM25+ idf) computed directly from the
analyzed corpus — the analogue of the reference's FTS5 ranking tests.
"""
import math

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
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
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
        assert score_from_rank(-2.0) == pytest.approx(1.0 / 3.0)
        assert score_from_rank(0.0) == 1.0
