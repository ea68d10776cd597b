"""Ground-truth differential tests against SQLite FTS5 — the engine the reference
actually ships (reference: Sources/WaxTextSearch/FTS5SearchEngine.swift:143 raw
MATCH, :966 bm25 rank mapping; SURVEY §7(f) demands bm25() scoring parity).

Three layers, all driven against a real in-memory FTS5 table from this
environment's stdlib sqlite3:

  1. unicode61 analyzer token parity on a unicode-edges corpus.
  2. Device BM25 (ops/bm25.py) rank-order + score parity for 1-8-term AND/OR
     queries — FTS5's exact idf (clamped ln((N-n+0.5)/(n+0.5))) and rank = -score.
  3. The MATCH engine (search/match.py): result sets, rank order AND absolute
     scores for phrase / prefix / NEAR / boolean queries, plus syntax-error parity.
"""
from __future__ import annotations

import math
import random
import sqlite3

import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.lex import LexIndexBuilder, analyze
from wax_tpu.ops.bm25 import bm25_topk, pad_term_ids
from wax_tpu.search.match import MatchSyntaxError, match_search


def _fts5_available() -> bool:
    try:
        sqlite3.connect(":memory:").execute("create virtual table _p using fts5(c)")
        return True
    except sqlite3.OperationalError:
        return False


pytestmark = pytest.mark.skipif(not _fts5_available(), reason="sqlite3 lacks FTS5")


def make_fts(docs: list[str]) -> sqlite3.Connection:
    c = sqlite3.connect(":memory:")
    c.execute("create virtual table t using fts5(content, tokenize='unicode61')")
    for s in docs:
        c.execute("insert into t values (?)", (s,))
    return c


def make_builder(docs: list[str]) -> LexIndexBuilder:
    b = LexIndexBuilder()
    for i, s in enumerate(docs):
        b.add(i + 1, s)  # frame id == fts rowid
    return b


def fts_ranks(c: sqlite3.Connection, q: str) -> list[tuple[int, float]]:
    return c.execute(
        "select rowid, rank from t where t match ? order by rank asc, rowid asc", (q,)
    ).fetchall()


def _zipf_docs(seed: int, n: int, vocab: list[str]) -> list[str]:
    rng = random.Random(seed)
    weights = [1.0 / (i + 1) ** 0.8 for i in range(len(vocab))]
    return [
        " ".join(rng.choices(vocab, weights=weights, k=rng.randint(2, 14)))
        for _ in range(n)
    ]


VOCAB = [
    "apple", "banana", "cherry", "date", "elder", "fig", "grape", "kiwi",
    "lemon", "mango", "red", "big", "bell", "shed", "run", "walk", "jump",
    "fast", "slow", "north",
]


# ---------------------------------------------------------------------------------
# 1. analyzer parity
# ---------------------------------------------------------------------------------


class TestAnalyzerParity:
    EDGES = [
        "Hello, World!",
        "Crème brûlée at the café",
        "ÅNGSTRÖM units",
        "naïve coöperation",
        "don't stop-me_now",
        "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ",
        "tabs\tand\nnewlines",
        "mixed123numbers45text",
        "ligature ﬁle ﬂow",
        "Ελληνικά και ΚΕΦΑΛΑΙΑ",
        "русский ТЕКСТ",
        "emoji 😀 between words",
        "currency $100 €50",
        "under_score and____runs",
        "straße GROSSE ẞ",
        "İstanbul ı dotless",
        "½ fraction x² superscript",
        "ǅungla titlecase ǄUNGLA",
        "ligature ﬀ ﬃ ﬅ",
        "Ⅷ roman ①②③ circled",
        "ｶﾀｶﾅ halfwidth 한국어 日本語",
        "decomposed äb x́",
        "ΣΟΦΟΣ sigma ΚΕΦΑΛΑΙΑΣ",
        "math bold \U0001d400\U0001d41b stays",
    ]

    def test_tokens_match_unicode61(self):
        """analyze() must split+fold exactly like FTS5's unicode61 with
        remove_diacritics (the reference's tokenizer): exact token MULTISET parity
        via fts5vocab, plus position parity via a full-phrase match."""
        c = sqlite3.connect(":memory:")
        c.execute("create virtual table t using fts5(content, tokenize='unicode61')")
        c.execute("create virtual table tvocab using fts5vocab(t, 'col')")
        from collections import Counter

        for text in self.EDGES:
            c.execute("delete from t")
            c.execute("insert into t values (?)", (text,))
            want = {
                term: cnt
                for term, cnt in c.execute("select term, cnt from tvocab").fetchall()
            }
            toks = analyze(text)
            assert dict(Counter(toks)) == want, text
            if toks:
                # positions agree too: the full token sequence matches as a phrase
                phrase = '"' + " ".join(toks) + '"'
                assert c.execute(
                    "select rowid from t where t match ?", (phrase,)
                ).fetchall(), (text, phrase)

    def test_token_counts_match(self):
        """Doc length (dl) parity: FTS5's bm25 is dl-sensitive, so token COUNTS
        must agree, not just token sets. Compare via rank equality on a
        single-term query against docs differing only in analyzed length."""
        for text in self.EDGES:
            docs = [text + " zzmarker", "zzmarker"]
            c = make_fts(docs)
            b = make_builder(docs)
            got = fts_ranks(c, "zzmarker")
            mine = match_search(b, "zzmarker", 10)
            assert [r for r, _ in got] == [h.frame_id for h in mine], text
            for (r, rank), h in zip(got, mine):
                assert h.score == pytest.approx(-rank, rel=1e-9, abs=1e-12), text


# ---------------------------------------------------------------------------------
# 2. device BM25 vs FTS5 bm25()
# ---------------------------------------------------------------------------------


class TestDeviceBm25Parity:
    @pytest.fixture(scope="class")
    def corpus(self):
        docs = _zipf_docs(11, 400, VOCAB)
        return docs, make_fts(docs), make_builder(docs)

    def _device_all(self, builder, query, k, mode):
        idx = builder.snapshot()
        tids = builder.query_term_ids(query)
        if not tids:
            return []
        padded = jnp.asarray(pad_term_ids(tids, dfs=builder.df)[None, :])
        vals, _rows, fids = bm25_topk(padded, idx, k, mode=mode)
        return [
            (int(f), float(v))
            for f, v in zip(np.asarray(fids)[0], np.asarray(vals)[0])
            if f >= 0
        ]

    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("n_terms", [1, 2, 3, 5, 8])
    def test_and_or_rank_order_and_scores(self, corpus, seed, n_terms):
        docs, c, b = corpus
        rng = random.Random(seed * 100 + n_terms)
        terms = rng.sample(VOCAB, n_terms)
        for join, mode in ((" ", "all"), (" OR ", "any")):
            q = join.join(terms)
            want = fts_ranks(c, q)
            got = self._device_all(b, q, len(docs), mode)
            assert {f for f, _ in got} == {r for r, _ in want}, q
            want_scores = {r: -rank for r, rank in want}
            for f, v in got:
                assert v == pytest.approx(want_scores[f], rel=1e-5, abs=1e-7), q
            # rank-order parity modulo f32 noise: our order must be a valid
            # descending ordering of FTS5's f64 scores within f32 tolerance
            # (fixed-decimal bucketing would mis-split genuine ties)
            order = [f for f, _ in got]
            for fa, fb in zip(order, order[1:]):
                sa, sb = want_scores[fa], want_scores[fb]
                tol = 1e-5 * max(abs(sa), abs(sb)) + 1e-7
                assert sa >= sb - tol, (q, fa, fb, sa, sb)

    def test_deleted_rows_change_stats(self, corpus):
        """Tombstoned rows leave both N and df (FTS5 deletes do the same)."""
        docs, _, _ = corpus
        keep = docs[:50]
        c = make_fts(keep)
        b = make_builder(docs[:60])
        for fid in range(51, 61):
            b.remove(fid)
        got = self._device_all(b, "apple banana", 60, "all")
        want = fts_ranks(c, "apple banana")
        assert {f for f, _ in got} == {r for r, _ in want}
        for f, v in got:
            assert v == pytest.approx(dict((r, -rk) for r, rk in want)[f], rel=1e-5)


# ---------------------------------------------------------------------------------
# 3. MATCH engine differential (sets + order + absolute scores)
# ---------------------------------------------------------------------------------


def _assert_match_parity(c, b, queries):
    for q in queries:
        want = fts_ranks(c, q)
        mine = match_search(b, q, 10**9)
        assert {h.frame_id for h in mine} == {r for r, _ in want}, q
        scores = {h.frame_id: h.score for h in mine}
        for r, rank in want:
            assert scores[r] == pytest.approx(-rank, rel=1e-9, abs=1e-12), q
        w_order = [r for r, _ in sorted(want, key=lambda x: (round(x[1], 9), x[0]))]
        m_order = [
            h.frame_id
            for h in sorted(mine, key=lambda h: (round(-h.score, 9), h.frame_id))
        ]
        assert m_order == w_order, q


class TestMatchEngineParity:
    @pytest.fixture(scope="class")
    def corpus(self):
        docs = _zipf_docs(42, 300, VOCAB)
        return make_fts(docs), make_builder(docs)

    def test_fixed_queries(self, corpus):
        c, b = corpus
        _assert_match_parity(
            c,
            b,
            [
                '"apple banana"',
                '"apple banana cherry"',
                "che*",
                "a*",
                '"apple banana"*',
                "NEAR(apple banana, 3)",
                "NEAR(apple banana, 0)",
                "NEAR(apple banana cherry, 2)",
                'NEAR("apple banana" fig, 2)',
                "NEAR(ap* ba*, 4)",
                "apple NOT banana",
                "apple OR banana cherry",
                "apple OR (banana NOT cherry)",
                "(apple OR banana) NOT cherry",
                "apple NOT (banana OR cherry)",
                "(apple AND banana) OR (cherry AND date)",
                "apple banana OR cherry date NOT fig",
                "^apple",
                "^apple banana",
                "apple + banana",
                "red + bell OR shed",
                "apple OR apple",
                '"apple apple"',
                "zz*",
                "nonexistent",
            ],
        )

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_fuzzed_queries(self, corpus, seed):
        c, b = corpus
        rng = random.Random(seed)
        t = lambda: rng.choice(VOCAB)  # noqa: E731
        qs = []
        for _ in range(40):
            kind = rng.randint(0, 6)
            if kind == 0:
                qs.append(f'"{t()} {t()}"')
            elif kind == 1:
                qs.append(f"{t()[:3]}*")
            elif kind == 2:
                qs.append(f"NEAR({t()} {t()}, {rng.randint(0, 6)})")
            elif kind == 3:
                qs.append(f"{t()} OR {t()} {t()}")
            elif kind == 4:
                qs.append(f"{t()} NOT {t()} OR {t()}")
            elif kind == 5:
                qs.append(f"({t()} OR {t()}) AND {t()}")
            else:
                qs.append(f'NEAR("{t()} {t()}" {t()}, {rng.randint(1, 8)})')
        _assert_match_parity(c, b, qs)

    def test_near_instance_filtering(self):
        """tf counts only instances surviving the NEAR constraint (observed FTS5
        behavior — a doc with an out-of-window extra instance scores lower)."""
        docs = [
            "apple banana fig",
            "apple banana x x x x x x x x x x apple banana fig",
            "fig apple banana",
        ]
        c, b = make_fts(docs), make_builder(docs)
        _assert_match_parity(c, b, ['NEAR("apple banana" fig, 2)'])

    def test_syntax_error_parity(self, corpus):
        c, b = corpus
        for q in [
            "what's",
            "foo-bar",
            "(apple OR banana) cherry",
            "AND",
            "apple AND",
            "*apple",
            "apple**",
            '"unclosed',
            "NOT apple",
            "apple OR NOT banana",
            "apple:banana",
            "",
            "   ",
        ]:
            with pytest.raises(sqlite3.OperationalError):
                c.execute("select rowid from t where t match ?", (q,)).fetchall()
            with pytest.raises(MatchSyntaxError):
                match_search(b, q, 10)

    def test_caret_counts_anchored_instances_only(self):
        docs = ["apple x apple apple", "apple y"]
        c, b = make_fts(docs), make_builder(docs)
        _assert_match_parity(c, b, ["^apple"])

    def test_frozen_builder_path(self):
        """The frozen-CSR (cold-open) builder serves the MATCH engine too."""
        docs = _zipf_docs(3, 80, VOCAB)
        b = make_builder(docs)
        vocab_list, arrays = b.frozen_or_built_arrays()
        fb = LexIndexBuilder.from_frozen_arrays(vocab_list, arrays)
        c = make_fts(docs)
        _assert_match_parity(c, fb, ['"apple banana"', "che*", "NEAR(apple banana, 3)"])

    def test_instances_feed_highlighting(self):
        docs = ["the red bicycle in the shed", "a red car"]
        b = make_builder(docs)
        hits = match_search(b, '"red bicycle"', 5)
        assert hits[0].frame_id == 1
        assert hits[0].instances[0] == ((1, 2),)


# ---------------------------------------------------------------------------------
# 4. snippet() differential (exact string equality incl. window selection)
# ---------------------------------------------------------------------------------


class TestSnippetParity:
    def _check(self, docs, queries):
        from wax_tpu.search.snippet import snippet_for_query

        c = make_fts(docs)
        for q in queries:
            rows = c.execute(
                "select rowid, snippet(t,0,'[',']','...',10) from t where t match ?",
                (q,),
            ).fetchall()
            assert rows or all(
                snippet_for_query(d, q) is not None for d in docs
            )  # parse at least agrees
            for rowid, want in rows:
                got = snippet_for_query(docs[rowid - 1], q)
                assert got == want, (q, rowid)

    def test_positional_sweep(self):
        """Window start for a single match at every position (the sweep that
        pinned down the BOL-window rule and the re-centering formula)."""
        docs = []
        for p in range(22):
            toks = [f"w{i}" for i in range(30)]
            toks[p] = "zzq"
            docs.append(" ".join(toks))
        self._check(docs, ["zzq"])

    def test_probed_cases(self):
        docs = [
            "the quick brown fox jumps over the lazy dog while another fox watches",
            "Hello, World! This is a test. With punctuation; and the target word appears here, near the end.",
            "short doc",
            "a b c d e f g target h i j k l m n o p q r s t",
            "red fox and a fox red herring with red fox again later on and more red fox here",
            # instance clusters vs singles (the shared-seen / re-centering cases)
            " ".join("target" if i in (12, 30, 32) else f"w{i}" for i in range(40)),
            " ".join({5: "alpha", 25: "beta", 27: "gamma"}.get(i, f"w{i}") for i in range(40)),
            " ".join({2: "alpha", 4: "alpha", 25: "alpha", 27: "beta"}.get(i, f"w{i}") for i in range(45)),
            " ".join("target" if i in (3, 20, 23) else f"w{i}" for i in range(40)),
            " ".join(f"w{i}" if i != 12 else "target" for i in range(14)),
        ]
        self._check(
            docs,
            [
                "fox", "target", "quick dog", '"brown fox"', "doc",
                "hello test", '"red fox" OR herring', "fo*",
                "NEAR(red fox, 2)", "alpha OR beta", "alpha OR beta OR gamma",
                "^red", "red + fox",
            ],
        )

    def test_fuzzed_snippets(self):
        rng = random.Random(7)
        docs = _zipf_docs(9, 120, VOCAB)
        t = lambda: rng.choice(VOCAB)  # noqa: E731
        queries = []
        for _ in range(30):
            kind = rng.randint(0, 4)
            if kind == 0:
                queries.append(t())
            elif kind == 1:
                queries.append(f'"{t()} {t()}"')
            elif kind == 2:
                queries.append(f"{t()} OR {t()} {t()}")
            elif kind == 3:
                queries.append(f"{t()[:3]}*")
            else:
                queries.append(f"NEAR({t()} {t()}, {rng.randint(1, 6)})")
        self._check(docs, queries)

    def test_unicode_offsets(self):
        """Marker placement must use char offsets that agree with FTS5's byte
        mapping on multibyte text."""
        docs = [
            "crème brûlée target après café entrée naïve coöp one two three four",
            "日本語 テキスト target 混在 text with ünïcödé and more words here",
        ]
        self._check(docs, ["target", "creme", "naive"])
