"""Unified hybrid search: lanes, fusion, rerank, filters, determinism.

Mirrors the reference's UnifiedSearchTests / HybridSearchTests / DeterminismPropertyTests
(RRF idempotence + permutation order-independence, repeated searches byte-identical).
"""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.ops.fusion import rrf_fuse
from wax_tpu.search.engine import HybridSearchEngine
from wax_tpu.search.unified import unified_search
from wax_tpu.types import SearchMode, SearchRequest, TimeRange, QueryType

DOCS = [
    "The quick brown fox jumps over the lazy dog in the meadow",
    "Quantum computing uses qubits to perform parallel computation",
    "My cat Whiskers loves sleeping on the warm windowsill",
    "Stock markets rallied today as technology shares surged",
    "The fox den is located near the old oak tree by the river",
    "Recipe for sourdough bread: flour, water, salt and patience",
    "Mars rover Perseverance collected new rock samples yesterday",
    "The dog park on Fifth Avenue opens at seven in the morning",
]


@pytest.fixture()
def engine():
    emb = HashEmbedder(dimensions=128)
    eng = HybridSearchEngine(embedder=emb)
    for i, text in enumerate(DOCS):
        fid = eng.frames.put(text, timestamp_ms=1_700_000_000_000 + i * 60_000, search_text=text)
        eng.index_text(fid, text)
        eng.index_embedding(fid, emb.embed(text))
    return eng


class TestUnifiedSearch:
    def test_lexical_match_wins(self, engine):
        resp = unified_search(engine, SearchRequest(query="quick brown fox", top_k=3))
        assert resp.hits, "expected hits"
        assert resp.hits[0].frame_id == 0

    def test_hybrid_includes_vector_lane(self, engine):
        resp = unified_search(engine, SearchRequest(query="quantum qubits computation", top_k=3))
        assert resp.hits[0].frame_id == 1
        assert any("vector" in [s.value for s in h.sources] for h in resp.hits)

    def test_text_only_mode(self, engine):
        resp = unified_search(
            engine, SearchRequest(query="sourdough bread", mode=SearchMode.TEXT_ONLY, top_k=2)
        )
        assert resp.hits[0].frame_id == 5
        assert all(s.value == "bm25" for h in resp.hits for s in h.sources)

    def test_vector_only_mode(self, engine):
        resp = unified_search(
            engine, SearchRequest(query="feline pet sleeping window", mode=SearchMode.VECTOR_ONLY, top_k=3)
        )
        assert resp.hits
        assert all(s.value == "vector" for h in resp.hits for s in h.sources)

    def test_temporal_query_classified_and_laned(self, engine):
        resp = unified_search(engine, SearchRequest(query="what happened yesterday", top_k=5))
        assert resp.query_type == QueryType.TEMPORAL
        assert "temporal" in resp.lane_counts

    def test_deleted_frames_excluded(self, engine):
        engine.frames.delete(0)
        resp = unified_search(engine, SearchRequest(query="quick brown fox", top_k=5))
        assert all(h.frame_id != 0 for h in resp.hits)

    def test_frame_filter(self, engine):
        resp = unified_search(
            engine,
            SearchRequest(query="fox", top_k=5, frame_filter=frozenset({4})),
        )
        assert [h.frame_id for h in resp.hits] == [4]

    def test_time_range_filter(self, engine):
        tr = TimeRange(after_ms=1_700_000_000_000 + 5 * 60_000)
        resp = unified_search(engine, SearchRequest(query="fox dog", top_k=8, time_range=tr))
        assert all(h.frame_id >= 5 for h in resp.hits)

    def test_timeline_fallback_on_no_match(self, engine):
        resp = unified_search(engine, SearchRequest(query="xylophone zeppelin", top_k=3))
        # no lexical match and vector lane still returns neighbors; force empty by
        # vector-less engine
        eng2 = HybridSearchEngine(embedder=None, dim=128, frames=engine.frames)
        resp = unified_search(eng2, SearchRequest(query="xylophone zeppelin", top_k=3))
        assert resp.hits, "timeline fallback should produce newest frames"
        assert resp.hits[0].frame_id == 7  # newest

    def test_determinism_repeated(self, engine):
        req = SearchRequest(query="where is the fox den located", top_k=5, include_diagnostics=True)
        r1 = unified_search(engine, req)
        r2 = unified_search(engine, req)
        assert [h.frame_id for h in r1.hits] == [h.frame_id for h in r2.hits]
        assert [h.score for h in r1.hits] == [h.score for h in r2.hits]

    def test_snippet_contains_term(self, engine):
        resp = unified_search(engine, SearchRequest(query="sourdough recipe", top_k=1))
        assert "sourdough" in resp.hits[0].preview.lower()

    def test_diagnostics(self, engine):
        resp = unified_search(
            engine, SearchRequest(query="quick brown fox", top_k=3, include_diagnostics=True)
        )
        d = resp.hits[0].diagnostics
        assert d is not None and d.rrf_score > 0 and d.lane_ranks


class TestRRFProperties:
    """Reference: DeterminismPropertyTests.swift:5-56."""

    def test_idempotence(self):
        lanes = {"a": [(1, 9.0), (2, 5.0)], "b": [(2, 4.0), (3, 2.0)]}
        w = {"a": 0.6, "b": 0.4}
        r1 = rrf_fuse(lanes, w)
        r2 = rrf_fuse(lanes, w)
        assert r1 == r2

    def test_lane_key_order_independence(self):
        lanes1 = {"a": [(1, 9.0), (2, 5.0)], "b": [(2, 4.0), (3, 2.0)]}
        lanes2 = {"b": [(2, 4.0), (3, 2.0)], "a": [(1, 9.0), (2, 5.0)]}
        w = {"a": 0.5, "b": 0.5}
        assert rrf_fuse(lanes1, w) == rrf_fuse(lanes2, w)

    def test_tie_break_by_best_rank_then_id(self):
        # two hits with identical fused score from symmetric lanes
        lanes = {"a": [(10, 1.0)], "b": [(20, 1.0)]}
        w = {"a": 0.5, "b": 0.5}
        out = rrf_fuse(lanes, w)
        assert [h.frame_id for h in out] == [10, 20]  # equal score+rank -> id asc

    def test_weight_zero_lane_does_not_score(self):
        lanes = {"a": [(1, 1.0)], "b": [(2, 1.0)]}
        out = rrf_fuse(lanes, {"a": 1.0, "b": 0.0})
        assert out[0].frame_id == 1 and out[1].score == 0.0

    def test_duplicate_in_lane_keeps_first_rank(self):
        lanes = {"a": [(1, 9.0), (1, 8.0), (2, 5.0)]}
        out = rrf_fuse(lanes, {"a": 1.0})
        assert out[0].frame_id == 1 and out[0].lane_ranks["a"] == 1
        assert out[1].lane_ranks["a"] == 2  # rank 2 assigned to next distinct id


class TestMatchQueryWiring:
    """FTS5 MATCH syntax flows through the primary lane (phrases/prefix/NEAR shape
    RETRIEVAL, not just rerank) with the reference's sanitize-then-fallback flow
    (UnifiedSearch.swift:98-138) and snippet-highlighted previews (:196-198)."""

    def test_quoted_phrase_narrows_retrieval(self, engine):
        resp = unified_search(
            engine, SearchRequest(query='"fox den"', mode=SearchMode.TEXT_ONLY, top_k=8)
        )
        # primary lane: only the phrase doc; fallback then broadens with OR hits
        assert resp.hits[0].frame_id == 4
        resp2 = unified_search(
            engine, SearchRequest(query='"brown fox jumps"', mode=SearchMode.TEXT_ONLY, top_k=8)
        )
        assert resp2.hits[0].frame_id == 0

    def test_prefix_sanitized_in_unified_raw_in_engine(self, engine):
        # Reference parity: `*` is ASCII punctuation, so the unified sanitizer
        # rewrites `quan* comp*` to '"quan" "comp"' BEFORE it reaches MATCH — the
        # prefix is lost there (the real pipeline does the same). Raw prefix power
        # lives on the direct text-engine surface, like FTS5SearchEngine.search.
        resp = unified_search(
            engine, SearchRequest(query="quan* comp*", mode=SearchMode.TEXT_ONLY, top_k=4)
        )
        assert not resp.hits or resp.hits[0].frame_id != 1  # sanitized: no prefix
        from wax_tpu.search.match import match_search

        hits = match_search(engine.lex, "quan* comp*", 4)
        assert hits and hits[0].frame_id == 1

    def test_near_query(self, engine):
        # NEAR(...) contains punctuation -> sanitized to bag-of-terms by the
        # reference pipeline; raw NEAR works on the direct engine surface
        resp = unified_search(
            engine, SearchRequest(query="NEAR(rover samples, 6)", mode=SearchMode.TEXT_ONLY, top_k=4)
        )
        assert resp.hits and resp.hits[0].frame_id == 6  # via OR fallback
        from wax_tpu.search.match import match_search

        hits = match_search(engine.lex, "NEAR(rover samples, 6)", 4)
        assert hits and hits[0].frame_id == 6

    def test_boolean_or_raw_passthrough(self, engine):
        # no ASCII punctuation -> raw MATCH semantics incl. OR
        resp = unified_search(
            engine, SearchRequest(query="sourdough OR windowsill", mode=SearchMode.TEXT_ONLY, top_k=4)
        )
        got = {h.frame_id for h in resp.hits}
        assert {2, 5} <= got

    def test_not_operator(self, engine):
        resp = unified_search(
            engine, SearchRequest(query="fox NOT meadow", mode=SearchMode.TEXT_ONLY, top_k=8)
        )
        # primary: doc 4 only (doc 0 has meadow); doc 0 may reappear via OR fallback
        assert resp.hits[0].frame_id == 4

    def test_punctuation_sanitized_like_reference(self, engine):
        # "what's" would be an FTS5 syntax error raw; the sanitizer quotes tokens
        resp = unified_search(
            engine, SearchRequest(query="what's the dog park?", mode=SearchMode.TEXT_ONLY, top_k=4)
        )
        assert resp.hits and resp.hits[0].frame_id == 7

    def test_snippet_markers_in_preview(self, engine):
        resp = unified_search(
            engine, SearchRequest(query="sourdough bread", mode=SearchMode.TEXT_ONLY, top_k=1)
        )
        assert "[sourdough]" in resp.hits[0].preview and "[bread]" in resp.hits[0].preview

    def test_phrase_snippet_single_span(self, engine):
        resp = unified_search(
            engine, SearchRequest(query='"fox den"', mode=SearchMode.TEXT_ONLY, top_k=1)
        )
        assert "[fox den]" in resp.hits[0].preview

    def test_vector_only_preview_unmarked(self, engine):
        resp = unified_search(
            engine,
            SearchRequest(query="feline pet sleeping window", mode=SearchMode.VECTOR_ONLY, top_k=3),
        )
        assert all("[" not in h.preview for h in resp.hits)

    def test_stopword_only_query_degrades_to_empty_text_lane(self, engine):
        # DELIBERATE divergence from reference :132-137 (which rethrows): a
        # natural-language query whose every token is a stopword/letterless has
        # nothing for BM25 to match — the text lane is empty, not an error, so
        # hybrid mode still answers from the vector lane.
        for q in ("???", "what?", "when??", "a, and...", "what is it, and when?"):
            resp = unified_search(engine, SearchRequest(query=q, mode=SearchMode.TEXT_ONLY))
            assert not resp.hits, q
            hybrid = unified_search(engine, SearchRequest(query=q))
            assert hybrid.hits, q  # vector lane still serves

    def test_explicit_match_syntax_error_still_raises(self, engine):
        # explicit MATCH syntax keeps FTS5 semantics: a genuine syntax error in a
        # query the user wrote AS match syntax surfaces (reference :132-137)
        from wax_tpu.search.match import MatchSyntaxError

        with pytest.raises(MatchSyntaxError):
            unified_search(engine, SearchRequest(query="AND (", mode=SearchMode.TEXT_ONLY))

    def test_deterministic_repeat(self, engine):
        q = SearchRequest(query='"fox den" OR meadow', mode=SearchMode.TEXT_ONLY, top_k=5)
        a = unified_search(engine, q)
        b = unified_search(engine, q)
        assert [(h.frame_id, h.score, h.preview) for h in a.hits] == [
            (h.frame_id, h.score, h.preview) for h in b.hits
        ]


class TestAndBudgetGuard:
    """A manual postings budget below the auto recall floor warns on AND queries
    (silent-recall-loss config; docs/benchmarks.md budgeted AND-mode recall)."""

    def _engine(self, budget):
        emb = HashEmbedder(dimensions=64)
        eng = HybridSearchEngine(embedder=emb, lex_postings_budget=budget)
        # "shared" appears in every doc (df 6 > budget 2), so a manual budget
        # of 2 truncates its impact head in the exact (<256K rows) regime
        for i in range(6):
            text = f"shared topic document number{i} extra{i} filler"
            fid = eng.frames.put(text, timestamp_ms=1_700_000_000_000 + i, search_text=text)
            eng.index_text(fid, text)
            eng.index_embedding(fid, emb.embed(text))
        return eng

    def test_and_query_under_manual_budget_warns(self):
        eng = self._engine(budget=2)
        resp = unified_search(eng, SearchRequest(query="shared topic", top_k=3))
        assert resp.warnings, "expected an AND-mode budget warning"
        assert "lex_postings_budget=2" in resp.warnings[0]
        assert len(resp.warnings) == 1  # deduped across primary+fallback passes

    def test_auto_budget_never_warns(self):
        eng = self._engine(budget="auto")
        resp = unified_search(eng, SearchRequest(query="shared topic", top_k=3))
        assert resp.warnings == ()

    def test_non_truncating_manual_budget_does_not_warn(self):
        eng = self._engine(budget=4096)
        resp = unified_search(eng, SearchRequest(query="shared topic", top_k=3))
        assert resp.warnings == ()

    def test_single_term_or_query_does_not_warn(self):
        eng = self._engine(budget=2)
        resp = unified_search(eng, SearchRequest(query="shared", top_k=3))
        assert resp.warnings == ()
