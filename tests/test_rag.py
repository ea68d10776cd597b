"""RAG layer: surrogates (MMR + tiers), importance scoring, context builder budgets +
determinism, answer extraction.

Mirrors the reference's FastRAGTests + DeterminismPropertyTests (repeated builds
byte-identical on a mixed corpus) and the surrogate/importance unit suites.
"""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.rag.answer import extract_answer
from wax_tpu.rag.builder import FastRAGContextBuilder
from wax_tpu.rag.config import FastRAGConfig
from wax_tpu.rag.context import RAGItemKind
from wax_tpu.rag.importance import ImportanceScorer, SurrogateTierSelector
from wax_tpu.rag.surrogates import SurrogateTier, generate_surrogate, split_sentences
from wax_tpu.search.engine import HybridSearchEngine
from wax_tpu.text.token_counter import TokenCounter

CORPUS = [
    "Max is my golden retriever. Max was born on March 3, 2021 in Austin. "
    "He loves swimming in the lake and chasing tennis balls every morning.",
    "The quarterly report shows revenue grew twelve percent. Costs stayed flat. "
    "The board approved the new budget for infrastructure.",
    "My sister Maria lives in Barcelona. She moved to Barcelona in 2019 and works "
    "as an architect designing sustainable housing.",
    "Recipe notes: the sourdough starter needs feeding twice a day. "
    "Use rye flour for more activity. Bake at 230 degrees celsius.",
    "Whiskers the cat belongs to Janet. Janet adopted Whiskers from the shelter "
    "on June 10, 2022. The cat is allergic to fish.",
]


@pytest.fixture()
def engine():
    emb = HashEmbedder(dimensions=128)
    eng = HybridSearchEngine(embedder=emb)
    for i, text in enumerate(CORPUS):
        fid = eng.frames.put(text, timestamp_ms=1_700_000_000_000 + i * 3_600_000)
        eng.index_text(fid, text)
        eng.index_embedding(fid, emb.embed(text))
    return eng


class TestSurrogates:
    def test_split_sentences(self):
        s = split_sentences("One. Two! Three? Four")
        assert len(s) == 4

    def test_tier_budgets_respected(self):
        tc = TokenCounter()
        long = " ".join(f"Sentence {i} about various topics and details." for i in range(60))
        for tier, budget in [(SurrogateTier.FULL, 100), (SurrogateTier.GIST, 25), (SurrogateTier.MICRO, 8)]:
            r = generate_surrogate(long, tier, tc)
            assert r.token_count <= budget, tier

    def test_deterministic(self):
        r1 = generate_surrogate(CORPUS[0], SurrogateTier.GIST)
        r2 = generate_surrogate(CORPUS[0], SurrogateTier.GIST)
        assert r1.text == r2.text

    def test_mmr_diversity(self):
        text = (
            "Apples are red fruit. Apples are red fruit indeed. "
            "Bananas are yellow and sweet. Apples are red fruit again."
        )
        r = generate_surrogate(text, SurrogateTier.FULL)
        assert "Bananas" in r.text  # MMR must not pick only the repeated sentence

    def test_empty(self):
        assert generate_surrogate("", SurrogateTier.GIST).text == ""


class TestImportance:
    def test_fresh_frequent_scores_high(self):
        sc = ImportanceScorer()
        now = 1_700_000_000_000
        fresh = sc.score(now, now - 3_600_000, access_count=20, last_access_ms=now - 60_000)
        stale = sc.score(now, now - 90 * 24 * 3_600_000, access_count=0, last_access_ms=None)
        assert fresh > 0.8 > stale

    def test_tier_selection(self):
        ts = SurrogateTierSelector()
        assert ts.select(0.9) == SurrogateTier.FULL
        assert ts.select(0.4) == SurrogateTier.GIST
        assert ts.select(0.05) == SurrogateTier.MICRO
        # specificity pulls a tier up
        assert ts.select(0.5, query_specificity=1.0) == SurrogateTier.FULL


class TestBuilder:
    def test_budget_respected(self, engine):
        cfg = FastRAGConfig(max_context_tokens=200, deterministic_now_ms=1_700_010_000_000)
        ctx = FastRAGContextBuilder(engine, cfg).build("dog born swimming")
        assert ctx.total_tokens <= 200
        assert sum(i.token_count for i in ctx.items) == ctx.total_tokens

    def test_expansion_first_and_relevant(self, engine):
        cfg = FastRAGConfig(deterministic_now_ms=1_700_010_000_000)
        ctx = FastRAGContextBuilder(engine, cfg).build("golden retriever Max swimming")
        assert ctx.items[0].kind == RAGItemKind.EXPANDED
        assert "Max" in ctx.items[0].text

    def test_dense_cached_includes_surrogates(self, engine):
        cfg = FastRAGConfig(mode="dense_cached", deterministic_now_ms=1_700_010_000_000)
        ctx = FastRAGContextBuilder(engine, cfg).build("report revenue budget sourdough cat")
        kinds = {i.kind for i in ctx.items}
        assert RAGItemKind.SURROGATE in kinds

    def test_repeated_builds_identical(self, engine):
        cfg = FastRAGConfig(mode="dense_cached", deterministic_now_ms=1_700_010_000_000)
        b = FastRAGContextBuilder(engine, cfg)
        c1 = b.build("where does Maria live")
        c2 = b.build("where does Maria live")
        assert c1.render() == c2.render()
        assert [i.frame_id for i in c1.items] == [i.frame_id for i in c2.items]

    def test_no_duplicate_frames(self, engine):
        cfg = FastRAGConfig(mode="dense_cached", deterministic_now_ms=1_700_010_000_000)
        ctx = FastRAGContextBuilder(engine, cfg).build("cat dog sourdough revenue")
        fids = [i.frame_id for i in ctx.items]
        assert len(fids) == len(set(fids))


class TestAnswerExtraction:
    def _ctx(self, engine, q, **kw):
        cfg = FastRAGConfig(deterministic_now_ms=1_700_010_000_000, **kw)
        return FastRAGContextBuilder(engine, cfg).build(q)

    def test_date_answer(self, engine):
        q = "when was Max born"
        ans = extract_answer(self._ctx(engine, q), q)
        assert ans is not None and ans.lane == "date"
        assert "2021" in ans.text or "March" in ans.text

    def test_location_answer(self, engine):
        q = "where does Maria live"
        ans = extract_answer(self._ctx(engine, q), q)
        assert ans is not None
        assert "Barcelona" in ans.text

    def test_owner_answer(self, engine):
        q = "who owns Whiskers"
        ans = extract_answer(self._ctx(engine, q), q)
        assert ans is not None
        assert "Janet" in ans.text
