"""Recall-quality harness: a synthetic long-memory corpus with known facts; measures
end-to-end answer accuracy via the deterministic extractor.

Mirrors the reference's LongMemoryBenchmarkHarness + recall-quality axis (RAGBenchmarks
with DeterministicAnswerExtractor over long-memory JSON corpora fixtures).
"""
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.rag.answer import extract_answer
from wax_tpu.rag.config import FastRAGConfig
from wax_tpu.storage.store import StoreOptions
from wax_tpu.text.chunker import ChunkingStrategy

CFG = OrchestratorConfig(
    store=StoreOptions(wal_size=1024 * 1024),
    chunking=ChunkingStrategy(target_tokens=120, overlap_tokens=12),
    rag=FastRAGConfig(deterministic_now_ms=1_700_010_000_000),
)

# (memory, question, expected answer substring, lane)
FACTS = [
    ("Rocky the labrador was born on April 12, 2019 in Denver.",
     "when was Rocky born", "2019", "date"),
    ("Aunt Clara lives in Lisbon where she teaches piano.",
     "where does Clara live", "Lisbon", "location"),
    ("The espresso machine belongs to Marcus from accounting.",
     "who owns the espresso machine", "Marcus", "owner"),
    ("Grandpa Joe moved to Osaka in 2003 after retiring.",
     "where does Joe live", "Osaka", "location"),
    ("Luna the cat was adopted on June 10, 2022 from the river shelter.",
     "when was Luna adopted", "2022", "date"),
    ("The red kayak belongs to Priya; she stores it in the garage.",
     "who owns the red kayak", "Priya", "owner"),
    ("Tommy is severely allergic to peanuts and shellfish.",
     "what is Tommy allergic to", "peanuts", "allergy"),
    ("Mei's favorite dessert is tiramisu from the corner bakery.",
     "what is Mei's favorite dessert", "tiramisu", "preference"),
    ("Biscuit the parrot learned to whistle the whole anthem.",
     "what is the name of the parrot", "Biscuit", "pet"),
    ("Dr. Okafor prefers morning appointments before nine.",
     "does Okafor prefer morning or afternoon appointments", "morning", "preference"),
    # reference distractor-pattern facts (UnifiedSearch.swift:854-906 heuristics):
    # authoritative launch date vs tentative drafts, ownership vs launch confusion,
    # moved-to-city vs retrospective chatter
    ("The public launch is March 14, 2024.",
     "when is the public launch date", "March 14", "date"),
    ("Dana owns deployment readiness for the rollout.",
     "who owns deployment readiness", "Dana", "owner"),
    ("Omar moved to Valencia last spring.",
     "where did Omar move", "Valencia", "location"),
]

# multi-hop pairs: the answer requires joining two separate memories; graded on the
# assembled context containing both hops (reference: QueryAnalyzer multiHop intent)
MULTI_HOP = [
    (("The blue tandem bike belongs to Sofia.", "Sofia lives in Porto near the bridge."),
     "where does the owner of the blue tandem bike live", ("sofia", "porto")),
    (("Max the beagle was adopted by the Chen family.", "The Chen family moved to Seattle in 2021."),
     "which city does Max the beagle live in now", ("chen", "seattle")),
]

DISTRACTORS = [
    f"Journal entry {i}: today was mostly about {topic}, nothing unusual happened."
    for i, topic in enumerate(
        ["gardening", "meetings", "traffic", "cooking", "emails", "laundry",
         "shopping", "reading", "weather", "budgets"] * 5
    )
] + [
    # near-miss distractors sharing entities/shapes with the facts
    "Tommy borrowed a peanut-butter cookbook from the library last spring.",
    "A different kayak, the green one, belongs to the rowing club.",
    "Mei mentioned the bakery was closed for renovations in March.",
    "Sofia's coworker commutes across a different bridge every day.",
    # the reference's calibrated distractor patterns (tentative launch language,
    # draft memos, ownership/launch confusion, retrospective city chatter — the
    # phrases intentAwareRerank penalizes, UnifiedSearch.swift:854-958)
    "Draft memo: the public launch target is April 2, pending approval.",
    "Tentative estimate: the launch could be pushed to May if the checklist slips.",
    "The public launch weekly report needs a signoff from Dana's team.",
    "Omar wrote a retrospective about a hypothetical city move without a destination.",
    "In 2015 a different dog named Rocky lived in Austin with the neighbors.",
]


@pytest.fixture(scope="module")
def orch(tmp_path_factory):
    p = tmp_path_factory.mktemp("quality") / "q.wxs"
    o = MemoryOrchestrator(p, HashEmbedder(256), CFG)
    o.remember_batch([m for m, _, _, _ in FACTS])
    o.remember_batch([m for pair, _, _ in MULTI_HOP for m in pair])
    o.remember_batch(DISTRACTORS)
    yield o
    o.close()


class TestRecallQuality:
    def test_answer_accuracy(self, orch):
        correct = 0
        for memory, question, expected, lane in FACTS:
            ctx = orch.recall(question)
            ans = extract_answer(ctx, question)
            if ans is not None and expected.lower() in ans.text.lower():
                correct += 1
        accuracy = correct / len(FACTS)
        assert accuracy >= 0.8, f"answer accuracy {accuracy:.2f} below 0.8"

    def test_top_context_contains_fact(self, orch):
        hits = 0
        for memory, question, expected, _ in FACTS:
            ctx = orch.recall(question)
            joined = ctx.render().lower()
            if expected.lower() in joined:
                hits += 1
        assert hits / len(FACTS) >= 0.8

    def test_multi_hop_context_joins_both_memories(self, orch):
        """Both hops of a two-memory chain must land in one assembled context."""
        joined_ok = 0
        for _pair, question, needles in MULTI_HOP:
            ctx = orch.recall(question)
            low = ctx.render().lower()
            if all(n in low for n in needles):
                joined_ok += 1
        assert joined_ok >= len(MULTI_HOP) - 1, f"only {joined_ok}/{len(MULTI_HOP)} joined"

    def test_long_memory_scale(self, tmp_path):
        """Larger long-memory corpus (the reference's long-memory JSON corpora axis):
        600 memories — 30 planted facts across 6 entity families + 570 generated
        distractors — answer accuracy must hold at scale, not just on a toy set."""
        import random

        rng = random.Random(7)
        people = ["Asha", "Bruno", "Carmen", "Dmitri", "Elif", "Farid"]
        cities = ["Nairobi", "Tallinn", "Cusco", "Sapporo", "Galway", "Muscat"]
        objects = ["telescope", "accordion", "surfboard", "easel", "drone", "loom"]
        facts = []
        for i, (p, c, ob) in enumerate(zip(people, cities, objects)):
            facts += [
                (f"{p} moved to {c} in 20{10 + i}.", f"where does {p} live", c.lower()),
                (f"The {ob} belongs to {p}.", f"who owns the {ob}", p.lower()),
                (f"{p} was born on March {i + 3}, 199{i}.", f"when was {p} born", f"199{i}"),
                (f"{p} is allergic to {'shellfish' if i % 2 else 'walnuts'}.",
                 f"what is {p} allergic to", "shellfish" if i % 2 else "walnuts"),
                (f"{p}'s favorite dish is {'ramen' if i % 2 else 'paella'}.",
                 f"what is {p}'s favorite dish", "ramen" if i % 2 else "paella"),
            ]
        topics = ["standup", "invoices", "garden", "commute", "backups", "laundry",
                  "weather", "groceries", "podcast", "jogging"]
        distractors = [
            f"Note {i}: spent the afternoon on {rng.choice(topics)} and "
            f"{rng.choice(topics)}, nothing memorable."
            for i in range(570)
        ]
        o = MemoryOrchestrator(tmp_path / "big.wxs", HashEmbedder(256), CFG)
        try:
            o.remember_batch([f for f, _, _ in facts])
            o.remember_batch(distractors)
            o.flush()
            correct = 0
            for _, q, exp in facts:
                ans = extract_answer(o.recall(q), q)
                if ans is not None and exp in ans.text.lower():
                    correct += 1
            accuracy = correct / len(facts)
            assert accuracy >= 0.85, f"scale accuracy {accuracy:.2f} ({correct}/{len(facts)})"
        finally:
            o.close()

    def test_batched_ingest_equivalent_to_single(self, tmp_path):
        a = MemoryOrchestrator(tmp_path / "a.wxs", HashEmbedder(128), CFG)
        b = MemoryOrchestrator(tmp_path / "b.wxs", HashEmbedder(128), CFG)
        docs = [m for m, _, _, _ in FACTS]
        for d in docs:
            a.remember(d, timestamp_ms=1_700_000_000_000)
        b.remember_batch(docs, timestamp_ms=1_700_000_000_000)
        qa = a.search("who owns the espresso machine").hits
        qb = b.search("who owns the espresso machine").hits
        assert [h.frame_id for h in qa] == [h.frame_id for h in qb]
        a.close()
        b.close()
