"""Structured memory: entities/aliases, typed facts, bitemporal as-of queries,
evidence lane, serialization round-trip, orchestrator integration.

Mirrors the reference's StructuredMemory*Tests.
"""
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions
from wax_tpu.structured.memory import FactValue, StructuredMemory
from wax_tpu.types import SearchRequest


@pytest.fixture()
def sm():
    return StructuredMemory()


class TestEntities:
    def test_upsert_idempotent(self, sm):
        a = sm.entity_upsert("Maria", kind="person")
        b = sm.entity_upsert("Maria")
        assert a == b

    def test_alias_resolve(self, sm):
        eid = sm.entity_upsert("Maria Garcia", aliases=["maria", "la arquitecta"])
        assert sm.entity_resolve("maria") == eid
        assert sm.entity_resolve("La Arquitecta".lower()) == eid
        assert sm.entity_resolve("nobody") is None


class TestFacts:
    def test_typed_values_roundtrip(self, sm):
        eid = sm.entity_upsert("Max", kind="pet")
        cases = [
            ("species", FactValue.text("dog")),
            ("age", FactValue.integer(4)),
            ("weight_kg", FactValue.real(28.5)),
            ("vaccinated", FactValue.boolean(True)),
            ("born_ms", FactValue.time_ms(1_614_700_000_000)),
        ]
        for pred, val in cases:
            sm.fact_assert(eid, pred, val)
        for pred, val in cases:
            rows = sm.facts_query(subject="Max", predicate=pred)
            assert len(rows) == 1
            assert rows[0].value == val

    def test_assert_supersedes_open_span(self, sm):
        sm.entity_upsert("Maria")
        sm.fact_assert("Maria", "lives_in", FactValue.text("Madrid"), valid_from_ms=1000)
        sm.fact_assert("Maria", "lives_in", FactValue.text("Barcelona"), valid_from_ms=2000)
        current = sm.facts_query(subject="Maria", predicate="lives_in")
        assert len(current) == 1 and current[0].value.value == "Barcelona"

    def test_as_of_query(self, sm):
        sm.fact_assert("Maria", "lives_in", FactValue.text("Madrid"), valid_from_ms=1000)
        sm.fact_assert("Maria", "lives_in", FactValue.text("Barcelona"), valid_from_ms=2000)
        # as-of transaction time is now; valid time 1500 -> Madrid
        rows = sm.facts_query(subject="Maria", predicate="lives_in", as_of_ms=1500)
        # asserted_ms is wall clock (now) > 1500, so bitemporal as-of excludes them
        assert rows == []
        # valid-time-only behavior via far-future as_of keeps the open span
        rows_now = sm.facts_query(subject="Maria", predicate="lives_in", as_of_ms=10**15)
        assert len(rows_now) == 1 and rows_now[0].value.value == "Barcelona"

    def test_retract(self, sm):
        fid = sm.fact_assert("Max", "status", FactValue.text("active"))
        assert sm.fact_retract(fid)
        assert sm.facts_query(subject="Max", predicate="status") == []

    def test_content_hash_stable(self, sm):
        f1 = sm.fact_assert("A", "p", FactValue.text("v"), valid_from_ms=1)
        h1 = sm.conn.execute("SELECT content_hash FROM sm_fact WHERE fact_id=?", (f1,)).fetchone()[0]
        sm2 = StructuredMemory()
        f2 = sm2.fact_assert("A", "p", FactValue.text("v"), valid_from_ms=99)
        h2 = sm2.conn.execute("SELECT content_hash FROM sm_fact WHERE fact_id=?", (f2,)).fetchone()[0]
        assert h1 == h2


class TestEvidence:
    def test_evidence_lane(self, sm):
        eid = sm.entity_upsert("Whiskers", aliases=["the cat"])
        sm.fact_assert(eid, "owner", FactValue.text("Janet"), evidence_frames=[7, 9])
        assert sm.evidence_frame_ids("who owns Whiskers") == [7, 9]
        assert sm.evidence_frame_ids("unrelated query") == []

    def test_evidence_spans(self, sm):
        eid = sm.entity_upsert("Rex")
        fid = sm.fact_assert(eid, "owner", FactValue.text("Ana"),
                             evidence_frames=[(4, 10, 28), 9])
        spans = sm.evidence_spans(fid)
        assert (4, 10, 28) in spans
        assert (9, None, None) in spans

    def test_multiword_entity_match(self, sm):
        sm.entity_upsert("Maria Garcia")
        sm.fact_assert("Maria Garcia", "lives_in", FactValue.text("Barcelona"), evidence_frames=[3])
        assert sm.evidence_frame_ids("where does Maria Garcia live") == [3]


class TestSerialization:
    def test_roundtrip(self, sm):
        sm.fact_assert("Max", "species", FactValue.text("dog"), evidence_frames=[1])
        blob = sm.serialize()
        sm2 = StructuredMemory.deserialize(blob)
        rows = sm2.facts_query(subject="Max", predicate="species")
        assert rows and rows[0].value.value == "dog"
        assert rows[0].evidence_frames == (1,)


class TestOrchestratorIntegration:
    def test_structured_lane_and_persistence(self, tmp_path):
        cfg = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))
        p = tmp_path / "m.wxs"
        with MemoryOrchestrator(p, HashEmbedder(64), cfg) as o:
            res = o.remember("Whiskers the cat belongs to Janet and hates fish.")
            o.entity_upsert("Whiskers", kind="pet", aliases=["whiskers"])
            o.fact_assert("Whiskers", "owner", FactValue.text("Janet"),
                          evidence_frames=[res.document_id])
            resp = o.search(SearchRequest(query="who owns Whiskers", top_k=5))
            assert any("structured" in [s.value for s in h.sources] for h in resp.hits)
            o.flush()
        with MemoryOrchestrator(p, HashEmbedder(64), cfg) as o2:
            rows = o2.facts_query(subject="Whiskers", predicate="owner")
            assert rows and rows[0].value.value == "Janet"
