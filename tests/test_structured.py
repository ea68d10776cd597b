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


class FakeClock:
    """Deterministic injectable clock (reference: TimestampOverrideTests)."""

    def __init__(self, start: int = 1000):
        self.t = start

    def __call__(self) -> int:
        return self.t

    def tick(self, ms: int = 1) -> int:
        self.t += ms
        return self.t


class TestBitemporalMatrix:
    """Deterministic transaction-time x valid-time matrix with an injected clock.

    Mirrors the reference's StructuredMemoryAsOf behaviors: a fact is visible at
    as_of T iff it was asserted by T (transaction time) AND T falls in a validity
    span [valid_from, valid_to) (valid time, half-open)."""

    def _seed(self):
        clk = FakeClock(1000)
        sm = StructuredMemory(now=clk)
        sm.entity_upsert("Maria")
        # t=1000: Madrid valid from 500
        f1 = sm.fact_assert("Maria", "lives_in", FactValue.text("Madrid"), valid_from_ms=500)
        clk.tick(1000)  # t=2000: Barcelona valid from 1500 (closes Madrid at 1500)
        f2 = sm.fact_assert("Maria", "lives_in", FactValue.text("Barcelona"), valid_from_ms=1500)
        return clk, sm, f1, f2

    def test_transaction_time_excludes_unasserted(self):
        _, sm, _, _ = self._seed()
        # valid-time 1600 matches Barcelona, but it was asserted at 2000:
        # an observer at as_of=1600 had not seen the assertion yet
        assert sm.facts_query("Maria", "lives_in", as_of_ms=1600) == []

    def test_valid_time_half_open_boundaries(self):
        _, sm, _, _ = self._seed()
        # as_of >= 2000 (both asserted): Madrid span is [500, 1500), Barcelona [1500, None)
        rows = sm.facts_query("Maria", "lives_in", as_of_ms=2000)
        assert [r.value.value for r in rows] == ["Barcelona"]
        # exactly at the supersede boundary (1500) Barcelona owns the instant,
        # but transaction time (asserted 2000) hides it; Madrid's span is closed
        assert sm.facts_query("Maria", "lives_in", as_of_ms=1500) == []
        # 1000 <= as_of < 1500 with assertion visible at 1000: Madrid
        rows = sm.facts_query("Maria", "lives_in", as_of_ms=1400)
        assert [r.value.value for r in rows] == ["Madrid"]

    def test_before_any_validity(self):
        _, sm, _, _ = self._seed()
        assert sm.facts_query("Maria", "lives_in", as_of_ms=400) == []

    def test_current_view_tracks_latest_open_span(self):
        clk, sm, _, _ = self._seed()
        rows = sm.facts_query("Maria", "lives_in")
        assert [r.value.value for r in rows] == ["Barcelona"]
        clk.tick(1000)  # t=3000: move again
        sm.fact_assert("Maria", "lives_in", FactValue.text("Lisbon"), valid_from_ms=2500)
        rows = sm.facts_query("Maria", "lives_in")
        assert [r.value.value for r in rows] == ["Lisbon"]
        # the full history is reconstructible: at as_of=3000 every assert is visible,
        # and valid time picks the epoch
        assert [r.value.value for r in sm.facts_query("Maria", "lives_in", as_of_ms=3000)] == ["Lisbon"]
        # Barcelona epoch: valid [1500, 2500) — but only visible once asserted;
        # asserted_ms=2000 <= 2400, so the 2400 observer sees it
        assert [r.value.value for r in sm.facts_query("Maria", "lives_in", as_of_ms=2400)] == ["Barcelona"]

    def test_retract_closes_open_span_deterministically(self):
        clk, sm, _, f2 = self._seed()
        clk.tick(5000)  # t=7000
        assert sm.fact_retract(f2)
        assert sm.facts_query("Maria", "lives_in") == []
        # the retraction timestamp is the injected clock, not the wall clock
        row = sm.conn.execute(
            "SELECT valid_to_ms FROM sm_fact_span WHERE fact_id=?", (f2,)
        ).fetchone()
        assert row[0] == 7000

    def test_retract_then_reassert_same_value(self):
        clk, sm, _, f2 = self._seed()
        clk.tick(1000)
        sm.fact_retract(f2)
        clk.tick(1000)  # t=4000
        f3 = sm.fact_assert("Maria", "lives_in", FactValue.text("Barcelona"), valid_from_ms=3500)
        rows = sm.facts_query("Maria", "lives_in")
        assert len(rows) == 1 and rows[0].fact_id == f3
        # content hash is identical across the retract/reassert cycle
        h2, h3 = (
            sm.conn.execute("SELECT content_hash FROM sm_fact WHERE fact_id=?", (f,)).fetchone()[0]
            for f in (f2, f3)
        )
        assert h2 == h3

    def test_supersede_scoped_per_predicate_and_subject(self):
        clk = FakeClock(1000)
        sm = StructuredMemory(now=clk)
        sm.fact_assert("Maria", "lives_in", FactValue.text("Madrid"))
        sm.fact_assert("Maria", "works_at", FactValue.text("Acme"))
        sm.fact_assert("Janet", "lives_in", FactValue.text("Oslo"))
        clk.tick(1000)
        sm.fact_assert("Maria", "lives_in", FactValue.text("Barcelona"))
        # other predicate and other subject keep their open spans
        assert sm.facts_query("Maria", "works_at")[0].value.value == "Acme"
        assert sm.facts_query("Janet", "lives_in")[0].value.value == "Oslo"
        assert sm.facts_query("Maria", "lives_in")[0].value.value == "Barcelona"

    def test_no_supersede_keeps_parallel_open_spans(self):
        clk = FakeClock(1000)
        sm = StructuredMemory(now=clk)
        sm.fact_assert("Max", "likes", FactValue.text("fetch"), supersede_open_spans=False)
        clk.tick(10)
        sm.fact_assert("Max", "likes", FactValue.text("naps"), supersede_open_spans=False)
        rows = sm.facts_query("Max", "likes")
        assert sorted(r.value.value for r in rows) == ["fetch", "naps"]

    def test_serialize_preserves_bitemporal_view(self):
        clk, sm, _, _ = self._seed()
        sm2 = StructuredMemory.deserialize(sm.serialize(), now=clk)
        for as_of in (400, 1400, 1600, 2000, 10**7):
            a = [(r.value.value, r.valid_from_ms, r.valid_to_ms)
                 for r in sm.facts_query("Maria", "lives_in", as_of_ms=as_of)]
            b = [(r.value.value, r.valid_from_ms, r.valid_to_ms)
                 for r in sm2.facts_query("Maria", "lives_in", as_of_ms=as_of)]
            assert a == b

    def test_orchestrator_clock_threads_into_structured(self, tmp_path):
        clk = FakeClock(50_000)
        cfg = OrchestratorConfig(clock_ms=clk)
        with MemoryOrchestrator(tmp_path / "m.wxs", HashEmbedder(64), cfg) as o:
            fid = o.fact_assert("Rex", "status", FactValue.text("active"))
            row = o.structured.conn.execute(
                "SELECT asserted_ms FROM sm_fact WHERE fact_id=?", (fid,)
            ).fetchone()
            assert row[0] == 50_000
            o.flush()
        # reopen: the deserialized structured store keeps using the injected clock
        with MemoryOrchestrator(tmp_path / "m.wxs", HashEmbedder(64), cfg) as o2:
            clk.t = 60_000
            assert o2.fact_retract(fid)
            row = o2.structured.conn.execute(
                "SELECT valid_to_ms FROM sm_fact_span WHERE fact_id=?", (fid,)
            ).fetchone()
            assert row[0] == 60_000
