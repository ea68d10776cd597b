"""Structured memory: entities, typed facts, bitemporal as-of queries, evidence.

The analogue of the reference's StructuredMemory usage (entities + facts + evidence
frames feeding the structured search lane). Run: python examples/02_structured_facts.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("WAX_EXAMPLES_FORCE_CPU"):  # tests run the examples on CPU
    jax.config.update("jax_platforms", "cpu")

import wax_tpu
from wax_tpu.structured.memory import FactValue


def main() -> None:
    with tempfile.TemporaryDirectory() as d:
        with wax_tpu.MemoryOrchestrator(os.path.join(d, "m.wxs")) as orch:
            # evidence: the prose memory the fact was extracted from
            r = orch.remember("Rex the german shepherd belongs to Ana since 2022.")

            orch.entity_upsert("Rex", kind="pet", aliases=["rexy"])
            orch.entity_upsert("Ana", kind="person")
            fid = orch.fact_assert(
                "Rex", "owner", FactValue.text("Ana"), evidence_frames=[r.document_id]
            )
            orch.fact_assert("Rex", "weight_kg", FactValue.real(31.5))

            # current view
            rows = orch.facts_query(subject="Rex", predicate="owner")
            print("owner:", rows[0].value.value, "evidence:", rows[0].evidence_frames)

            # supersede: re-asserting the same predicate closes the old span
            orch.fact_assert("Rex", "owner", FactValue.text("Ben"))
            print("owner now:", orch.facts_query(subject="Rex", predicate="owner")[0].value.value)

            # the structured lane boosts evidence frames in hybrid search
            hits = orch.search("who owns Rex")
            print("search sources:", [s.value for s in hits.hits[0].sources])


if __name__ == "__main__":
    main()
