"""Memory orchestrator quickstart: remember -> search -> recall -> flush -> reopen.

The highest-level API (the analogue of the reference's MemoryOrchestrator quickstart,
reference: README.md usage section). Run: python examples/01_memory_orchestrator.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("WAX_EXAMPLES_FORCE_CPU"):  # tests run the examples on CPU
    jax.config.update("jax_platforms", "cpu")

import wax_tpu


def main() -> None:
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "memory.wxs")

        with wax_tpu.MemoryOrchestrator(path) as orch:
            orch.remember("Max the golden retriever was born on March 3, 2021 in Austin.")
            orch.remember("Sarah is allergic to peanuts and shellfish.")
            orch.remember(
                "Deploy checklist: bump version, run soak, tag release.",
                metadata={"team": "platform"},
                tags=("runbook",),
            )

            hits = orch.search("when was Max born")
            print("top hit:", hits.hits[0].preview)

            ctx = orch.recall("what is Sarah allergic to")
            print("recall context:\n", ctx.render()[:200])

            orch.flush()  # atomic commit

        # reopen: committed state loads; un-flushed writes would have been
        # WAL-recovered automatically
        with wax_tpu.MemoryOrchestrator(path) as orch:
            assert orch.search("deploy checklist").hits
            print("reopen OK — vector_count:", orch.runtime_stats()["vector_count"])


if __name__ == "__main__":
    main()
