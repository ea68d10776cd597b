"""Phase breakdown of the stress-scale cold open (verdict item 10: the 55 ms
"host-bandwidth-bound" claim needs evidence, not assertion).

Builds the same corpus as the env-gated stress benchmark (5000 docs, HashEmbedder
384-d), warms the jit executables exactly like
tests/test_benchmarks.py::test_cold_open_to_first_query, then measures a true cold
open + first query with the span instrumentation enabled:

  open.store_recover   header/TOC/footer recovery incl. TOC sha verify
  store.segment_pread  raw segment IO
  store.segment_sha256 segment checksum verification
  open.lex_decode      frozen-CSR lex builder adoption
  open.vec_decode      npz dense segment adoption
  engine.lex_snapshot  device snapshot build (incl. upload)
  orchestrator.search  first query end-to-end

    python scripts/profile_cold_open.py [N_DOCS] [REPEATS]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import tempfile

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    from wax_tpu.embed.hash_embedder import HashEmbedder
    from wax_tpu.orchestrator import MemoryOrchestrator, OrchestratorConfig
    from wax_tpu.search import engine_cache
    from wax_tpu.utils.profiling import reset_spans, span_stats

    topics = ("alpha", "beta", "gamma", "delta", "epsilon")
    cfg = OrchestratorConfig()
    d = tempfile.mkdtemp()
    path = os.path.join(d, "stress.wxs")
    t0 = time.perf_counter()
    o = MemoryOrchestrator(path, HashEmbedder(384), cfg)
    for i in range(N):
        t = topics[i % len(topics)]
        o.remember(f"doc {i}: subsystem {t} change {i % 7} produced outcome {i % 11} in run {i}")
    o.flush()
    o.close()
    print(f"built {N}-doc store in {time.perf_counter() - t0:.1f} s", flush=True)

    # warm the jit executables for the deserialized engines' shapes, then drop
    # all warm engine state (same protocol as the env-gated benchmark)
    engine_cache.clear()
    warm = MemoryOrchestrator(path, HashEmbedder(384), cfg)
    warm.search("alpha subsystem")
    warm.close()

    for rep in range(REPEATS):
        engine_cache.clear()
        reset_spans()
        t0 = time.perf_counter()
        o3 = MemoryOrchestrator(path, HashEmbedder(384), cfg)
        o3.search("alpha subsystem")
        total = (time.perf_counter() - t0) * 1e3
        stats = span_stats()
        o3.close()
        if rep == 0:
            continue  # first rep can carry residual page-cache warmup noise
        print(f"\nrep {rep}: cold open + first query = {total:.1f} ms", flush=True)
        accounted = 0.0
        for name in (
            "open.store_recover",
            "store.segment_pread",
            "store.segment_sha256",
            "open.lex_decode",
            "open.vec_decode",
            "engine.lex_snapshot",
            "engine.dense_snapshot",
            "search.bm25_lane",
            "search.vector_lane",
            "orchestrator.search",
        ):
            st = stats.get(name)
            if st is None:
                continue
            ms = st["total_ms"] if "total_ms" in st else st.get("sum", 0.0)
            print(f"  {name:24s} {ms:8.1f} ms  (n={st.get('count', st.get('n', '?'))})", flush=True)
            if name not in (
                "orchestrator.search",
                "search.bm25_lane",
                "search.vector_lane",
                "engine.dense_snapshot",
            ):
                accounted += ms
        print(f"  {'(other host work)':24s} {max(0.0, total - accounted - stats.get('orchestrator.search', {}).get('total_ms', 0.0)):8.1f} ms", flush=True)


_CHILD = r"""
import sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator import MemoryOrchestrator, OrchestratorConfig
t0 = time.perf_counter()
o = MemoryOrchestrator({path!r}, HashEmbedder(384), OrchestratorConfig())
o.search("alpha subsystem")
print("CHILD_MS", (time.perf_counter() - t0) * 1e3)
o.close()
"""


def main_fresh() -> None:
    """FRESH-PROCESS cold open -> first query (the MCP-server-restart case):
    every rep is a new interpreter, so it pays Python lane tracing unless the
    AOT executable cache (utils/aot_cache.py) serves it. Run with and without
    WAX_TPU_DISABLE_AOT=1 to see the trace cost the in-process protocol hides.

        python scripts/profile_cold_open.py N REPEATS fresh
    """
    import subprocess

    from wax_tpu.embed.hash_embedder import HashEmbedder
    from wax_tpu.orchestrator import MemoryOrchestrator, OrchestratorConfig

    topics = ("alpha", "beta", "gamma", "delta", "epsilon")
    d = tempfile.mkdtemp()
    path = os.path.join(d, "fresh.wxs")
    o = MemoryOrchestrator(path, HashEmbedder(384), OrchestratorConfig())
    for i in range(N):
        t = topics[i % len(topics)]
        o.remember(f"doc {i}: subsystem {t} change {i % 7} produced outcome {i % 11} in run {i}")
    o.flush()
    o.close()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = _CHILD.format(repo=repo, path=path)
    label = "AOT disabled" if os.environ.get("WAX_TPU_DISABLE_AOT") == "1" else "AOT enabled"
    times = []
    for rep in range(REPEATS + 1):
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, check=True
        )
        ms = float(next(l for l in out.stdout.splitlines() if l.startswith("CHILD_MS")).split()[1])
        if rep == 0:
            continue  # first child builds/loads caches + page cache
        times.append(ms)
        print(f"rep {rep}: fresh-process cold open + first query = {ms:.1f} ms ({label})",
              flush=True)
    if times:
        print(f"median: {sorted(times)[len(times) // 2]:.1f} ms ({label})")


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "fresh":
        main_fresh()
    else:
        main()
