"""Serving-scale recipe: spilled IVF + warm engine reuse + concurrent searches.

Shows the round-3 production patterns for multi-million-row corpora:
  * `build_ivf(spill="auto")` — boundary replication into bucket slack (the recall
    lever: 0.878 -> 0.980 @ nprobe 8 measured at 5.5M x 384, docs/benchmarks.md);
  * the IVFVectorEngine wrapper with the same option persisted across commits;
  * concurrent read-phase searches against one MemoryOrchestrator (the RW lock
    lets them run in parallel; mutations stay exclusive).

Run: python examples/06_serving_scale_ivf.py
"""
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("WAX_EXAMPLES_FORCE_CPU"):  # tests run the examples on CPU
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from wax_tpu.index.ivf import build_ivf, ivf_search_topk


def main() -> None:
    rng = np.random.default_rng(0)
    # clustered corpus (ANN needs real structure; uniform noise defeats any index)
    centers = rng.standard_normal((64, 96)).astype(np.float32) * 3.0
    vecs = centers[rng.integers(0, 64, 20_000)] + rng.standard_normal((20_000, 96)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    # 1. spilled IVF: boundary rows replicated into their 2nd-best cluster's slack
    idx = build_ivf(vecs, np.arange(len(vecs)), n_clusters=64, spill="auto")
    n_copies = int((np.asarray(idx.ids) >= 0).sum()) - len(vecs)
    print(f"built spilled IVF: {idx.n_clusters} clusters, {n_copies} boundary copies")

    q = vecs[:8] + 0.05 * rng.standard_normal((8, 96)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    vals, fids = ivf_search_topk(q, idx, k=5, nprobe=4)
    print("self-matches in top-1:", int((np.asarray(fids)[:, 0] == np.arange(8)).sum()), "/ 8")

    # 2. concurrent searches through the orchestrator's read phase
    import tempfile

    from wax_tpu.embed.hash_embedder import HashEmbedder
    from wax_tpu.orchestrator import MemoryOrchestrator, OrchestratorConfig
    from wax_tpu.types import SearchRequest

    with tempfile.TemporaryDirectory() as td:
        orch = MemoryOrchestrator(os.path.join(td, "serve.wxs"), HashEmbedder(64), OrchestratorConfig())
        for i in range(50):
            orch.remember(f"serving doc {i} about topic {i % 5}")
        orch.flush()

        hits_per_thread: list[int] = []
        lock = threading.Lock()

        def searcher(t):
            n = 0
            for i in range(10):
                n += len(orch.search(SearchRequest(query=f"topic {i % 5} doc")).hits)
            with lock:
                hits_per_thread.append(n)

        threads = [threading.Thread(target=searcher, args=(t,)) for t in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        print("concurrent searchers done:", hits_per_thread)
        orch.close()


if __name__ == "__main__":
    main()
