"""Seed-set experiment for the TPU beam: recall@10 vs entry-seed count/policy
on the SAME graph (source of the docs/benchmarks.md seed-count sweep).

Configurations:
  level1(prod)  — graph.entries from the production snapshot() default (round 4:
                  full level-1 net capped at 8192, stride level-0 fill)
  lvl1+fillC    — full level-1 net + RANDOM level-0 fill to C seeds, for each C
                  in WAX_SEED_CAPS (default "4096,8192")

    python scripts/probe_hnsw_seeds.py [N] [DATASET] [EF...]
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("WAX_SEEDS_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from scripts.hnsw_parity import ground_truth, make_dataset, recall
from wax_tpu.index.graph_cpp import best_hnsw_builder
from wax_tpu.ops.beam_search import hnsw_search

N = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
DATASET = sys.argv[2] if len(sys.argv) > 2 else "loose"
EFS = [int(x) for x in sys.argv[3:]] or [128, 256]
B, K = 128, 10


def with_seeds(graph, seeds: np.ndarray):
    pad = (-len(seeds)) % 8
    if pad:
        seeds = np.concatenate([seeds, np.repeat(seeds[-1:], pad)])
    return dataclasses.replace(graph, entries=jnp.asarray(seeds.astype(np.int32)))


def main() -> None:
    rng = np.random.default_rng(0)
    vecs = make_dataset(DATASET, N, rng)
    queries = make_dataset(DATASET, B, np.random.default_rng(1))
    t0 = time.time()
    builder = best_hnsw_builder(384, m=16, ef_construction=100)
    builder.add_batch(np.arange(N), vecs)
    graph = builder.snapshot()
    print(f"build {N}: {time.time()-t0:.0f}s; entries={graph.entries.shape[0]}", flush=True)
    gt = ground_truth(vecs, queries)
    q = jnp.asarray(queries)

    levels = (
        builder.state_arrays()["levels"]
        if hasattr(builder, "state_arrays")
        else np.asarray(builder._levels)
    )
    lvl1 = np.nonzero(levels[:N] >= 1)[0]
    rng2 = np.random.default_rng(7)
    rand_fill = rng2.permutation(N)

    def fill(base, cap):
        extra = rand_fill[~np.isin(rand_fill, base)][: max(0, cap - len(base))]
        return np.concatenate([base[:cap], extra])

    caps = [int(x) for x in os.environ.get("WAX_SEED_CAPS", "4096,8192").split(",")]
    configs = {"level1(prod)": np.asarray(graph.entries)}
    for c in caps:
        configs[f"lvl1+fill{c}"] = fill(lvl1, c)
    for name, seeds in configs.items():
        g = with_seeds(graph, np.asarray(seeds))
        row = []
        for ef in EFS:
            vals, fids = hnsw_search(q, g, k=K, ef=ef)
            row.append(f"ef{ef}={recall(np.asarray(fids), gt):.3f}")
        print(f"{name:18s} ({len(seeds):5d} seeds): " + " ".join(row), flush=True)


if __name__ == "__main__":
    main()
