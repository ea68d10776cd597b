"""Fused hybrid (dense + BM25 + RRF, one XLA program) at scale on ONE chip.

Thin wrapper over `bench.bench_hybrid` (the driver's hybrid config) so scale /
budget / lex-backend sweeps reuse the exact slope-timed harness — including the
loop-variant term ids that defeat XLA's BM25-lane hoisting (the round-3 numbers
were missing the whole lex lane because of that hoist; see docs/benchmarks.md).

The snapshot carries the full candidate-lane arrays (wnorm, reversed postings,
forward index), so `lex_backend="auto"` resolves to the production Pallas
candidate pipeline on TPU. Pass an explicit backend as the third argument to
measure an alternative lane — e.g. `scatter` for the pre-round-4 [B, N] score
plane (measured 1112.7 ms/batch at 1M vs 12.6 ms for the candidate lane: 88x).

    python scripts/hybrid_scale.py [N] [BUDGET] [BACKEND]

BUDGET defaults to 3072 — the bench.py --all config that produced the documented
12.65 ms hybrid_1m_x384 number.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wax_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

_BACKENDS = ("auto", "scatter", "candidates", "candidates_pallas")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 3072
BACKEND = sys.argv[3] if len(sys.argv) > 3 else "auto"
if BACKEND not in _BACKENDS:
    raise SystemExit(f"unknown BACKEND {BACKEND!r}; expected one of {_BACKENDS}")


def main() -> None:
    from bench import bench_hybrid

    big = N >= 1_000_000
    ms, info = bench_hybrid(
        n=N,
        n_terms=16384 if big else 8192,
        budget=BUDGET,
        # bf16 dense storage is the production default at >=1M rows
        # (device_dtype="auto", search/vector_engines.py); f32 MXU accumulation
        dtype="bfloat16" if big else "float32",
        iters=(3, 13, 23) if big else (5, 45, 85),
        floor_ms=1.0 if big else 0.3,
        # the scatter lane runs ~1.1 s/batch at 1M — keep the episode cap above it
        cap_ms=8000.0 if BACKEND == "scatter" else 4000.0,
        lex_backend=BACKEND,
    )
    print(
        f"fused hybrid N={N} budget={BUDGET} backend={BACKEND}: "
        f"{ms:.3f} ms/256-query batch ({256/ms*1e3:,.0f} q/s/chip)  "
        f"attempts={info['attempts']} dispersion={info.get('dispersion')}"
    )


if __name__ == "__main__":
    main()
