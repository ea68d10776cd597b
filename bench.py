"""Headline benchmark: batched dense top-k query latency at 10K x 384-dim.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference's warm Metal GPU vector search at 10K x 384 is
0.84 ms per query (M1 Pro). We measure the p50 latency of a *batched* (256-query)
top-10 scan on one TPU chip, timing K chained iterations inside a single XLA program
(each iteration's query depends on the previous result, so iterations serialize on
device and dispatch overhead is excluded — the same warm-kernel regime as the
reference's warm-GPU number). vs_baseline = baseline_ms / value_ms (speedup, >1 better).

Run `python bench.py --all` for the full config table (per-config JSON lines on
stderr-independent stdout lines prefixed with '#').
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

BASELINE_MS = 0.84  # reference warm Metal vector search @10K x 384 (README.md:94)


def _bench_flat_scan(n: int, d: int, b: int, k: int, iters: int, backend: str) -> float:
    """Median per-batch latency (ms) of chained scans inside one jitted program."""
    import jax
    import jax.numpy as jnp

    from wax_tpu.index.dense import DenseIndexBuilder
    from wax_tpu.ops.flat_scan import _index_bias, normalize_rows

    rng = np.random.default_rng(0)
    builder = DenseIndexBuilder(dim=d)
    ids = np.arange(n)
    step = 100_000
    for s in range(0, n, step):
        cnt = min(step, n - s)
        builder.add_batch(ids[s : s + cnt], rng.standard_normal((cnt, d)).astype(np.float32))
    idx = builder.snapshot()
    emb = idx.emb
    bias = _index_bias(idx)[0]
    q0 = normalize_rows(jnp.asarray(rng.standard_normal((b, d)).astype(np.float32)))

    @jax.jit
    def chained(q, iters_arr):
        def body(i, carry):
            q, acc = carry
            scores = jax.lax.dot_general(
                q.astype(emb.dtype), emb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias[None, :]
            vals, _ = jax.lax.top_k(scores, k)
            # data dependency so iterations serialize
            q = q + 1e-7 * jnp.mean(vals)
            return q, acc + jnp.sum(vals)

        return jax.lax.fori_loop(0, iters_arr, body, (q, jnp.float32(0)))

    # warm-up compile + run
    chained(q0, 1)[1].block_until_ready()
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        chained(q0, iters)[1].block_until_ready()
        samples.append((time.perf_counter() - t0) / iters * 1e3)
    return float(np.median(samples))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="run the full config table")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    headline_ms = _bench_flat_scan(n=10_240, d=384, b=256, k=10, iters=args.iters, backend="xla")

    if args.all:
        for n, d, b in [(10_240, 384, 256), (102_400, 384, 256), (1_048_576, 768, 256)]:
            try:
                ms = _bench_flat_scan(n=n, d=d, b=b, k=10, iters=max(5, args.iters // 10), backend="xla")
                qps = b / (ms / 1e3)
                print(f"# flat_scan n={n} d={d} b={b}: {ms:.4f} ms/batch  ({qps:,.0f} q/s/chip)")
            except Exception as e:  # noqa: BLE001
                print(f"# flat_scan n={n} d={d} b={b}: FAILED {e}")

    print(
        json.dumps(
            {
                "metric": "dense_topk_p50_latency_batch256_10k_x384",
                "value": round(headline_ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / headline_ms, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
