"""A/B the headline extraction schemes at 10K x 384 (verdict: headline is
extraction-bound at 92 us; target < 70 us or a measured floor write-up).

Configs, all slope-measured (bench.py robust_slope) in one process:
  matmul   — scan + bias + single per-tile max (no top-k): the compute/launch floor
  exact    — _pallas_scan_topk (k-pass argmax/evict loop, bit-exact)
  packed   — _packed_scan_topk (k-pass packed-key loop; the current auto pick)
  sel      — _packed_sel_scan_topk (single accumulate-then-select pass, top-L/lane)
plus recall@10 vs the exact oracle for the approximate variants.

    python scripts/probe_extraction.py [N] [D] [B] [K]
"""
from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wax_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _make_timer, _unit_data, robust_slope
from wax_tpu.ops.flat_scan import (
    _KPAD,
    _TB,
    _packed_scan_topk,
    _packed_sel_scan_topk,
    _pallas_scan_topk,
    _pick_tn,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_240
D = int(sys.argv[2]) if len(sys.argv) > 2 else 384
B = int(sys.argv[3]) if len(sys.argv) > 3 else 256
K = int(sys.argv[4]) if len(sys.argv) > 4 else 10


def _matmul_floor_kernel(q_ref, db_ref, bias_ref, out_ref):
    scores = jax.lax.dot_general(
        q_ref[:], db_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + bias_ref[0, :][None, :]
    tb, tn = scores.shape
    # one cheap reduce so the matmul cannot be DCE'd; no extraction loop
    out_ref[:] = jnp.broadcast_to(jnp.max(scores, axis=1, keepdims=True), (tb, _KPAD))


@functools.partial(jax.jit, static_argnames=("tb", "tn"))
def _matmul_floor(queries, emb, bias, tb: int, tn: int):
    b, d = queries.shape
    n = emb.shape[0]
    nb, nn = pl.cdiv(b, tb), pl.cdiv(n, tn)
    out = pl.pallas_call(
        _matmul_floor_kernel,
        grid=(nb, nn),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, _KPAD), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * tb, nn * _KPAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d, bytes_accessed=(b * d + n * d) * 4, transcendentals=0
        ),
    )(queries, emb, bias)
    return jnp.max(out[:b], axis=1, keepdims=True)


def main() -> None:
    emb, q0 = _unit_data(N, D, B)
    bias = jnp.zeros((1, N), jnp.float32)
    tb, tn = min(B, _TB), _pick_tn(N)

    def chained_of(call):
        @jax.jit
        def chained(q, iters, emb, bias):
            def body(i, carry):
                q, acc = carry
                v = call(q, emb, bias)
                return q + v[:, :1] * 1e-9, acc + v[0, 0]

            return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

        return chained

    variants = {
        "matmul": chained_of(lambda q, e, b_: _matmul_floor(q, e, b_, tb, tn)),
        "exact": chained_of(lambda q, e, b_: _pallas_scan_topk(q, e, b_, K, tb, tn, False)[0]),
        "packed": chained_of(lambda q, e, b_: _packed_scan_topk(q, e, b_, K, tb, tn, False)[0]),
        "sel": chained_of(lambda q, e, b_: _packed_sel_scan_topk(q, e, b_, K, tb, tn, False)[0]),
    }

    @jax.jit
    def recall_check(q, emb, bias):
        scores = q @ emb.T + bias
        _, oracle = jax.lax.top_k(scores, K)
        _, got_p = _packed_scan_topk(q, emb, bias, K, tb, tn, False)
        _, got_s = _packed_sel_scan_topk(q, emb, bias, K, tb, tn, False)
        hit = lambda got: (oracle[:, :, None] == got[:, None, :]).any(-1).sum() / (q.shape[0] * K)
        return hit(got_p), hit(got_s)

    rp, rs = recall_check(q0, emb, bias)
    print(f"recall@{K} vs oracle: packed={float(rp):.4f} sel={float(rs):.4f}", flush=True)

    scale = max(1, N // 10_240)  # keep wall-clock and the episode cap shape-appropriate
    iters = (max(20, 500 // scale), max(100, 2500 // scale), max(180, 4500 // scale))
    for name, fn in variants.items():
        float(fn(q0, 1, emb, bias))
        ms, info = robust_slope(
            _make_timer(fn, q0, emb, bias), *iters,
            floor_ms=0.01, cap_ms=0.5 * scale * max(1, K // 10),
        )
        print(f"{name}: {ms*1e3:.1f} us/batch attempts={info['attempts']}", flush=True)


if __name__ == "__main__":
    main()
