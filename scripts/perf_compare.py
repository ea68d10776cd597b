"""Back-to-back slope comparison: XLA scan+top_k vs fused Pallas kernel, f32 vs bf16,
N=10K and N=100K. One process, sequential, slope timing (cancels launch overhead)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wax_tpu.ops.flat_scan import _KPAD, _scan_topk_kernel

B, D, K, TN = 256, 384, 10, 512
rng = np.random.default_rng(0)


def xla_body(q, emb):
    s = jax.lax.dot_general(q, emb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    v, _ = jax.lax.top_k(s, K)
    return v


def pallas_body(q, emb, bias):
    n = emb.shape[0]
    nn = n // TN
    kernel = functools.partial(_scan_topk_kernel, tn=TN, k=K)
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(1, nn),
        in_specs=[
            pl.BlockSpec((B, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, _KPAD), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, _KPAD), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, nn * _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((B, nn * _KPAD), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(flops=2 * B * n * D, bytes_accessed=(B * D + n * D) * 4, transcendentals=0),
    )(q, emb, bias)
    v = vals.reshape(B, nn, _KPAD)[:, :, :K].reshape(B, nn * K)
    mv, _ = jax.lax.top_k(v, K)
    return mv


def slope(fn_loop, lo, hi):
    fn_loop(lo)
    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn_loop(n))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(hi) - t(lo)) / (hi - lo)


for N in [10240, 102400]:
    emb32 = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
    bias = jnp.zeros((1, N), jnp.float32)
    q32 = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    lo, hi = (50, 300) if N <= 10240 else (10, 60)
    for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        emb, q0 = emb32.astype(dt), q32.astype(dt)

        @jax.jit
        def xla_loop(n, emb=emb, q0=q0):
            def body(i, carry):
                q, acc = carry
                v = xla_body(q, emb)
                return q + (v[:, :1] * 1e-9).astype(q.dtype), acc + v[0, 0]
            return jax.lax.fori_loop(0, n, body, (q0, jnp.float32(0)))[1]

        @jax.jit
        def pallas_loop(n, emb=emb, q0=q0, bias=bias):
            def body(i, carry):
                q, acc = carry
                v = pallas_body(q, emb, bias)
                return q + (v[:, :1] * 1e-9).astype(q.dtype), acc + v[0, 0]
            return jax.lax.fori_loop(0, n, body, (q0, jnp.float32(0)))[1]

        sx = slope(xla_loop, lo, hi)
        sp = slope(pallas_loop, lo, hi)
        print(
            f"N={N:>7} {dt_name}: xla={sx*1e6:9.1f} us  pallas={sp*1e6:9.1f} us  "
            f"(pallas {2*B*N*D/sp/1e12:5.1f} TF/s)",
            flush=True,
        )
