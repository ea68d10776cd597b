"""Round-2 headline experiments at 10K x 384, B=256, k=10: packed-key extraction
kernel + bf16 matmul vs the round-1 fused kernel vs pure-XLA blockmax.

Slope timing per CLAUDE.md: iterations chained in one fori_loop, time difference
between two iteration counts, sync via float() value fetch.
"""
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wax_tpu.ops.flat_scan import _KPAD, _scan_topk_kernel
from wax_tpu.ops.topk import NEG_INF

import os
B, D, K = 256, 384, 10
N = int(os.environ.get("PERF_N", 10_240))

_IMIN = -(2**31)  # plain int so kernels do not capture a traced constant


def _packed_kernel(q_ref, db_ref, bias_ref, out_ref, *, tn: int, k: int, mm_dtype):
    """Fused scan + top-k with packed (truncated-score | lane-complement) i32 keys.

    Score bits: f32 -> signed-sortable i32 (monotone), low 11 bits replaced by
    (tn-1 - col) so keys are unique per lane, ties break toward the lowest column,
    and one max-reduce + compare + select per extraction pass does everything.
    """
    scores = jax.lax.dot_general(
        q_ref[:].astype(mm_dtype), db_ref[:].astype(mm_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    scores = scores + bias_ref[0, :][None, :]
    tb = scores.shape[0]
    b = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(b >= 0, b, jnp.bitwise_xor(jnp.bitwise_not(b), jnp.asarray(_IMIN, jnp.int32)))
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    packed = jnp.bitwise_or(jnp.bitwise_and(key, jnp.int32(~0x7FF)), (tn - 1) - cols)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tb, _KPAD), 1)

    def body(t, carry):
        p, out = carry
        m = jnp.max(p, axis=1, keepdims=True)
        out = jnp.where(lanes == t, m, out)
        p = jnp.where(p == m, _IMIN, p)
        return p, out

    _, out = jax.lax.fori_loop(0, k, body, (packed, jnp.full((tb, _KPAD), _IMIN, jnp.int32)))
    out_ref[:] = out


def packed_scan(q, emb, bias, *, tn=2048, k=K, mm_dtype=jnp.float32):
    b, d = q.shape
    n = emb.shape[0]
    nn = n // tn
    kernel = functools.partial(_packed_kernel, tn=tn, k=k, mm_dtype=mm_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(1, nn),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, _KPAD), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nn * _KPAD), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d, bytes_accessed=(b * d + n * d) * 4, transcendentals=0
        ),
    )(q, emb, bias)
    p = out.reshape(b, nn, _KPAD)[:, :, :k]
    local = (tn - 1) - jnp.bitwise_and(p, 0x7FF)
    gcol = jnp.arange(nn, dtype=jnp.int32)[None, :, None] * tn + local
    keym = jnp.bitwise_and(p, jnp.int32(~0x7FF))
    sbits = jnp.where(keym >= 0, keym, jnp.bitwise_not(jnp.bitwise_xor(keym, jnp.asarray(_IMIN, jnp.int32))))
    svals = jax.lax.bitcast_convert_type(sbits, jnp.float32)
    # stable top_k over (tile-asc, rank) layout keeps lowest-global-index ties
    mv, pos = jax.lax.top_k(svals.reshape(b, nn * k), k)
    mi = jnp.take_along_axis(gcol.reshape(b, nn * k), pos, axis=-1)
    mi = jnp.where(mv <= NEG_INF * 0.5, -1, mi)
    return mv, mi


def r1_scan(q, emb, bias, *, tn=2048, k=K):
    b, d = q.shape
    n = emb.shape[0]
    nn = n // tn
    kernel = functools.partial(_scan_topk_kernel, tn=tn, k=k)
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(1, nn),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, _KPAD), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, _KPAD), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nn * _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((b, nn * _KPAD), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d, bytes_accessed=(b * d + n * d) * 4, transcendentals=0
        ),
    )(q, emb, bias)
    v = vals.reshape(b, nn, _KPAD)[:, :, :k].reshape(b, nn * k)
    i = idxs.reshape(b, nn, _KPAD)[:, :, :k].reshape(b, nn * k)
    mv, pos = jax.lax.top_k(v, k)
    return mv, jnp.take_along_axis(i, pos, axis=-1)


def blockmax(q, emb, bias, *, k=K, mm_dtype=jnp.float32):
    from wax_tpu.ops.topk import blockmax_topk

    s = jax.lax.dot_general(
        q.astype(mm_dtype), emb.astype(mm_dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias
    return blockmax_topk(s, k)


def slope(fn, q0, emb, bias, lo=int(os.environ.get("PERF_LO", 500)), hi=int(os.environ.get("PERF_HI", 4000))):
    @jax.jit
    def chained(q, iters, emb, bias):
        def body(i, carry):
            q, acc = carry
            v, _ = fn(q, emb, bias)
            return q + (v[:, :1] * 1e-9).astype(q.dtype), acc + v[0, 0]

        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

    float(chained(q0, 1, emb, bias))
    rep = [0]

    def t(iters):
        best = float("inf")
        for _ in range(2):
            rep[0] += 1
            qq = q0 * (1.0 + 1e-6 * rep[0])
            t0 = time.perf_counter()
            float(chained(qq, iters, emb, bias))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(hi) - t(lo)) / (hi - lo) * 1e3


def main():
    @jax.jit
    def make_data():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        emb = jax.random.normal(k1, (N, D), jnp.float32)
        emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
        q0 = jax.random.normal(k2, (B, D), jnp.float32)
        return emb, q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)

    emb, q0 = jax.block_until_ready(make_data())
    bias = jnp.zeros((1, N), jnp.float32)
    emb_bf = emb.astype(jnp.bfloat16)

    # correctness sniff vs oracle before timing
    s = (q0 @ emb.T) + bias
    ov, oi = jax.lax.top_k(s, K)
    for name, fn in [
        ("packed-f32", functools.partial(packed_scan, mm_dtype=jnp.float32)),
        ("packed-bf16mm", functools.partial(packed_scan, mm_dtype=jnp.bfloat16)),
    ]:
        mv, mi = fn(q0, emb, bias)
        overlap = np.mean([
            len(set(np.asarray(mi)[r].tolist()) & set(np.asarray(oi)[r].tolist())) / K
            for r in range(B)
        ])
        print(f"# {name}: top-{K} overlap vs oracle = {overlap:.4f}")

    variants = [
        ("r1-fused-f32", r1_scan, emb),
        ("packed-f32", functools.partial(packed_scan, mm_dtype=jnp.float32), emb),
        ("packed-bf16mm", functools.partial(packed_scan, mm_dtype=jnp.bfloat16), emb),
        ("packed-bf16db", functools.partial(packed_scan, mm_dtype=jnp.bfloat16), emb_bf),
        ("blockmax-f32", blockmax, emb),
        ("blockmax-bf16mm", functools.partial(blockmax, mm_dtype=jnp.bfloat16), emb),
    ]
    for name, fn, e in variants:
        try:
            ms = slope(fn, q0, e, bias)
            print(f"{name}: {ms*1000:.1f} us/batch")
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:200]}")


if __name__ == "__main__":
    main()


def blockmax_bf16s(q, emb, bias, *, k=K):
    """blockmax with bf16 score materialization: halves the [B, N] HBM round-trip."""
    from wax_tpu.ops.topk import blockmax_topk

    s = jax.lax.dot_general(
        q.astype(jnp.bfloat16), emb.astype(jnp.bfloat16), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = (s + bias).astype(jnp.bfloat16)
    v, i = blockmax_topk(s, k)
    return v.astype(jnp.float32), i
