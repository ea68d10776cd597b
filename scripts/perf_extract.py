"""Extraction-cost study v2 (value-fetch sync): K sweep + dtype, one process."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.0e38
B, D, N, TN = 256, 384, 10240, 2048


@jax.jit
def make_data():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    emb = jax.random.normal(k1, (N, D), jnp.float32)
    emb = emb / jnp.linalg.norm(emb, axis=1, keepdims=True)
    q0 = jax.random.normal(k2, (B, D), jnp.float32)
    return emb, q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)


emb32, q32 = jax.block_until_ready(make_data())
bias = jnp.zeros((1, N), jnp.float32)


def make_kernel(K):
    def kernel(q_ref, db_ref, b_ref, v_ref, i_ref):
        j = pl.program_id(1)
        s = jax.lax.dot_general(q_ref[:], db_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s + b_ref[:]
        tb = s.shape[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (tb, 128), 1)

        def body(t, carry):
            s, vals, idxs = carry
            m = jnp.max(s, axis=1, keepdims=True)
            am = jnp.min(jnp.where(s == m, cols, TN), axis=1, keepdims=True)
            sel = lanes == t
            vals = jnp.where(sel, m, vals)
            idxs = jnp.where(sel, am + j * TN, idxs)
            s = jnp.where(cols == am, NEG_INF, s)
            return s, vals, idxs

        init = (s, jnp.full((tb, 128), NEG_INF, jnp.float32), jnp.full((tb, 128), -1, jnp.int32))
        _, vals, idxs = jax.lax.fori_loop(0, K, body, init)
        v_ref[:] = vals
        i_ref[:] = idxs

    return kernel


def build(K, dtype):
    nn = N // TN
    kern = make_kernel(K)

    def scan(q, emb, bias):
        vals, idxs = pl.pallas_call(
            kern,
            grid=(1, nn),
            in_specs=[
                pl.BlockSpec((B, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TN, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TN), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((B, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, nn * 128), jnp.float32),
                jax.ShapeDtypeStruct((B, nn * 128), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(flops=2 * B * N * D, bytes_accessed=(B * D + N * D) * 4, transcendentals=0),
        )(q, emb, bias)
        mv, _ = jax.lax.top_k(vals.reshape(B, nn, 128)[:, :, :K].reshape(B, -1), K)
        return mv

    @jax.jit
    def chained(q, iters, emb, bias):
        def body(i, carry):
            q, acc = carry
            v = scan(q, emb, bias)
            return q + (v[:, :1] * 1e-9).astype(q.dtype), acc + v[0, 0]

        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

    return chained


def measure(name, chained, q0, emb):
    float(chained(q0, 1, emb, bias))
    rep = [0]

    def t(iters):
        rep[0] += 1
        qq = q0 * (1.0 + 1e-6 * rep[0])
        t0 = time.perf_counter()
        float(chained(qq, iters, emb, bias))
        return time.perf_counter() - t0

    lo, hi = t(500), t(4000)
    print(f"{name}: {((hi - lo) / 3500) * 1e6:.1f} us/batch  (raw {lo*1e3:.0f}/{hi*1e3:.0f} ms)", flush=True)


for K in (1, 5, 10):
    measure(f"f32 K={K}", build(K, jnp.float32), q32, emb32)
emb16, q16 = emb32.astype(jnp.bfloat16), q32.astype(jnp.bfloat16)
measure("bf16 K=10", build(10, jnp.bfloat16), q16, emb16)
