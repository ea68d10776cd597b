"""Kernel extraction-cost study: K sweep + chunked-extraction prototype, one process,
raw times printed so linearity can be verified by eye."""
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


emb, q0 = jax.block_until_ready(make_data())
bias = jnp.zeros((1, N), jnp.float32)


def current_kernel(K):
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


def chunked_kernel(K):
    """Chunked extraction: maintain per-128-lane-chunk maxima; per step only the
    winning chunk is re-scanned. Full-tile passes per step: 1 select + 1 mask."""
    C = TN // 128

    def kernel(q_ref, db_ref, b_ref, v_ref, i_ref):
        j = pl.program_id(1)
        s = jax.lax.dot_general(q_ref[:], db_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s + b_ref[:]
        tb = s.shape[0]
        s3 = s.reshape(tb, C, 128)
        cm = jnp.max(s3, axis=2)  # [tb, C]
        chunk_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, C), 1)
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (tb, 128), 1)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (tb, 128), 1)

        def body(t, carry):
            s3, cm, vals, idxs = carry
            m = jnp.max(cm, axis=1, keepdims=True)  # [tb, 1]
            amc = jnp.min(jnp.where(cm == m, chunk_ids, C), axis=1, keepdims=True)  # [tb,1]
            # select winning chunk per row: [tb, 128]
            onehot = (chunk_ids == amc)[..., None]  # [tb, C, 1]
            srow = jnp.sum(jnp.where(onehot, s3, NEG_INF), axis=1, where=onehot, initial=NEG_INF)
            aml = jnp.min(jnp.where(srow == m, lane128, 128), axis=1, keepdims=True)  # [tb,1]
            gcol = amc * 128 + aml
            sel = lanes == t
            vals = jnp.where(sel, m, vals)
            idxs = jnp.where(sel, gcol + j * TN, idxs)
            # mask extracted element and refresh that chunk's max
            srow2 = jnp.where(lane128 == aml, NEG_INF, srow)
            s3 = jnp.where(onehot & (lane128 == aml)[:, None, :], NEG_INF, s3)
            new_cmax = jnp.max(srow2, axis=1, keepdims=True)
            cm = jnp.where(chunk_ids == amc, new_cmax, cm)
            return s3, cm, vals, idxs

        init = (
            s3,
            cm,
            jnp.full((tb, 128), NEG_INF, jnp.float32),
            jnp.full((tb, 128), -1, jnp.int32),
        )
        _, _, vals, idxs = jax.lax.fori_loop(0, K, body, init)
        v_ref[:] = vals
        i_ref[:] = idxs

    return kernel


def build(kern_factory, K):
    nn = N // TN
    kern = kern_factory(K)

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
        mv, mi = jax.lax.top_k(vals.reshape(B, nn, 128)[:, :, :K].reshape(B, -1), K)
        return mv

    @jax.jit
    def chained(q, iters, emb, bias):
        def body(i, carry):
            q, acc = carry
            v = scan(q, emb, bias)
            return q + v[:, :1] * 1e-9, acc + v[0, 0]

        return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

    return chained, scan


def measure(name, chained):
    times = {}
    rep = [0]

    def t(iters):
        rep[0] += 1
        qq = q0 * (1.0 + 1e-6 * rep[0])
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            chained(qq, iters, emb, bias).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    chained(q0, 1, emb, bias).block_until_ready()
    for iters in (100, 400, 800):
        times[iters] = t(iters)
    slope = (times[800] - times[100]) / 700
    print(
        f"{name}: raw {times[100]*1e3:.1f}/{times[400]*1e3:.1f}/{times[800]*1e3:.1f} ms "
        f"-> {slope*1e6:.1f} us/batch",
        flush=True,
    )


# correctness of chunked vs current (CPU-free: compare on device)
ch_cur, scan_cur = build(current_kernel, 10)
ch_chk, scan_chk = build(chunked_kernel, 10)
v1 = jax.jit(lambda q: scan_cur(q, emb, bias))(q0)
v2 = jax.jit(lambda q: scan_chk(q, emb, bias))(q0)
print("chunked matches current:", bool(jnp.allclose(v1, v2, atol=1e-5)), flush=True)

for K in (1, 10, 32):
    c, _ = build(current_kernel, K)
    measure(f"current K={K}", c)
for K in (10, 32):
    c, _ = build(chunked_kernel, K)
    measure(f"chunked K={K}", c)
