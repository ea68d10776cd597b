"""Micro-probe: which op in the candidate-BM25 pipeline is slow on TPU?

Times individual ops at [256, 65536] f32/i32: gather from a 20M table, cumsum,
cummax, lax.top_k(20), lax.sort (1 and 3 operands). Usage:
    python scripts/probe_ops_micro.py [op ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wax_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from bench import _make_timer, robust_slope

B, W = 256, 65536
TBL = 20_000_000


def chained(op):
    @jax.jit
    def f(q0, iters, x, ix, tbl):
        def body(i, carry):
            q, acc = carry
            xx = x + q[0, 0]
            if op == "gather":
                r = jnp.take(tbl, ix + jnp.int32(acc) % 7, mode="clip")
                out = jnp.sum(r.astype(jnp.float32))
            elif op == "cumsum":
                out = jnp.cumsum(xx, axis=1)[:, -1].sum()
            elif op == "cummax":
                out = jax.lax.cummax(xx, axis=1)[:, -1].sum()
            elif op == "topk":
                v, _ = jax.lax.top_k(xx, 20)
                out = v.sum()
            elif op == "argsort1":
                o = jnp.argsort(xx, axis=1)
                out = o[:, :3].sum().astype(jnp.float32)
            elif op == "sort1":
                (s,) = jax.lax.sort((xx,), dimension=1, num_keys=1)
                out = s[:, :3].sum()
            elif op == "sort3":
                s, a, bb = jax.lax.sort((xx, xx * 2, xx * 3), dimension=1, num_keys=1)
                out = s[:, :3].sum() + a[:, 0].sum() + bb[:, 0].sum()
            elif op == "where":
                out = jnp.where(xx > 0.5, xx, -xx).sum()
            return q + out * 1e-12, acc + out
        return jax.lax.fori_loop(0, iters, body, (q0, jnp.float32(0)))[1]
    return f


def main():
    which = sys.argv[1:] or ["where", "gather", "cumsum", "cummax", "topk", "sort1", "sort3"]
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (B, W), jnp.float32)
    ix = jax.random.randint(jax.random.PRNGKey(1), (B, W), 0, TBL - 8, jnp.int32)
    tbl = jax.random.randint(jax.random.PRNGKey(2), (TBL,), 0, 1 << 20, jnp.int32)
    q0 = jnp.zeros((B, 1), jnp.float32)
    for op in which:
        f = chained(op)
        float(f(q0, 1, x, ix, tbl))
        try:
            ms, info = robust_slope(_make_timer(f, q0, x, ix, tbl), 3, 13, 23, floor_ms=0.005, cap_ms=2000.0)
            print(f"{op:9s}: {ms:9.3f} ms  attempts={info['attempts']}", flush=True)
        except Exception as e:
            print(f"{op:9s}: FAIL {e}", flush=True)


if __name__ == "__main__" and (len(sys.argv) < 2 or sys.argv[1] != "part2"):
    main()

# -- appended: scatter + contiguous-gather probes (see round-4 candidate-BM25 work) --
import functools as _ft

def chained2(op, n_plane=1_048_576, n_upd=65536):
    @jax.jit
    def f(q0, iters, upd_rows, upd_vals, off):
        B = upd_rows.shape[0]
        def body(i, carry):
            q, acc = carry
            rows = (upd_rows + jnp.int32(acc) % 13) % n_plane
            if op == "scatter":
                plane = jnp.zeros((B, n_plane), jnp.float32)
                plane = plane.at[jnp.arange(B)[:, None], rows[:, :n_upd]].add(
                    upd_vals[:, :n_upd], mode="drop")
                v, _ = jax.lax.top_k(plane, 20)
                out = v.sum()
            elif op == "slicegather":
                # off[b, q] contiguous slices of width W from a big table
                j = jnp.arange(4096, dtype=jnp.int32)[None, None, :]
                pos = (off[..., None] + j) % (16 * n_plane)
                r = jnp.take(upd_vals.reshape(-1), pos % upd_vals.size, mode="clip")
                out = r.sum()
            return q + out * 1e-12, acc + out
        return jax.lax.fori_loop(0, iters, body, (q0, jnp.float32(0)))[1]
    return f


def main2():
    which = sys.argv[2:] if len(sys.argv) > 2 else ["1M-64K", "1M-16K", "64K-64K", "8K-64K", "slicegather"]
    key = jax.random.PRNGKey(0)
    B = 256
    upd_rows = jax.random.randint(key, (B, 65536), 0, 1 << 20, jnp.int32)
    upd_vals = jax.random.uniform(jax.random.PRNGKey(1), (B, 65536), jnp.float32)
    off = jax.random.randint(jax.random.PRNGKey(2), (B, 16), 0, 1 << 22, jnp.int32)
    q0 = jnp.zeros((B, 1), jnp.float32)
    cfgs = {
        "1M-64K": ("scatter", 1_048_576, 65536),
        "1M-16K": ("scatter", 1_048_576, 16384),
        "64K-64K": ("scatter", 65536, 65536),
        "8K-64K": ("scatter", 8192, 65536),
        "slicegather": ("slicegather", 1_048_576, 65536),
    }
    for name in which:
        op, npl, nupd = cfgs[name]
        f = chained2(op, npl, nupd)
        float(f(q0, 1, upd_rows, upd_vals, off))
        try:
            ms, info = robust_slope(_make_timer(f, q0, upd_rows, upd_vals, off), 3, 13, 23, floor_ms=0.02, cap_ms=3000.0)
            print(f"{name:12s}: {ms:9.3f} ms  attempts={info['attempts']}", flush=True)
        except Exception as e:
            print(f"{name:12s}: FAIL {e}", flush=True)

if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "part2":
    main2()
