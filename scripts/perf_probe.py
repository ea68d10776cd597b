"""Perf probe v2: slope-based device timing (cancels the constant launch/tunnel
round-trip by differencing two iteration counts)."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(fn, lo=200, hi=2000):
    """Device time per iteration via (T(hi) - T(lo)) / (hi - lo)."""
    fn(lo)  # warm compile both... same executable, n is dynamic
    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(n))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(hi) - t(lo)) / (hi - lo)


rng = np.random.default_rng(0)
for N in [10240, 102400, 1048576]:
    for dt_name, dt in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
        emb = jnp.asarray(rng.standard_normal((N, 384)).astype(np.float32)).astype(dt)
        q0 = jnp.asarray(rng.standard_normal((256, 384)).astype(np.float32)).astype(dt)

        @jax.jit
        def mm_topk_loop(n, emb=emb, q0=q0):
            def body(i, carry):
                q, acc = carry
                s = jax.lax.dot_general(
                    q, emb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                v, _ = jax.lax.top_k(s, 10)
                q = q + (v[:, :1] * 1e-9).astype(q.dtype)
                return q, acc + v[0, 0]
            return jax.lax.fori_loop(0, n, body, (q0, jnp.float32(0)))[1]

        sec = slope_time(mm_topk_loop, 100, 1000 if N <= 102400 else 300)
        tf = 2 * 256 * N * 384 / sec / 1e12
        gbs = N * 384 * (2 if dt_name == "bf16" else 4) / sec / 1e9
        print(
            f"N={N:>8} {dt_name}: {sec*1e6:8.1f} us/scan+topk  {tf:6.1f} TF/s  {gbs:6.0f} GB/s",
            flush=True,
        )
