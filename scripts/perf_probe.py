"""Perf probe v3: calibration curve T(n_iters) to understand the axon tunnel's timing
behavior before trusting any latency number."""
import time

import jax
import jax.numpy as jnp
import numpy as np

rng = np.random.default_rng(0)
N = 10240
emb = jnp.asarray(rng.standard_normal((N, 384)).astype(np.float32))
q0 = jnp.asarray(rng.standard_normal((256, 384)).astype(np.float32))


@jax.jit
def mm_topk_loop(q, n):
    def body(i, carry):
        q, acc = carry
        s = jax.lax.dot_general(q, emb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        v, _ = jax.lax.top_k(s, 10)
        q = q + v[:, :1] * 1e-9
        return q, acc + v[0, 0]
    return jax.lax.fori_loop(0, n, body, (q0, jnp.float32(0)))[1]


mm_topk_loop(q0, 1).block_until_ready()
for n in [1, 10, 50, 100, 200, 400, 800, 1600]:
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        mm_topk_loop(q0, n).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"iters={n:>5}: total={min(ts)*1e3:9.2f} ms  per-iter={min(ts)/n*1e3:7.3f} ms", flush=True)
