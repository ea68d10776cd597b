"""Op-level attribution of the candidate BM25 lane at 1M (what does each stage cost?).

Times, slope-measured in one process on the bench synthetic corpus:
  kernel      — candidate_scores_pallas alone (merge kernel + plane writeback)
  +topk       — kernel + plain lax.top_k(F) over the [B, Q*W] plane
  +wide       — kernel + wide_topk(F, exact=False)
  +rescore    — kernel + wide + forward-index rescore (the full budgeted lane)
  +rescore64  — same with F=64 (the pre-round fetch floor)

    python scripts/probe_bm25_ops.py [N] [BUDGET] [F]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wax_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from bench import _make_timer, _synth_sharded_lex, robust_slope
from wax_tpu.ops.bm25_candidates import wide_topk
from wax_tpu.ops.bm25_candidates_pallas import candidate_scores_pallas
from wax_tpu.ops.bm25_rescore import rescore_topk
from wax_tpu.ops.topk import NEG_INF

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
BUDGET = int(sys.argv[2]) if len(sys.argv) > 2 else 3072
F = int(sys.argv[3]) if len(sys.argv) > 3 else 256
T, B, QT, K = 16384, 256, 16, 10


def main() -> None:
    lex = _synth_sharded_lex(N, T, BUDGET)
    max_df = lex.max_df
    rng = np.random.default_rng(7)
    tids0 = jnp.asarray(rng.integers(0, T, (B, QT)).astype(np.int32))
    arrs = (
        lex.doc_rows[0], lex.wnorm[0], lex.offsets[0], lex.idf[0],
        lex.doc_rows_rev[0], lex.wnorm_rev[0], lex.fwd_tids[0], lex.fwd_wnorm[0],
    )

    def gen(tids, dr, wn, off, idf, drr, wnr):
        return candidate_scores_pallas(tids, dr, wn, off, idf, drr, wnr,
                                       max_df=max_df, mode="any")

    def lane(tids, dr, wn, off, idf, drr, wnr, ft, fw, f, use_wide, do_rescore):
        rows, scores = gen(tids, dr, wn, off, idf, drr, wnr)
        if use_wide:
            cv, cp = wide_topk(scores, f, exact=False)
        else:
            cv, cp = jax.lax.top_k(scores, f)
        if not do_rescore:
            return cv
        crows = jnp.where(cv > NEG_INF * 0.5, jnp.take_along_axis(rows, cp, axis=-1), -1)
        vals, _ = rescore_topk(tids, crows, ft, fw, idf, K, "any")
        return vals

    def sel_lane(tids, dr, wn, off, idf, drr, wnr, ft, fw):
        from wax_tpu.ops.bm25_candidates_pallas import _SEL_LEVELS

        cand_rows, keys = candidate_scores_pallas(
            tids, dr, wn, off, idf, drr, wnr, max_df=max_df, mode="any", sel=_SEL_LEVELS
        )
        _, cpos = jax.lax.top_k(keys, F)
        crows = jnp.take_along_axis(cand_rows, cpos, axis=-1)
        vals, _ = rescore_topk(tids, crows, ft, fw, idf, K, "any")
        return vals

    names = (sys.argv[4].split(",") if len(sys.argv) > 4 else None)
    variants = {
        "sel_lane": lambda t, *a: sel_lane(t, *a),
        "kernel": lambda t, *a: jnp.sum(gen(t, *a[:6])[1][:, :128]),
        "+wide": lambda t, *a: lane(t, *a, F, True, False),
        "+rescore": lambda t, *a: lane(t, *a, F, True, True),
    }
    if names:
        variants = {k: v for k, v in variants.items() if k in names}

    for name, call in variants.items():
        @jax.jit
        def chained(q, iters, tids, *a, call=call):
            def body(i, carry):
                q, acc = carry
                t2 = (tids + jnp.int32(i)) % T
                v = call(t2, *a)
                v0 = v.reshape(-1)[0]
                return q + v0 * 1e-12, acc + v0

            return jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))[1]

        q0 = jnp.zeros((1,), jnp.float32)
        float(chained(q0, 1, tids0, *arrs))
        ms, info = robust_slope(
            _make_timer(chained, q0, tids0, *arrs), 3, 13, 23, floor_ms=0.2, cap_ms=4000.0
        )
        print(f"{name}: {ms:.3f} ms/batch attempts={info['attempts']}", flush=True)


if __name__ == "__main__":
    main()
