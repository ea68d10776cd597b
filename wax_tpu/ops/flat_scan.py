"""Brute-force dense scan with fused top-k — the performance core.

TPU-first redesign of the reference's Metal brute-force cosine scan
(reference: Sources/WaxVectorSearch/MetalVectorEngine.swift:446-631 and
Shaders/CosineDistance.metal:25-329 — one GPU thread per DB vector, threadgroup-shared
query, SIMD8 unrolling, then a multi-pass threadgroup top-k reduce,
Shaders/TopKReduction.metal:103-167).

On TPU the idiomatic shape is completely different: the scan is a tiled Q·Dᵀ matmul on
the MXU (batched queries, bf16/f32), and the top-k is fused *inside* the Pallas kernel
so the full [B, N] score matrix never round-trips to HBM. Hierarchy:

    per-tile (TB x TN block): MXU matmul -> K-step max-extraction in VMEM registers
    per-chip: `lax.top_k` over the [B, n_tiles*K] candidates
    cross-chip: all-gather/merge over ICI (wax_tpu/parallel/sharded_scan.py)

Backends:
  * "xla":          full matmul + masked `lax.top_k`. Correctness oracle; also
                    fastest for tiny corpora.
  * "pallas":       the exact fused kernel — bit-exact vs "xla", 6 VPU ops per
                    extraction pass ("pallas_exact" is an alias).
  * "pallas_packed": fused packed-key kernel (see _packed_topk_kernel) — each
                    extraction pass is 3 VPU ops on i32 keys holding truncated score
                    bits + a column tie-break; scores are compared and returned at
                    <= 2^-12 relative precision (top-10 overlap 0.9988 @10K x 384).
  * "pallas_packed_sel": packed keys + accumulate-then-select extraction (see
                    _packed_sel_kernel): one unrolled max/min insertion pass keeps
                    the top-L keys per lane slot, then the eviction loop runs over
                    the narrow [TB, L*128] candidate plane. 37.8us @10K x 384
                    (vs 91.0 packed / 24.5 matmul-only floor); same 0.9988 overlap.
                    What "auto" picks at small/mid N.
  * "blockmax" / "chunkmax": exact XLA/DMA variants that win at large N.
None of these materialize [B, N] scores in HBM except "blockmax" (at 1M x 768 the
score matrix alone is ~1 GB).

Masking: callers pass a DenseIndex whose tombstones/padding are excluded via a
precomputed additive bias row (0 for live rows, NEG_INF otherwise), which XLA fuses
into the surrounding ops.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wax_tpu.index.dense import DenseIndex, Similarity
from wax_tpu.ops.topk import NEG_INF, masked_top_k

__all__ = ["flat_scan_topk", "scan_scores", "normalize_rows"]

# Tile sizes: the TB x TN score block lives in VMEM alongside the q/db tiles. Wider
# db tiles amortize per-grid-cell overhead: measured 148us (TN=512) -> 111us (TN=2048)
# per 256-query batch at 10K x 384 on v5e (scripts/perf_compare.py sweep). TN is chosen
# per index as the widest candidate dividing its capacity.
_TB = 256  # query-batch tile (sublane-major)
_TN = 512  # fallback database tile (lane-major)
_TN_CANDIDATES = (2048, 1024, 512)


def _pick_tn(capacity: int) -> int:
    for t in _TN_CANDIDATES:
        if capacity % t == 0:
            return t
    return min(_TN, capacity)


def normalize_rows(x: jax.Array, eps: float = 1e-30) -> jax.Array:
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.where(n > 0, x / jnp.maximum(n, eps), x)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _index_bias(index: DenseIndex) -> jax.Array:
    """[1, capacity] additive bias: 0 for live rows, NEG_INF for padding/tombstones."""
    n = index.capacity
    rows = jnp.arange(n, dtype=jnp.int32)
    live = index.active & (rows < index.count)
    return jnp.where(live, 0.0, NEG_INF).astype(jnp.float32)[None, :]


def scan_scores(queries: jax.Array, index: DenseIndex) -> jax.Array:
    """Full [B, capacity] masked score matrix (XLA path building block)."""
    q = queries.astype(index.emb.dtype)
    scores = jax.lax.dot_general(
        q, index.emb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if index.similarity == Similarity.EUCLIDEAN:
        # ||q - d||^2 = ||q||^2 - 2 q.d + ||d||^2 ; rank by negated distance.
        qn = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        dn = jnp.sum(index.emb.astype(jnp.float32) ** 2, axis=-1)[None, :]
        scores = -(qn - 2.0 * scores + dn)
    return scores + _index_bias(index)


# ---------------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------------


# Mosaic requires the last dim of VMEM blocks to be a multiple of the 128-lane width,
# so per-tile candidates are written into a 128-lane-padded block and sliced on merge.
_KPAD = 128

_IMIN = -(2**31)  # plain int: kernels must not capture traced constants
_COL_BITS = 11  # low bits of a packed key hold (2047 - column); supports TN <= 2048
_COL_MASK = (1 << _COL_BITS) - 1


def _packed_topk_kernel(q_ref, db_ref, bias_ref, out_ref, *, k: int):
    """Fused scan + top-k via packed (truncated-score | column-complement) i32 keys.

    The f32 score bits are mapped to a signed-sortable i32 (monotone in the float
    value), the low 11 bits are replaced by (2047 - col), and each extraction pass is
    then just max-reduce + compare + select — 3 full-width VPU ops instead of the 6
    the exact kernel needs (separate f32 argmax + i32 tie-break + eviction). Keys are
    unique per lane, so eviction removes exactly one element (duplicate-safe) and
    score ties break toward the lowest column for free.

    Cost of the shortcut: scores are compared with the low 11 mantissa bits dropped
    (<= 2^-12 relative), so elements whose scores differ by less than that can swap
    ranks vs the exact kernel. Top-k set overlap on random data: 0.9988 measured at
    10K x 384 (see tests); use backend="pallas_exact" when bit-exactness matters.
    """
    scores = jax.lax.dot_general(
        q_ref[:], db_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + bias_ref[0, :][None, :]
    tb = scores.shape[0]
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(
        bits >= 0, bits, jnp.bitwise_xor(jnp.bitwise_not(bits), jnp.asarray(_IMIN, jnp.int32))
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    packed = jnp.bitwise_or(jnp.bitwise_and(key, jnp.int32(~_COL_MASK)), _COL_MASK - cols)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tb, _KPAD), 1)

    def body(t, carry):
        p, out = carry
        m = jnp.max(p, axis=1, keepdims=True)
        out = jnp.where(lanes == t, m, out)
        p = jnp.where(p == m, _IMIN, p)
        return p, out

    _, out = jax.lax.fori_loop(
        0, k, body, (packed, jnp.full((tb, _KPAD), _IMIN, jnp.int32))
    )
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("k", "tb", "tn", "interpret"))
def _packed_scan_topk(queries, emb, bias, k: int, tb: int, tn: int, interpret: bool):
    b, d = queries.shape
    n = emb.shape[0]
    nb, nn = pl.cdiv(b, tb), pl.cdiv(n, tn)
    kernel = functools.partial(_packed_topk_kernel, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(nb, nn),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, _KPAD), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * tb, nn * _KPAD), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=(b * d + n * d + b * nn * _KPAD) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, emb, bias)
    p = out[:b].reshape(b, nn, _KPAD)[:, :, :k]
    local = _COL_MASK - jnp.bitwise_and(p, _COL_MASK)
    gcol = jnp.arange(nn, dtype=jnp.int32)[None, :, None] * tn + local
    keym = jnp.bitwise_and(p, jnp.int32(~_COL_MASK))
    sbits = jnp.where(
        keym >= 0,
        keym,
        jnp.bitwise_not(jnp.bitwise_xor(keym, jnp.asarray(_IMIN, jnp.int32))),
    )
    svals = jax.lax.bitcast_convert_type(sbits, jnp.float32)
    # candidates are laid out (tile asc, rank desc-score/asc-col), so the stable
    # top_k below keeps the lowest-global-index winner on truncated-score ties
    mv, pos = jax.lax.top_k(svals.reshape(b, nn * k), k)
    mi = jnp.take_along_axis(gcol.reshape(b, nn * k), pos, axis=-1)
    mi = jnp.where(mv <= NEG_INF * 0.5, -1, mi)
    # NOTE an exact f32 rescore of the final k was tried here (round 3) and removed:
    # the [B, k] row gather + einsum costs +74us/batch on v5e — the rescored packed
    # path (0.167 ms) is strictly dominated by the exact kernel (0.109 ms). Callers
    # who need exact scores use backend="pallas" (the exact fused kernel).
    return mv, mi


def _packed_sel_kernel(q_ref, db_ref, bias_ref, out_ref, *, k: int, lookahead: int):
    """Packed-key scan with accumulate-then-select extraction.

    Two phases replace _packed_topk_kernel's k passes over the full [TB, TN] plane:
      1. one unrolled pass over the tile's TN/128 lane-slices maintains the
         top-`lookahead` packed keys per lane slot via a max/min insertion chain
         (2 VPU ops per slice per level ~= 2*L full-width-equivalents total);
      2. the standard k-pass eviction loop runs over the NARROW [TB, L*128]
         candidate plane (3 ops * k * L/16 full-width-equivalents).
    For k=10, L=3 that is ~11.6 full-width-equivalents vs the loop kernel's 30.
    The output block and the host-side merge are identical to _packed_topk_kernel.

    Exactness: an element of the true top-k is lost only when more than `lookahead`
    of the tile's top-k share one of the 128 lane slots (columns congruent mod 128).
    For k=10, L=3: P ~= C(10,4)/128^3 ~= 1e-4 per row-tile — two orders below the
    packed representation's existing 2^-12 score-truncation reorderings. Tie
    behavior is the loop kernel's: equal truncated scores resolve to the lowest
    column (the rank loop extracts by full packed key).
    """
    scores = jax.lax.dot_general(
        q_ref[:], db_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + bias_ref[0, :][None, :]
    tb, tn = scores.shape
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    key = jnp.where(
        bits >= 0, bits, jnp.bitwise_xor(jnp.bitwise_not(bits), jnp.asarray(_IMIN, jnp.int32))
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    packed = jnp.bitwise_or(jnp.bitwise_and(key, jnp.int32(~_COL_MASK)), _COL_MASK - cols)
    tops = [jnp.full((tb, _KPAD), _IMIN, jnp.int32) for _ in range(lookahead)]
    for i in range(tn // _KPAD):
        t = packed[:, i * _KPAD : (i + 1) * _KPAD]
        for lvl in range(lookahead):
            hi = jnp.maximum(tops[lvl], t)
            t = jnp.minimum(tops[lvl], t)
            tops[lvl] = hi
    cand = jnp.concatenate(tops, axis=1)  # [TB, L*128]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tb, _KPAD), 1)

    def body(t, carry):
        p, out = carry
        m = jnp.max(p, axis=1, keepdims=True)
        out = jnp.where(lanes == t, m, out)
        p = jnp.where(p == m, _IMIN, p)
        return p, out

    _, out = jax.lax.fori_loop(
        0, k, body, (cand, jnp.full((tb, _KPAD), _IMIN, jnp.int32))
    )
    out_ref[:] = out


def _sel_lookahead(k: int) -> int:
    return 3 if k <= 16 else 4


@functools.partial(jax.jit, static_argnames=("k", "tb", "tn", "interpret"))
def _packed_sel_scan_topk(queries, emb, bias, k: int, tb: int, tn: int, interpret: bool):
    b, d = queries.shape
    n = emb.shape[0]
    nb, nn = pl.cdiv(b, tb), pl.cdiv(n, tn)
    kernel = functools.partial(_packed_sel_kernel, k=k, lookahead=_sel_lookahead(k))
    out = pl.pallas_call(
        kernel,
        grid=(nb, nn),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, _KPAD), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * tb, nn * _KPAD), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=(b * d + n * d + b * nn * _KPAD) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, emb, bias)
    # identical decode/merge to _packed_scan_topk: [B, nn, k] candidates, stable
    # top_k keeps the lowest-global-index winner on truncated-score ties
    p = out[:b].reshape(b, nn, _KPAD)[:, :, :k]
    local = _COL_MASK - jnp.bitwise_and(p, _COL_MASK)
    gcol = jnp.arange(nn, dtype=jnp.int32)[None, :, None] * tn + local
    keym = jnp.bitwise_and(p, jnp.int32(~_COL_MASK))
    sbits = jnp.where(
        keym >= 0,
        keym,
        jnp.bitwise_not(jnp.bitwise_xor(keym, jnp.asarray(_IMIN, jnp.int32))),
    )
    svals = jax.lax.bitcast_convert_type(sbits, jnp.float32)
    mv, pos = jax.lax.top_k(svals.reshape(b, nn * k), k)
    mi = jnp.take_along_axis(gcol.reshape(b, nn * k), pos, axis=-1)
    mi = jnp.where(mv <= NEG_INF * 0.5, -1, mi)
    return mv, mi


def _scan_topk_kernel(q_ref, db_ref, bias_ref, vals_ref, idx_ref, *, tn: int, k: int):
    j = pl.program_id(1)
    scores = jax.lax.dot_general(
        q_ref[:], db_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + bias_ref[0, :][None, :]
    tb = scores.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tb, _KPAD), 1)
    base = j * tn

    def body(t, carry):
        # accumulate via one-hot lane select (Mosaic has no dynamic_update_slice)
        s, vals, idxs = carry
        m = jnp.max(s, axis=1, keepdims=True)  # [TB, 1]
        # deterministic argmax: lowest column index among maxima
        am = jnp.min(jnp.where(s == m, cols, tn), axis=1, keepdims=True)  # [TB, 1]
        sel = lanes == t
        vals = jnp.where(sel, m, vals)
        idxs = jnp.where(sel, am + base, idxs)
        s = jnp.where(cols == am, NEG_INF, s)
        return s, vals, idxs

    init = (
        scores,
        jnp.full((tb, _KPAD), NEG_INF, jnp.float32),
        jnp.full((tb, _KPAD), -1, jnp.int32),
    )
    _, vals, idxs = jax.lax.fori_loop(0, k, body, init)
    vals_ref[:] = vals
    idx_ref[:] = idxs


@functools.partial(jax.jit, static_argnames=("k", "tb", "tn", "interpret"))
def _pallas_scan_topk(queries, emb, bias, k: int, tb: int, tn: int, interpret: bool):
    b, d = queries.shape
    n = emb.shape[0]
    nb, nn = pl.cdiv(b, tb), pl.cdiv(n, tn)
    kernel = functools.partial(_scan_topk_kernel, tn=tn, k=k)
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(nb, nn),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, _KPAD), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, _KPAD), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb * tb, nn * _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((nb * tb, nn * _KPAD), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=(b * d + n * d + b * nn * _KPAD * 2) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, emb, bias)
    # slice the k valid lanes out of each padded tile block, then merge
    vals = vals[:b].reshape(b, nn, _KPAD)[:, :, :k].reshape(b, nn * k)
    idxs = idxs[:b].reshape(b, nn, _KPAD)[:, :, :k].reshape(b, nn * k)
    mvals, pos = jax.lax.top_k(vals, k)
    midx = jnp.take_along_axis(idxs, pos, axis=-1)
    midx = jnp.where(mvals <= NEG_INF * 0.5, -1, midx)
    return mvals, midx


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------------
# Block-max top-k (exact, no extraction loop)
#
# Claim: every top-k element lives in one of the top-k 128-column chunks ranked by
# chunk max. Proof: if x is a top-k element, at most k-1 elements exceed it, so at
# most k-1 chunks have max > x, while chunk(x).max >= x — chunk(x) ranks top-k.
# So: matmul -> per-chunk max -> top_k over ~N/128 maxima -> gather those k chunks
# -> top_k over k*128 candidates. All plain XLA; top_k never sees more than
# max(N/128, 128k) elements, which removes the sort bottleneck of the naive path.
# ---------------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def _blockmax_topk(queries, emb, bias, k: int):
    from wax_tpu.ops.topk import blockmax_topk

    scores = jax.lax.dot_general(
        queries.astype(emb.dtype), emb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias
    vals, rows = blockmax_topk(scores, k)
    rows = jnp.where(vals <= NEG_INF * 0.5, -1, rows)
    return vals, rows


@functools.partial(jax.jit, static_argnames=("k",))
def _blockmax16_topk(queries, emb, bias, k: int):
    """blockmax over bf16-materialized scores + exact f32 rescore of a 2k-candidate
    window.

    The [B, N] score round-trip to HBM dominates blockmax at mid N; storing it as
    bf16 halves that traffic (measured 670us -> 333us at 100K x 384 on v5e). bf16's
    8 mantissa bits alone would cost top-10 set accuracy (overlap 0.983), so the
    top max(2k, k+16) candidates by bf16 score are re-scored exactly in f32 (a tiny
    [B, RW, d] gather) and the final k picked by (exact score desc, row asc). A true
    top-k element is missed only if more than RW-k elements beat it under bf16
    rounding — measured overlap 0.9996 at 100K (see tests)."""
    from wax_tpu.ops.topk import blockmax_topk

    n = emb.shape[0]
    scores = jax.lax.dot_general(
        queries.astype(emb.dtype), emb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    coarse = (scores + bias).astype(jnp.bfloat16)
    rw = int(min(max(2 * k, k + 16), n))
    _, cand = blockmax_topk(coarse, rw)  # [B, RW] distinct rows
    rows = jnp.take(emb, cand, axis=0).astype(jnp.float32)  # [B, RW, d]
    exact = jnp.einsum("brd,bd->br", rows, queries.astype(jnp.float32))
    exact = exact + bias[0, cand]
    # top k by (exact score desc, row asc) — lowest-index tie-break contract
    order = jnp.lexsort((cand, -exact), axis=-1)[:, :k]
    vals = jnp.take_along_axis(exact, order, axis=-1)
    out_rows = jnp.take_along_axis(cand, order, axis=-1)
    out_rows = jnp.where(vals <= NEG_INF * 0.5, -1, out_rows)
    return vals, out_rows


# ---------------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def _xla_scan_topk(queries, index: DenseIndex, k: int):
    scores = scan_scores(queries, index)
    vals, idx = masked_top_k(scores, k)
    safe = jnp.maximum(idx, 0)
    fids = jnp.where(idx >= 0, jnp.take(index.frame_ids, safe), -1).astype(jnp.int32)
    return vals, idx, fids


def flat_scan_topk(
    queries: jax.Array,
    index: DenseIndex,
    k: int,
    *,
    backend: str = "auto",
):
    """Batched dense top-k scan.

    Args:
      queries: [B, dim] query matrix (normalized by the caller for cosine).
      index: DenseIndex snapshot.
      k: static top-k.
      backend: "auto" | "xla" | "pallas" (fused kernel, bit-exact vs the xla
        oracle; alias "pallas_exact") | "pallas_packed" (fused packed-key loop
        kernel; scores compared AND returned with <= 2^-12 relative truncation, so
        near-tied elements can swap ranks vs exact — deterministic, duplicate-safe,
        lowest-index ties; top-10 overlap 0.9988 measured at 10K x 384) |
        "pallas_packed_sel" (accumulate-then-select extraction, same packed-key
        semantics, 2.4x faster at the headline shape — what "auto" picks at small
        N) | "blockmax" (exact chunk-max pruned top-k) | "chunkmax" (exact,
        fastest at very large N).

    Returns:
      (scores [B, k] f32, rows [B, k] int32 row indices into index.emb,
       frame_ids [B, k] int32) — empty slots carry score NEG_INF, index -1.
    """
    if queries.ndim == 1:
        queries = queries[None, :]
    b, d = queries.shape
    if d != index.dim:
        raise ValueError(f"query dim {d} != index dim {index.dim}")
    k = int(min(k, index.capacity))

    if backend == "auto":
        # Measured regimes on v5e (batch 256, scripts/perf_compare.py + perf_extract):
        #   naive xla (matmul + full top_k): only sane for tiny corpora / odd ks
        #   fused pallas kernel:   110us @10K — wins while extraction (K passes over
        #                          the tile) is cheaper than materializing scores
        #   blockmax (exact, pure XLA: chunk-max -> top_k chunks -> gather -> top_k):
        #                          686us @100K (1.5x pallas), 9.1ms @1M x 768 (1.35x)
        #   chunkmax (one-pass chunk maxima + DMA rescore of winning chunks):
        #                          6.9ms f32 / 4.6ms bf16 @1M x 768 — best at large N
        #                          (rescore traffic B*k*128*d makes it lose below ~512K)
        if index.similarity == Similarity.EUCLIDEAN or index.capacity <= 2048 or k > 128:
            backend = "xla"
        elif index.capacity <= 131072:
            # accumulate-then-select packed kernel: 37.8us @10K x 384 b=256 k=10
            # vs 91.0 packed-loop / 108.5 exact / 24.5 matmul-only floor; at 100K
            # 333.7us vs blockmax's 677 (the previous auto pick there) at recall
            # 0.9992 (v5e, round 4, scripts/probe_extraction.py) — same
            # approximate-class contract auto already applies at small N
            backend = "pallas_packed_sel"
        elif index.capacity >= 524288 and index.capacity % 2048 == 0 and index.contiguous and k <= 100:
            # capacity alignment: chunkmax tiles the corpus in _TN=2048-row blocks
            backend = "chunkmax"
        else:
            backend = "blockmax"

    if backend in ("pallas", "pallas_packed", "pallas_packed_sel", "pallas_exact") and k > _KPAD:
        backend = "xla"  # fused kernels extract into a 128-lane block: k <= 128 only

    if backend == "xla":
        return _xla_scan_topk(queries, index, k)

    if index.similarity == Similarity.EUCLIDEAN:
        raise ValueError("pallas backend supports cosine/dot only")
    if backend == "chunkmax" and not index.contiguous:
        # The chunkmax rescore masks each 128-row chunk with a prefix live-count,
        # which is only valid when live rows form a dense prefix; on a tombstoned
        # index it would silently score deleted rows and drop live chunk tails.
        raise ValueError("chunkmax backend requires a contiguous (tombstone-free) index")

    tb = min(_TB, _round_up(b, 8))
    tn = _pick_tn(index.capacity)
    b_pad = _round_up(b, tb)
    q = queries
    if b_pad != b:
        q = jnp.pad(queries, ((0, b_pad - b), (0, 0)))
    q = q.astype(index.emb.dtype)
    bias = _index_bias(index)
    if backend == "blockmax":
        vals, rows = _blockmax_topk(q, index.emb, bias, k)
    elif backend == "blockmax16":
        vals, rows = _blockmax16_topk(q, index.emb, bias, k)
    elif backend == "chunkmax":
        from wax_tpu.ops.chunkmax_scan import chunkmax_scan_topk

        vals, rows = chunkmax_scan_topk(q, index.emb, bias, k)
    elif backend == "pallas_packed_sel" and k <= _KPAD and tn <= (_COL_MASK + 1):
        vals, rows = _packed_sel_scan_topk(q, index.emb, bias, k, tb, tn, _use_interpret())
    elif backend == "pallas_packed" and k <= _KPAD and tn <= (_COL_MASK + 1):
        vals, rows = _packed_scan_topk(q, index.emb, bias, k, tb, tn, _use_interpret())
    else:  # "pallas"/"pallas_exact" (exact fused kernel), or shapes the packed
        # kernel cannot serve
        vals, rows = _pallas_scan_topk(q, index.emb, bias, k, tb, tn, _use_interpret())
    vals, rows = vals[:b], rows[:b]
    safe = jnp.maximum(rows, 0)
    fids = jnp.where(rows >= 0, jnp.take(index.frame_ids, safe), -1).astype(jnp.int32)
    return vals, rows, fids
