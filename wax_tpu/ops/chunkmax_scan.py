"""Chunk-max flat scan: exact large-corpus top-k in three dense stages.

The fused extraction kernel (flat_scan._scan_topk_kernel) runs K max-extraction passes
per tile, which dominates at large N (~6.6 ms per 1M rows of extraction alone). This
pipeline does ONE reduction pass instead and defers exact scoring to the winning
chunks, staying exact by the block-max containment argument (ops/topk.blockmax_topk):

  1. Pallas kernel: tiled Q·Dᵀ on the MXU + per-128-lane-chunk maxima — one pass,
     writes only [B, N/128] f32 (the full score matrix never exists);
  2. blockmax_topk over the chunk maxima (recursive chunking keeps top_k inputs tiny);
  3. exact rescore of the k winning 128-row chunks per query via the IVF DMA-gather
     kernel (a flat corpus IS an IVF index with bucket_size=128 and probes = chunks).

HBM traffic ≈ one corpus read + B·k·128·d rescore bytes. bf16 corpora halve the read.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wax_tpu.ops.ivf_kernel import _run as _ivf_rescore
from wax_tpu.ops.topk import NEG_INF, blockmax_topk

__all__ = ["chunkmax_scan_topk"]

_TB = 256
# TN sweep at 1M x 768 bf16 on v5e (round 2): 1024 -> 4.30 ms, 2048 -> 3.56 ms
# (fewer grid steps amortize the per-tile revisit overhead), 4096 -> VMEM OOM
# (17.4M scoped > 16M limit). 2048 is the widest tile that fits at 768 dims;
# at d <= 448 the 4096 tile fits and measures 1.34 vs 1.48 ms for the maxima
# pass at 1M x 384 bf16 (round 5 probe) — _pick_tn widens when it can.
_TN = 2048


def _pick_tn(n: int, d: int) -> int:
    if d <= 448 and n % 4096 == 0:
        return 4096
    return _TN


def _chunkmax_kernel(q_ref, db_ref, bias_ref, cm_ref, *, tn: int):
    s = jax.lax.dot_general(
        q_ref[:], db_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + bias_ref[:]
    tb = s.shape[0]
    c = tn // 128
    cm = jnp.max(s.reshape(tb, c, 128), axis=2)
    # output lanes are 128-padded (Mosaic block constraint); fill tail with NEG_INF
    lanes = jax.lax.broadcasted_iota(jnp.int32, (tb, 128), 1)
    cm_ref[:, :] = jnp.where(lanes < c, jnp.pad(cm, ((0, 0), (0, 128 - c)), constant_values=NEG_INF), NEG_INF)


@functools.partial(jax.jit, static_argnames=("tb", "tn", "interpret"))
def _chunk_maxima(queries, emb, bias, tb: int, tn: int, interpret: bool):
    b, d = queries.shape
    n = emb.shape[0]
    nb, nn = pl.cdiv(b, tb), pl.cdiv(n, tn)
    c_tile = tn // 128
    kernel = functools.partial(_chunkmax_kernel, tn=tn)
    return pl.pallas_call(
        kernel,
        grid=(nb, nn),
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 128), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb * tb, nn * 128), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d, bytes_accessed=(b * d + n * d) * 4, transcendentals=0
        ),
        interpret=interpret,
    )(queries, emb, bias)


def chunkmax_scan_topk(queries: jax.Array, emb: jax.Array, bias: jax.Array, k: int):
    """Exact top-k over a [N, d] corpus (N % 2048 == 0, 128-chunk tiling).

    Args:
      queries: [B, d] (cast to emb dtype for the MXU).
      emb: [N, d] corpus (f32 or bf16).
      bias: [1, N] additive mask (0 live / NEG_INF dead).
      k: static top-k (k * 128 rescored rows per query).

    Returns (scores [B, k] f32, rows [B, k] int32 into emb; -1 padded).
    """
    b, d = queries.shape
    n = emb.shape[0]
    if n % _TN:
        raise ValueError(f"corpus rows must be a multiple of {_TN}")
    tn = _pick_tn(n, d)
    interpret = jax.default_backend() == "cpu"
    tb = min(_TB, ((b + 7) // 8) * 8)
    q = queries
    b_pad = ((b + tb - 1) // tb) * tb
    if b_pad != b:
        q = jnp.pad(q, ((0, b_pad - b), (0, 0)))
    q = q.astype(emb.dtype)

    c_tile = tn // 128
    nn = n // tn
    n_chunks = n // 128
    cm_padded = _chunk_maxima(q, emb, bias, tb, tn, interpret)[:b_pad]
    cm = cm_padded.reshape(b_pad, nn, 128)[:, :, :c_tile].reshape(b_pad, nn * c_tile)
    # small corpora can have fewer 128-row chunks than k: rescore every chunk then
    kc = min(k, n_chunks)
    _, chunks = blockmax_topk(cm, kc)  # [b_pad, kc] winning 128-row chunks

    # rescore winning chunks exactly via the IVF DMA kernel: buckets = 128-row chunks
    emb3 = emb.reshape(n_chunks, 128, d)
    ids2 = jnp.arange(n, dtype=jnp.int32).reshape(n_chunks, 128)
    counts = jnp.sum(bias.reshape(n_chunks, 128) > NEG_INF * 0.5, axis=1).astype(jnp.int32)
    vals, rows = _ivf_rescore(
        q.astype(jnp.float32), chunks.astype(jnp.int32), counts, emb3, ids2, k, kc, interpret
    )
    return vals[:b], rows[:b]
