"""Pallas IVF probe kernel: explicit DMA bucket gathers + fused scoring/top-k.

XLA lowers `jnp.take(emb, probes)` over [C, S, d] to a generic gather that moves
~1.5 GB/s on v5e — two orders of magnitude under DMA speed — which erases IVF's
pruning advantage (docs/architecture.md). This kernel issues each probed bucket as ONE
contiguous async copy (double-buffered), scores it while the next bucket streams in,
and extracts the per-query top-k on chip. Per query: nprobe DMAs of S x d floats;
nothing else touches HBM.

Validity needs no ids DMA: the packer fills buckets from slot 0, so a per-bucket live
count (scalar-prefetched) masks the padded tail. Grid: one cell per 8 queries
(Mosaic's sublane granularity); probes + counts arrive via scalar prefetch so DMA
addresses are known before the body runs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wax_tpu.index.ivf import IVFIndex
from wax_tpu.ops.topk import NEG_INF

__all__ = ["ivf_search_topk_pallas"]

_KPAD = 128
_QB = 8  # queries per grid cell
_NSLOTS = 4  # default DMA pipeline depth (slots-1 bucket copies in flight)


def _kernel(
    probes_ref,
    counts_ref,
    q_ref,
    emb_hbm,
    vals_ref,
    idx_ref,
    emb_scratch,
    score_scratch,
    sems,
    *,
    nprobe: int,
    s_bucket: int,
    k: int,
    nslots: int = _NSLOTS,
):
    cell = pl.program_id(0)
    total = _QB * nprobe
    _N = nslots

    def get_dma(slot, t):
        qi = t // nprobe
        p = t % nprobe
        bucket = probes_ref[cell * _QB + qi, p]
        return pltpu.make_async_copy(emb_hbm.at[bucket], emb_scratch.at[slot], sems.at[slot])

    # warm-up: keep nslots - 1 copies in flight
    for w in range(_N - 1):
        @pl.when(w < total)
        def _(w=w):
            get_dma(w, w).start()

    slot_iota = jax.lax.broadcasted_iota(jnp.int32, (1, s_bucket), 1)

    def body(t, _):
        slot = t % _N

        @pl.when(t + _N - 1 < total)
        def _():
            get_dma((t + _N - 1) % _N, t + _N - 1).start()

        get_dma(slot, t).wait()
        qi = t // nprobe
        p = t % nprobe
        bucket = probes_ref[cell * _QB + qi, p]
        live = counts_ref[bucket]
        # select query row via one-hot contraction — dynamic 1-row sublane slices
        # mis-lower on hardware (sublane tiling), one-hot matmul is exact
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (1, _QB), 1) == qi).astype(jnp.float32)
        qrow = jax.lax.dot_general(
            onehot, q_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [1, d]
        scores = jax.lax.dot_general(
            qrow, emb_scratch[slot], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [1, S]
        scores = jnp.where(slot_iota < live, scores, NEG_INF)
        col = pl.multiple_of(p * s_bucket, 128)  # bucket stride is 128-aligned by build
        # one-hot row-masked store (dynamic single-sublane stores mis-lower on HW)
        rows = jax.lax.broadcasted_iota(jnp.int32, (_QB, s_bucket), 0)
        block = score_scratch[:, pl.ds(col, s_bucket)]
        score_scratch[:, pl.ds(col, s_bucket)] = jnp.where(
            rows == qi, jnp.broadcast_to(scores, (_QB, s_bucket)), block
        )
        return 0

    jax.lax.fori_loop(0, total, body, 0)

    # per-query top-k extraction over [QB, nprobe*S] candidates
    s = score_scratch[:, :]
    width = nprobe * s_bucket
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_QB, _KPAD), 1)

    def extract(t, carry):
        s, vals, poss = carry
        m = jnp.max(s, axis=1, keepdims=True)
        am = jnp.min(jnp.where(s == m, cols, width), axis=1, keepdims=True)
        sel = lanes == t
        vals = jnp.where(sel, m, vals)
        poss = jnp.where(sel, am, poss)
        s = jnp.where(cols == am, NEG_INF, s)
        return s, vals, poss

    init = (
        s,
        jnp.full((_QB, _KPAD), NEG_INF, jnp.float32),
        jnp.full((_QB, _KPAD), -1, jnp.int32),
    )
    _, vals, poss = jax.lax.fori_loop(0, k, extract, init)
    vals_ref[:, :] = vals
    idx_ref[:, :] = poss


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "interpret", "nslots"))
def _run(queries, probes, counts, emb3, ids2, k: int, nprobe: int, interpret: bool, nslots: int = _NSLOTS):
    b, d = queries.shape
    c, s_bucket, _ = emb3.shape
    kernel = functools.partial(_kernel, nprobe=nprobe, s_bucket=s_bucket, k=k, nslots=nslots)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // _QB,),
        in_specs=[
            pl.BlockSpec((_QB, d), lambda i, probes, counts: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((_QB, _KPAD), lambda i, probes, counts: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_QB, _KPAD), lambda i, probes, counts: (i, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((nslots, s_bucket, d), emb3.dtype),
            pltpu.VMEM((_QB, nprobe * s_bucket), jnp.float32),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
    )
    vals, poss = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((b, _KPAD), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(probes, counts, queries, emb3)
    vals, poss = vals[:, :k], poss[:, :k]
    # decode flat candidate position -> (probe rank, slot) -> bucket -> external id
    probe_rank = jnp.maximum(poss, 0) // s_bucket
    slot = jnp.maximum(poss, 0) % s_bucket
    bucket = jnp.take_along_axis(probes, probe_rank, axis=1)
    fids = ids2[bucket, slot]
    fids = jnp.where((poss >= 0) & (vals > NEG_INF * 0.5), fids, -1)
    vals = jnp.where(fids >= 0, vals, NEG_INF)
    return vals, fids.astype(jnp.int32)


def ivf_search_topk_pallas(
    queries: jax.Array, index: IVFIndex, k: int = 10, nprobe: int = 8, nslots: int = _NSLOTS
):
    """DMA-gather IVF search. Same results as ivf_search_topk, kernel-accelerated.
    Query count is padded to a multiple of 8 (Mosaic sublane granularity). On a
    spilled index the kernel extracts a 2k window and duplicates (a boundary row
    reached via two probed buckets) are collapsed on the XLA side."""
    if queries.ndim == 1:
        queries = queries[None, :]
    b, d = queries.shape
    if index.bucket_size % 128:
        raise ValueError("pallas IVF kernel requires a 128-aligned bucket size")
    if index.spilled and 2 * k > _KPAD:
        # the kernel extracts into a 128-lane block, so a spilled index's 2k dedup
        # window does not fit for k > 64 — the XLA path has no such cap and returns
        # the full k (keeping the two backends result-identical)
        from wax_tpu.index.ivf import ivf_search_topk

        return ivf_search_topk(queries, index, k, nprobe)
    nprobe = min(nprobe, index.n_clusters)
    b_pad = ((b + _QB - 1) // _QB) * _QB
    q = queries.astype(jnp.float32)
    if b_pad != b:
        q = jnp.pad(q, ((0, b_pad - b), (0, 0)))
    cscores = jax.lax.dot_general(
        q, index.centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    _, probes = jax.lax.top_k(cscores, nprobe)
    counts = jnp.sum(index.ids >= 0, axis=1).astype(jnp.int32)  # [C] live per bucket
    interpret = jax.default_backend() == "cpu"
    kfetch = min(2 * k, _KPAD, index.bucket_size * nprobe) if index.spilled else k
    vals, fids = _run(
        q, probes.astype(jnp.int32), counts, index.emb, index.ids, kfetch, nprobe, interpret, nslots
    )
    if index.spilled:
        from wax_tpu.index.ivf import dedup_topk

        vals, fids = jax.jit(functools.partial(dedup_topk, k=min(k, kfetch)))(vals, fids)
        if vals.shape[1] < k:
            pad = k - vals.shape[1]
            vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
            fids = jnp.pad(fids, ((0, 0), (0, pad)), constant_values=-1)
    return vals[:b], fids[:b]
