"""Mesh-sharded dense scan: distributed flat-scan top-k over a corpus-sharded index.

The multi-chip generalization of wax_tpu/ops/flat_scan.py, replacing what the reference
could not do at all (its Metal scan is single-GPU, MetalVectorEngine.swift:446-631).
Layout: the [N, d] embedding matrix is sharded over the mesh "data" axis; the query
batch is replicated; each shard computes its local top-k (optionally via the fused
Pallas kernel) and the candidates are merged with an all-gather + final top-k — the
cross-chip analogue of the reference's iterative top-k merge (TopKReduction.metal:136),
riding ICI instead of threadgroup memory.

Determinism: global candidate order is (shard index, local extraction order), and the
final `lax.top_k` is stable, so ties resolve identically on every run and every mesh
shape with the same global row order.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from wax_tpu.index.dense import DenseIndex
from wax_tpu.ops.topk import NEG_INF, blockmax_topk
from wax_tpu.parallel.merge import merge_topk_across_mesh
from wax_tpu.parallel.mesh import corpus_axes, corpus_shards, shard_rows

__all__ = ["ShardedDenseIndex", "shard_dense_index", "sharded_flat_scan_topk"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShardedDenseIndex:
    """Corpus-sharded dense index: leading axes laid out over the mesh data axis.

    `bias` folds active/count masking into an additive row bias so the device code is
    a pure matmul + top-k (same convention as the single-chip scan).
    """

    emb: jax.Array  # [N_pad, d] sharded over data axis
    frame_ids: jax.Array  # [N_pad] sharded
    bias: jax.Array  # [N_pad] sharded; 0 live, NEG_INF dead
    # live rows form a dense prefix (tombstone-free source index): each shard's
    # local rows are then ALSO a prefix, which the chunkmax dense lane requires
    contiguous: bool = field(metadata=dict(static=True), default=False)


def shard_dense_index(index: DenseIndex, mesh: Mesh) -> ShardedDenseIndex:
    """Lay a host-built DenseIndex snapshot out across the mesh.

    Pads the row count to a multiple of the data-axis size; padding rows carry
    NEG_INF bias and frame id -1.
    """
    n_shards = corpus_shards(mesh)
    cap = index.capacity
    pad = (-cap) % n_shards
    rows = jnp.arange(cap, dtype=jnp.int32)
    live = index.active & (rows < index.count)
    bias = jnp.where(live, 0.0, NEG_INF).astype(jnp.float32)
    emb, fids = index.emb, index.frame_ids
    if pad:
        emb = jnp.pad(emb, ((0, pad), (0, 0)))
        fids = jnp.pad(fids, (0, pad), constant_values=-1)
        bias = jnp.pad(bias, (0, pad), constant_values=NEG_INF)
    return ShardedDenseIndex(
        emb=shard_rows(mesh, emb),
        frame_ids=shard_rows(mesh, fids),
        bias=shard_rows(mesh, bias),
        contiguous=index.contiguous,
    )


def sharded_flat_scan_topk(
    queries: jax.Array,
    index: ShardedDenseIndex,
    k: int,
    mesh: Mesh,
):
    """Distributed dense top-k: per-shard scan + ICI all-gather candidate merge.

    Args:
      queries: [B, d] replicated query batch.
      index: ShardedDenseIndex on `mesh`.
      k: static top-k (per shard and global).

    Returns:
      (scores [B, k] f32, frame_ids [B, k] int32) replicated.
    """
    rows_spec = P(corpus_axes(mesh))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), rows_spec, rows_spec, rows_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def scan(q, emb, fids, bias):
        scores = jax.lax.dot_general(
            q.astype(emb.dtype), emb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        scores = scores + bias[None, :]
        kk = min(k, emb.shape[0])
        vals, rows = blockmax_topk(scores, kk)
        lfids = jnp.where(vals > NEG_INF * 0.5, jnp.take(fids, jnp.maximum(rows, 0)), -1)
        # ICI all-gather merge within the slice, thin [B, k] across slices (DCN)
        mvals, mfids = merge_topk_across_mesh(vals, lfids, k, mesh)
        return mvals, mfids.astype(jnp.int32)

    return scan(queries, index.emb, index.frame_ids, index.bias)
