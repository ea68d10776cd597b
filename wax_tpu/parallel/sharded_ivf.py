"""Mesh-sharded IVF search: bucket slots distributed over the data axis.

The multi-chip generalization of wax_tpu/index/ivf.py (the reference's vector engine is
single-GPU Metal, MetalVectorEngine.swift:446-631, so this whole axis is new). Layout
choice: each cluster's fixed-size bucket is split along its SLOT axis across the mesh —
shard s holds slots [s*S/n, (s+1)*S/n) of EVERY bucket — rather than distributing whole
clusters. Why: every query probes the same nprobe clusters on every shard, so the probe
work divides exactly by the shard count with no load imbalance and no masked idle steps
(cluster-distribution would force each shard through all nprobe static scan steps while
owning ~nprobe/n of them on average). Centroids are tiny and stay replicated; the
cross-shard candidate merge is the same ICI all-gather + top-k as the sharded flat scan
(sharded_scan.py), riding ICI, not DCN.

Determinism: the gathered candidate order is (shard, probe rank, slot) and the final
top-k is stable, so results are identical run to run on a fixed mesh shape. Tie-breaks
can differ from the single-chip `ivf_search_topk` order (which merges probe-by-probe)
— scores themselves are exact either way.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wax_tpu.index.ivf import IVFIndex
from wax_tpu.ops.topk import NEG_INF
from wax_tpu.parallel.merge import merge_topk_across_mesh
from wax_tpu.parallel.mesh import corpus_axes, corpus_shards

__all__ = ["ShardedIVFIndex", "shard_ivf_index", "sharded_ivf_search_topk"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class ShardedIVFIndex:
    """Device-mesh IVF snapshot (pytree).

    centroids: [C, d] replicated.
    emb:       [C, S_pad, d] — slot axis sharded over the mesh data axis.
    ids:       [C, S_pad] int32, -1 padding; slot-sharded.
    bias:      [C, S_pad] f32 additive mask (0 live / NEG_INF padding); slot-sharded.
    """

    centroids: jax.Array
    emb: jax.Array
    ids: jax.Array
    bias: jax.Array
    # True when built from a spilled IVFIndex (boundary replication): the merge
    # then fetches a 2k window and collapses duplicate frame ids
    spilled: bool = field(metadata=dict(static=True), default=False)

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def bucket_size(self) -> int:
        return self.emb.shape[1]


def shard_ivf_index(index: IVFIndex, mesh: Mesh) -> ShardedIVFIndex:
    """Lay a built IVFIndex out across the mesh, slot axis over the data axis.

    Pads the bucket size to a multiple of the shard count; padding slots carry
    NEG_INF bias and id -1, exactly like build-time bucket padding.
    """
    n_shards = corpus_shards(mesh)
    s = index.bucket_size
    pad = (-s) % n_shards
    emb, ids, bias = index.emb, index.ids, index.bias
    if pad:
        emb = jnp.pad(emb, ((0, 0), (0, pad), (0, 0)))
        ids = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        bias = jnp.pad(bias, ((0, 0), (0, pad)), constant_values=NEG_INF)
    ca = corpus_axes(mesh)
    slot_sharded = NamedSharding(mesh, P(None, ca))
    return ShardedIVFIndex(
        centroids=jax.device_put(index.centroids, NamedSharding(mesh, P())),
        emb=jax.device_put(emb, NamedSharding(mesh, P(None, ca, None))),
        ids=jax.device_put(ids, slot_sharded),
        bias=jax.device_put(bias, slot_sharded),
        spilled=index.spilled,
    )


def sharded_ivf_search_topk(
    queries: jax.Array,
    index: ShardedIVFIndex,
    k: int,
    mesh: Mesh,
    nprobe: int = 8,
):
    """Distributed IVF top-k: replicated probe selection, sharded bucket scoring,
    ICI all-gather candidate merge.

    Args:
      queries: [B, d] replicated query batch.
      index: ShardedIVFIndex on `mesh`.
      k: static top-k.
      nprobe: buckets probed per query (same semantics as ivf_search_topk).

    Returns:
      (scores [B, k] f32, frame_ids [B, k] int32) replicated; -1 padded.
    """
    ca = corpus_axes(mesh)
    nprobe = min(nprobe, index.n_clusters)
    # spilled indexes: a replicated row can surface through two probed buckets
    # (and, slot-sharded, through two shards) — fetch a 2k window, dedup at the end
    kfetch = 2 * k if index.spilled else k

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            P(),
            P(None, ca, None),
            P(None, ca),
            P(None, ca),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def search(q, centroids, emb, ids, bias):
        b = q.shape[0]
        s_loc = emb.shape[1]  # local slot count = S_pad / n_shards
        qf = q.astype(jnp.float32)
        # probe selection is replicated work on a tiny [B, C] matrix
        cscores = jax.lax.dot_general(
            qf, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        _, probes = jax.lax.top_k(cscores, nprobe)  # [B, P] identical on every shard
        kk = min(kfetch, s_loc * nprobe)

        def step(carry, probe_col):  # probe_col: [B] bucket ids at this probe rank
            best_v, best_f = carry
            cand = jnp.take(emb, probe_col, axis=0)  # [B, S_loc, d] local contiguous
            cand_ids = jnp.take(ids, probe_col, axis=0)
            cand_bias = jnp.take(bias, probe_col, axis=0)
            scores = jnp.einsum("bd,bsd->bs", qf, cand.astype(jnp.float32)) + cand_bias
            step_k = min(kk, s_loc)
            v, pos = jax.lax.top_k(scores, step_k)
            f = jnp.take_along_axis(cand_ids, pos, axis=-1)
            mv, mpos = jax.lax.top_k(jnp.concatenate([best_v, v], axis=1), kk)
            mf = jnp.take_along_axis(jnp.concatenate([best_f, f], axis=1), mpos, axis=1)
            return (mv, mf), None

        init = (
            jnp.full((b, kk), NEG_INF, jnp.float32),
            jnp.full((b, kk), -1, jnp.int32),
        )
        (vals, fids), _ = jax.lax.scan(step, init, jnp.transpose(probes))
        # hierarchical candidate merge: full kfetch lists over ICI inside the
        # slice, only the merged [B, kfetch] over the slice (DCN) axis
        mvals, mfids = merge_topk_across_mesh(vals, fids, kfetch, mesh)
        if index.spilled:
            from wax_tpu.index.ivf import dedup_topk

            mvals, mfids = dedup_topk(mvals, mfids.astype(jnp.int32), k)
        else:
            mvals, mfids = mvals[:, :k], mfids[:, :k]
        if mvals.shape[1] < k:
            pad_k = k - mvals.shape[1]
            mvals = jnp.pad(mvals, ((0, 0), (0, pad_k)), constant_values=NEG_INF)
            mfids = jnp.pad(mfids, ((0, 0), (0, pad_k)), constant_values=-1)
        return mvals, mfids.astype(jnp.int32)

    return search(queries, index.centroids, index.emb, index.ids, index.bias)
