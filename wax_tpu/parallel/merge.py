"""Hierarchical top-k candidate merge across the mesh's corpus axes.

The cross-chip analogue of the reference's iterative top-k reduction
(reference: Sources/WaxMetal/.../TopKReduction.metal:103-167 — threadgroup-level
iterative merges), generalized to the two-level topology (SURVEY §5): a full
[B, S_data · k] candidate all-gather + merge INSIDE a slice rides ICI; across
slices only the already-merged [B, k] lists travel over DCN. On a flat
("data",) mesh this degenerates to the single all-gather merge.

Determinism: candidates are ordered (slice, data shard, local extraction order)
and every lax.top_k is stable, so tie-breaks are identical to the flat-mesh merge
of the same global row order — parity-tested in tests/test_two_level_mesh.py.

Must be called INSIDE shard_map with the per-shard [B, k] lists.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from wax_tpu.ops.topk import NEG_INF
from wax_tpu.parallel.mesh import DATA_AXIS, SLICE_AXIS

__all__ = ["merge_topk_across_mesh"]


def _gather_merge_axis(vals, fids, k: int, n_shards: int, axis: str):
    """All-gather per-shard candidate lists over one mesh axis and keep the top k.

    vals/fids: [B, kk] local candidates (score-descending). Returns [B, k].
    """
    av = jax.lax.all_gather(vals, axis)  # [S, B, kk]
    af = jax.lax.all_gather(fids, axis)
    b = vals.shape[0]
    av = jnp.transpose(av, (1, 0, 2)).reshape(b, n_shards * vals.shape[1])
    af = jnp.transpose(af, (1, 0, 2)).reshape(b, n_shards * vals.shape[1])
    kk = min(k, av.shape[1])
    mv, pos = jax.lax.top_k(av, kk)
    mf = jnp.take_along_axis(af, pos, axis=-1)
    mf = jnp.where(mv > NEG_INF * 0.5, mf, -1)
    if kk < k:  # tiny shards: pad back to the requested static width
        mv = jnp.pad(mv, ((0, 0), (0, k - kk)), constant_values=NEG_INF)
        mf = jnp.pad(mf, ((0, 0), (0, k - kk)), constant_values=-1)
    return mv, mf


def merge_topk_across_mesh(vals, fids, k: int, mesh: Mesh):
    """Merge per-shard top-k lists into the global top-k, hierarchically.

    On a ("slice", "data") mesh: ICI all-gather + merge within the slice first,
    then a thin [B, k] all-gather across the slice (DCN) axis. On a flat mesh:
    one all-gather over "data".
    """
    mv, mf = _gather_merge_axis(vals, fids, k, mesh.shape[DATA_AXIS], DATA_AXIS)
    if SLICE_AXIS in mesh.axis_names:
        mv, mf = _gather_merge_axis(mv, mf, k, mesh.shape[SLICE_AXIS], SLICE_AXIS)
    return mv, mf
