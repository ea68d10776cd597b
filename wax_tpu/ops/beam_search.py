"""Batched graph beam search on TPU — the HNSW query path.

TPU-native replacement for USearch's pointer-chasing HNSW search (reference:
Sources/WaxVectorSearch/USearchVectorEngine.swift:201 — single-query C++ traversal).
Pointer chasing is hostile to XLA, so the search is restructured as fixed-shape,
batch-parallel beam expansion over the padded adjacency matrix:

  each step: pick the best unexpanded beam node per query -> gather its neighbor rows
  (masked gather from HBM) -> score them on the MXU (one [B, M2] x dim dot) ->
  sort-based dedup against the beam -> keep the top-ef beam.

The visited set is implicit: duplicates are removed by an id-sort (expanded entries
win ties so nothing is expanded twice), which replaces hash-set bookkeeping with a
TPU-friendly O(ef log ef) sort per step. Iteration count is static; every shape is
static; the whole search jits into one XLA program.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from wax_tpu.index.graph import GraphIndex
from wax_tpu.ops.topk import NEG_INF

__all__ = ["hnsw_search"]


def _dedup_by_id(ids, scores, expanded):
    """Mask duplicate ids (keep expanded=True copies preferentially); -1 ids stay."""
    # key: id*2 - expanded  => for equal ids, the expanded copy sorts first
    key = ids * 2 - expanded.astype(jnp.int32)
    order = jnp.argsort(key, axis=-1)
    ids_s = jnp.take_along_axis(ids, order, axis=-1)
    scores_s = jnp.take_along_axis(scores, order, axis=-1)
    exp_s = jnp.take_along_axis(expanded, order, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(ids_s[:, :1], dtype=bool), ids_s[:, 1:] == ids_s[:, :-1]], axis=-1
    )
    invalid = dup | (ids_s < 0)
    scores_s = jnp.where(invalid, NEG_INF, scores_s)
    ids_s = jnp.where(invalid, -1, ids_s)
    return ids_s, scores_s, exp_s


@functools.partial(jax.jit, static_argnames=("k", "ef", "iters"))
def hnsw_search(
    queries: jax.Array,
    graph: GraphIndex,
    k: int = 10,
    ef: int = 64,
    iters: int | None = None,
):
    """Batched beam search.

    Args:
      queries: [B, dim] (normalized for cosine).
      graph: GraphIndex snapshot.
      k: final top-k (k <= ef).
      ef: beam width (efSearch; reference sweep 16-256 per BASELINE.md).
      iters: expansion steps; defaults to ef (each step expands one node per query).

    Returns:
      (scores [B, k] f32, frame_ids [B, k] int32), -1 padded.
    """
    if iters is None:
        iters = ef
    b, d = queries.shape
    q = queries.astype(graph.emb.dtype)
    m2 = graph.max_degree
    e = graph.entries.shape[0]

    def score_rows(rows):  # rows [B, R] -> [B, R] similarity + bias
        vecs = jnp.take(graph.emb, jnp.maximum(rows, 0), axis=0)  # [B, R, d]
        s = jnp.einsum("bd,brd->br", q, vecs.astype(q.dtype)).astype(jnp.float32)
        s = s + jnp.take(graph.bias, jnp.maximum(rows, 0))
        return jnp.where(rows >= 0, s, NEG_INF)

    # Seed the beam: score ALL entry seeds densely (one small matmul — the TPU
    # replacement for hierarchical descent) and start from the best per query.
    seed_emb = jnp.take(graph.emb, graph.entries, axis=0)  # [E, d]
    seed_scores = jax.lax.dot_general(
        q, seed_emb.astype(q.dtype), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + jnp.take(graph.bias, graph.entries)[None, :]
    n_seed = min(e, ef)
    top_seed_scores, seed_pos = jax.lax.top_k(seed_scores, n_seed)
    init_ids = jnp.take(graph.entries, seed_pos).astype(jnp.int32)
    pad = ef - n_seed
    beam_ids = jnp.pad(init_ids, ((0, 0), (0, pad)), constant_values=-1)
    beam_scores = jnp.pad(top_seed_scores, ((0, 0), (0, pad)), constant_values=NEG_INF)
    beam_exp = jnp.zeros((b, ef), bool)

    def step(carry, _):
        ids, scores, exp = carry
        # best unexpanded node per query
        cand_scores = jnp.where(exp | (ids < 0), NEG_INF, scores)
        best = jnp.argmax(cand_scores, axis=-1)  # [B]
        best_id = jnp.take_along_axis(ids, best[:, None], axis=-1)  # [B, 1]
        has_work = jnp.take_along_axis(cand_scores, best[:, None], axis=-1) > NEG_INF * 0.5
        # mark expanded
        onehot = jnp.arange(ids.shape[1])[None, :] == best[:, None]
        exp = exp | (onehot & has_work)
        # expand neighbors
        nbrs = jnp.take(graph.adjacency, jnp.maximum(best_id[:, 0], 0), axis=0)  # [B, M2]
        nbrs = jnp.where(has_work & (best_id >= 0), nbrs, -1)
        nscores = score_rows(nbrs)
        # merge + dedup + keep top-ef
        all_ids = jnp.concatenate([ids, nbrs], axis=-1)
        all_scores = jnp.concatenate([scores, nscores], axis=-1)
        all_exp = jnp.concatenate([exp, jnp.zeros_like(nbrs, dtype=bool)], axis=-1)
        all_ids, all_scores, all_exp = _dedup_by_id(all_ids, all_scores, all_exp)
        top_scores, pos = jax.lax.top_k(all_scores, ef)
        top_ids = jnp.take_along_axis(all_ids, pos, axis=-1)
        top_exp = jnp.take_along_axis(all_exp, pos, axis=-1)
        return (top_ids, top_scores, top_exp), None

    (beam_ids, beam_scores, beam_exp), _ = jax.lax.scan(
        step, (beam_ids, beam_scores, beam_exp), None, length=iters
    )

    kk = min(k, ef)
    vals, pos = jax.lax.top_k(beam_scores, kk)
    rows = jnp.take_along_axis(beam_ids, pos, axis=-1)
    fids = jnp.where(
        (vals > NEG_INF * 0.5) & (rows >= 0),
        jnp.take(graph.frame_ids, jnp.maximum(rows, 0)),
        -1,
    ).astype(jnp.int32)
    vals = jnp.where(fids >= 0, vals, NEG_INF)
    return vals, fids
