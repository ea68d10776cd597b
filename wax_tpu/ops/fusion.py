"""Weighted Reciprocal Rank Fusion.

Mirrors the reference's fusion semantics (reference:
Sources/Wax/UnifiedSearch/UnifiedSearch.swift:590-700): each lane contributes
weight / (rrf_k + rank) per hit (rank is 1-based), fused results order by
(rrf score desc, best lane rank asc, frame_id asc) — the exact deterministic tie-break
of UnifiedSearch.swift:654-658. Two implementations:

  * `rrf_fuse` — host-side over small top-k lists (the recall path; lists are ~tens of
    entries, device round-trips would dominate).
  * `rrf_fuse_device` — pure jitted scatter-add over row-id space, used by the fully
    fused device pipeline (hybrid search in one XLA program) and property tests.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp

__all__ = ["FusedHit", "rrf_fuse", "rrf_fuse_device", "DEFAULT_RRF_K"]

DEFAULT_RRF_K = 60.0


@dataclass(frozen=True)
class FusedHit:
    frame_id: int
    score: float
    best_rank: int
    lane_ranks: dict[str, int]
    lane_scores: dict[str, float]

    @property
    def sources(self) -> tuple[str, ...]:
        return tuple(sorted(self.lane_ranks))


def rrf_fuse(
    lanes: Mapping[str, Sequence[tuple[int, float]]],
    weights: Mapping[str, float],
    rrf_k: float = DEFAULT_RRF_K,
    top_k: int | None = None,
) -> list[FusedHit]:
    """Fuse ranked lanes of (frame_id, lane_score) into a single deterministic list.

    Hits with frame_id < 0 are ignored. A lane absent from `weights` gets weight 0
    (still recorded in diagnostics). Duplicate frame ids within one lane keep their
    best (first) rank, matching the reference's per-lane dedup.
    """
    acc: dict[int, FusedHit] = {}
    for lane_name in sorted(lanes):
        w = float(weights.get(lane_name, 0.0))
        seen: set[int] = set()
        rank = 0
        for fid, lane_score in lanes[lane_name]:
            fid = int(fid)
            if fid < 0 or fid in seen:
                continue
            seen.add(fid)
            rank += 1
            inc = w / (rrf_k + rank)
            prev = acc.get(fid)
            if prev is None:
                acc[fid] = FusedHit(
                    frame_id=fid,
                    score=inc,
                    best_rank=rank,
                    lane_ranks={lane_name: rank},
                    lane_scores={lane_name: float(lane_score)},
                )
            else:
                lane_ranks = dict(prev.lane_ranks)
                lane_ranks[lane_name] = rank
                lane_scores = dict(prev.lane_scores)
                lane_scores[lane_name] = float(lane_score)
                acc[fid] = FusedHit(
                    frame_id=fid,
                    score=prev.score + inc,
                    best_rank=min(prev.best_rank, rank),
                    lane_ranks=lane_ranks,
                    lane_scores=lane_scores,
                )
    out = sorted(acc.values(), key=lambda h: (-h.score, h.best_rank, h.frame_id))
    return out[:top_k] if top_k is not None else out


@functools.partial(jax.jit, static_argnames=("n_rows",))
def rrf_fuse_device(
    lane_rows: jax.Array,
    lane_weights: jax.Array,
    n_rows: int,
    rrf_k: float = DEFAULT_RRF_K,
):
    """Device-side RRF over row ids.

    Args:
      lane_rows: [L, B, K] int32 per-lane ranked row ids (-1 = empty slot; rank =
                 position+1).
      lane_weights: [L] or [L, B] float32 lane weights.
      n_rows: static row-id space size.

    Returns:
      [B, n_rows] float32 fused scores (0 where a row appears in no lane).
    """
    l, b, k = lane_rows.shape
    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)[None, None, :]
    if lane_weights.ndim == 1:
        w = lane_weights[:, None, None]
    else:
        w = lane_weights[:, :, None]
    inc = jnp.where(lane_rows >= 0, w / (rrf_k + ranks), 0.0)  # [L, B, K]
    safe = jnp.maximum(lane_rows, 0)
    scores = jnp.zeros((b, n_rows), jnp.float32)
    bidx = jnp.broadcast_to(jnp.arange(b)[None, :, None], (l, b, k))
    scores = scores.at[bidx.reshape(-1), safe.reshape(-1)].add(inc.reshape(-1), mode="drop")
    return scores
