"""Top-k utilities: masked top-k and hierarchical merges.

TPU-first replacement for the reference's GPU multi-pass top-k reduction
(reference: Sources/WaxVectorSearch/Shaders/TopKReduction.metal:103-167 — per-threadgroup
heap top-k followed by iterative merge passes). On TPU the same hierarchy is:
per-tile top-k inside the Pallas scan kernel -> per-chip `lax.top_k` over the
concatenated tile candidates -> cross-chip merge over ICI (see wax_tpu/parallel/).

All functions are pure and jittable. Ties break deterministically toward the lower
index (XLA `top_k` is stable; the kernel's extraction uses min-index argmax).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["NEG_INF", "masked_top_k", "merge_topk", "topk_with_ids", "blockmax_topk"]

# Large finite negative sentinel: avoids -inf arithmetic edge cases on TPU and keeps
# bf16-safe behavior when scores are downcast. A plain Python float so Pallas kernels
# can close over it without capturing a traced constant.
NEG_INF = -3.0e38


def masked_top_k(scores: jax.Array, k: int, mask: jax.Array | None = None):
    """Top-k over the last axis with an optional validity mask.

    Args:
      scores: [..., n] float scores.
      k: static top-k size.
      mask: optional [..., n] bool; False entries are excluded.

    Returns:
      (values [..., k], indices [..., k] int32). Excluded/overflow slots carry
      NEG_INF values and index -1.
    """
    scores = scores.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    vals, idx = jax.lax.top_k(scores, k)
    idx = jnp.where(vals <= NEG_INF, -1, idx).astype(jnp.int32)
    return vals, idx


def merge_topk(vals_a, idx_a, vals_b, idx_b, k: int):
    """Merge two top-k candidate lists along the last axis into a single top-k.

    The TPU analogue of the reference's iterative top-k merge pass
    (TopKReduction.metal:136-167). Deterministic: on score ties the candidate that
    appears earlier in the [a | b] concatenation wins.
    """
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    mvals, pos = jax.lax.top_k(vals, k)
    midx = jnp.take_along_axis(idx, pos, axis=-1)
    midx = jnp.where(mvals <= NEG_INF, -1, midx)
    return mvals, midx


def blockmax_topk(scores: jax.Array, k: int):
    """Exact top-k over the last axis via chunk-max pruning.

    Every top-k element's 128-chunk has a top-k chunk max (if x is top-k, at most k-1
    elements exceed it, so at most k-1 chunks have max > x). top_k therefore only ever
    sorts N/128 maxima plus 128k gathered candidates — much faster than a direct
    top_k over N on TPU (which is sort-bound). Requires n % 128 == 0.

    Returns (values [B, k], indices [B, k] int32).
    """
    b, n = scores.shape
    if n % 128 or n <= 128 * k:
        vals, idx = jax.lax.top_k(scores, k)
        return vals, idx.astype(jnp.int32)
    c = n // 128
    s3 = scores.reshape(b, c, 128)
    cmax = jnp.max(s3, axis=2)
    kc = min(k, c)
    _, chunks = jax.lax.top_k(cmax, kc)
    # Gather winning chunks in ascending chunk-index order so candidates appear in
    # ascending global-index order: lax.top_k is stable, so exact score ties then
    # break toward the lowest global index (the documented contract), matching the
    # xla backend on duplicate vectors.
    chunks = jnp.sort(chunks, axis=1)
    cand = jnp.take_along_axis(s3, chunks[:, :, None], axis=1)
    vals, pos = jax.lax.top_k(cand.reshape(b, kc * 128), k)
    idx = jnp.take_along_axis(chunks, pos // 128, axis=1) * 128 + pos % 128
    return vals, idx.astype(jnp.int32)


def topk_with_ids(scores: jax.Array, ids: jax.Array, k: int, mask: jax.Array | None = None):
    """Masked top-k that also gathers an id array: returns (values, row_indices, ids)."""
    vals, idx = masked_top_k(scores, k, mask)
    safe = jnp.maximum(idx, 0)
    out_ids = jnp.where(idx >= 0, jnp.take(ids, safe, axis=0), -1)
    return vals, idx, out_ids.astype(jnp.int32)
