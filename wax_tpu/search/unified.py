"""Unified hybrid search — the retrieval heart.

Mirrors the reference's pipeline (reference:
Sources/Wax/UnifiedSearch/UnifiedSearch.swift:19-488): classify query -> adaptive lane
weights -> run BM25 (implicit-AND primary + OR-expanded fallback), vector,
structured-evidence and (for temporal queries) timeline lanes -> weighted RRF fusion
(k=60, tie-break (score desc, best rank asc, frame id asc), :590-700) -> frame/metadata
filters -> preview hydration (:444-459) -> deterministic intent-aware rerank window
(:476-480, :701-1010) -> timeline fallback when empty (:483-485).

TPU shape: the BM25 and dense lanes are jitted device programs over immutable
snapshots; lane orchestration, fusion over tiny top-k lists, and rerank are pure host
logic (round-tripping ~24-element lists through the device would cost more than it
saves). A fully fused on-device variant (single XLA program, rrf_fuse_device) backs the
sharded path in wax_tpu/parallel/.
"""
from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np

from wax_tpu.index.lex import analyze
from wax_tpu.ops.bm25 import bm25_topk, pad_term_ids
from wax_tpu.ops.fusion import FusedHit, rrf_fuse
from wax_tpu.search.engine import HybridSearchEngine
from wax_tpu.text.analyzer import QuerySignals, analyze_query
from wax_tpu.text.classifier import AdaptiveFusionConfig, classify_query
from wax_tpu.types import (
    LaneSource,
    QueryType,
    RankingDiagnostics,
    SearchHit,
    SearchMode,
    SearchRequest,
    SearchResponse,
)

__all__ = ["unified_search", "make_snippet"]

_LANE_SOURCE = {
    "bm25": LaneSource.BM25,
    "vector": LaneSource.VECTOR,
    "structured": LaneSource.STRUCTURED,
    "temporal": LaneSource.TEMPORAL,
}

# rerank window size, mirroring the reference's default (FastRAGConfig rerank window 12)
_RERANK_WINDOW = 12


def make_snippet(content: str, terms: tuple[str, ...], radius: int = 80, max_len: int = 200) -> str:
    """Deterministic snippet: first window around the earliest query-term occurrence."""
    low = content.lower()
    best = None
    for t in terms:
        i = low.find(t.lower())
        if i >= 0 and (best is None or i < best):
            best = i
    if best is None:
        return content[:max_len]
    start = max(0, best - radius)
    snippet = content[start : start + max_len]
    return ("…" if start > 0 else "") + snippet


def _bm25_run(engine: HybridSearchEngine, padded, fetch_k: int, mode: str):
    """One BM25 top-k pass, dispatched to the sharded lane when configured."""
    if engine.lex_sharded:
        from wax_tpu.parallel.sharded_hybrid import sharded_bm25_topk

        vals, fids = sharded_bm25_topk(padded, engine.lex_sharded_snapshot(), fetch_k, engine.mesh, mode=mode)
        return vals, fids
    vals, _, fids = bm25_topk(padded, engine.lex_snapshot(), fetch_k, mode=mode)
    return vals, fids


def _bm25_lane(engine: HybridSearchEngine, query: str, fetch_k: int) -> list[tuple[int, float]]:
    """Implicit-AND primary query + OR-expanded fallback, primary hits first
    (reference: UnifiedSearch.swift:98-138)."""
    tids = engine.lex.query_term_ids(query)
    if not tids:
        return []
    padded = jnp.asarray(pad_term_ids(tids, dfs=engine.lex.df)[None, :])
    vals_a, fids_a = _bm25_run(engine, padded, fetch_k, "all")
    primary = [
        (int(f), float(v))
        for f, v in zip(np.asarray(fids_a)[0], np.asarray(vals_a)[0])
        if f >= 0
    ]
    if len(primary) >= fetch_k or len(tids) <= 1:
        return primary
    vals_o, fids_o = _bm25_run(engine, padded, fetch_k, "any")
    seen = {f for f, _ in primary}
    fallback = [
        (int(f), float(v))
        for f, v in zip(np.asarray(fids_o)[0], np.asarray(vals_o)[0])
        if f >= 0 and int(f) not in seen
    ]
    return (primary + fallback)[:fetch_k]


def _vector_lane(
    engine: HybridSearchEngine, request: SearchRequest, fetch_k: int
) -> list[tuple[int, float]]:
    if request.embedding is not None:
        qv = np.asarray(request.embedding, np.float32)
    else:
        qv = engine.embed_query(request.query)
    if qv is None or len(engine.vector) == 0:
        return []
    n = np.linalg.norm(qv)
    if n > 0:
        qv = qv / n
    vals, fids = engine.vector.search(qv[None, :], fetch_k)
    return [(int(f), float(v)) for f, v in zip(fids[0], vals[0]) if f >= 0]


def _temporal_lane(engine: HybridSearchEngine, request: SearchRequest, fetch_k: int):
    metas = engine.frames.timeline(request.time_range, limit=fetch_k, newest_first=True)
    return [(m.frame_id, float(m.timestamp_ms)) for m in metas]


def _passes_filters(engine: HybridSearchEngine, request: SearchRequest, fid: int) -> bool:
    if request.frame_filter is not None and fid not in request.frame_filter:
        return False
    meta = engine.frames.get(fid)
    if meta is None or not engine.frames.is_live(fid):
        return False
    if request.time_range is not None and not request.time_range.contains(meta.timestamp_ms):
        return False
    if request.metadata_filter:
        for k, v in request.metadata_filter.items():
            if meta.metadata.get(k) != v:
                return False
    return True


def unified_search(engine: HybridSearchEngine, request: SearchRequest) -> SearchResponse:
    t0 = time.perf_counter()
    qtype = classify_query(request.query)
    weights = AdaptiveFusionConfig().for_type(qtype)
    signals = analyze_query(request.query)
    fetch_k = max(request.top_k * 2, 24)

    lanes: dict[str, list[tuple[int, float]]] = {}
    if request.mode in (SearchMode.HYBRID, SearchMode.TEXT_ONLY):
        lanes["bm25"] = _bm25_lane(engine, request.query, fetch_k)
    if request.mode in (SearchMode.HYBRID, SearchMode.VECTOR_ONLY):
        lanes["vector"] = _vector_lane(engine, request, fetch_k)
    if (
        request.mode == SearchMode.HYBRID
        and request.use_structured_memory
        and engine.structured_evidence is not None
    ):
        ev = engine.structured_evidence(request.query, request.as_of_ms)
        lanes["structured"] = [(fid, 1.0) for fid in ev[:fetch_k]]
    if qtype == QueryType.TEMPORAL and request.mode == SearchMode.HYBRID:
        lanes["temporal"] = _temporal_lane(engine, request, fetch_k)

    if request.mode == SearchMode.TEXT_ONLY:
        weights = {"bm25": 1.0}
    elif request.mode == SearchMode.VECTOR_ONLY:
        weights = {"vector": 1.0}

    fused = rrf_fuse(lanes, weights, rrf_k=request.rrf_k)
    fused = [h for h in fused if _passes_filters(engine, request, h.frame_id)]

    # preview hydration
    previews = {
        h.frame_id: engine.frames.preview(h.frame_id, request.preview_max_bytes) for h in fused
    }

    # intent-aware rerank over the head window
    from wax_tpu.search.rerank import intent_aware_rerank

    fused = intent_aware_rerank(
        fused,
        previews,
        signals,
        window=_RERANK_WINDOW,
        vector_influenced=lambda h: "vector" in h.sources,
    )

    # timeline fallback when every lane came up empty (reference :483-485)
    if not fused and request.mode == SearchMode.HYBRID:
        metas = engine.frames.timeline(request.time_range, limit=request.top_k)
        fused = [
            FusedHit(m.frame_id, 0.0, i + 1, {"temporal": i + 1}, {"temporal": float(m.timestamp_ms)})
            for i, m in enumerate(metas)
            if _passes_filters(engine, request, m.frame_id)
        ]
        previews.update(
            {h.frame_id: engine.frames.preview(h.frame_id, request.preview_max_bytes) for h in fused}
        )

    hits = []
    for i, h in enumerate(fused[: request.top_k]):
        content = engine.frames.content(h.frame_id) or ""
        snippet = make_snippet(content, signals.content_terms or tuple(analyze(request.query)))
        diag = None
        if request.include_diagnostics:
            # which criterion separated this hit from its neighbor (reference:
            # tie-break reason in RankingDiagnostics, UnifiedSearch.swift:203-263)
            tie = "score"
            prev = fused[i - 1] if i > 0 else None
            if prev is not None and prev.score == h.score:
                tie = "best_rank" if prev.best_rank != h.best_rank else "frame_id"
            diag = RankingDiagnostics(
                lane_ranks=dict(h.lane_ranks),
                lane_scores=dict(h.lane_scores),
                rrf_score=h.score,
                tie_break=tie,
            )
        hits.append(
            SearchHit(
                frame_id=h.frame_id,
                score=h.score,
                preview=snippet or previews.get(h.frame_id, ""),
                sources=tuple(_LANE_SOURCE[s] for s in h.sources if s in _LANE_SOURCE),
                diagnostics=diag,
            )
        )

    return SearchResponse(
        hits=tuple(hits),
        query_type=qtype,
        lane_counts={k: len(v) for k, v in lanes.items()},
        elapsed_ms=(time.perf_counter() - t0) * 1e3,
    )
