"""Live hybrid search engine: frames + vector + lexical indexes with snapshot caching.

The TPU-build analogue of the reference's WaxSession-owned engine pair (reference:
Sources/Wax/WaxSession.swift:6-521 — live FTS5 + vector engine instances over a store)
and UnifiedSearchEngineCache (UnifiedSearch/UnifiedSearchEngineCache.swift:53-123 —
process-wide cache keyed by store identity + committed checksum, with incremental
catch-up). Here the mutable state is host-side builders; device snapshots are cached
per builder generation and rebuilt lazily — the functional-core equivalent of cache
catch-up. The vector engine is pluggable (flat fused-scan vs HNSW beam search),
mirroring the reference's Metal-vs-USearch preference.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from wax_tpu.embed.provider import BatchEmbeddingProvider, EmbeddingProvider
from wax_tpu.index.dense import Similarity
from wax_tpu.index.frames import FrameCatalog
from wax_tpu.index.lex import LexIndex, LexIndexBuilder
from wax_tpu.search.vector_engines import VectorEngine, make_vector_engine

__all__ = ["HybridSearchEngine"]


class HybridSearchEngine:
    """Owns the frame catalog, the lexical builder, and a pluggable vector engine.

    `structured_evidence` is an optional hook returning evidence frame ids for a query
    (wired to the structured memory store by the orchestrator — the analogue of the
    reference's structured lane, FTS5SearchEngine.swift:398).
    """

    def __init__(
        self,
        embedder: EmbeddingProvider | BatchEmbeddingProvider | None,
        dim: int | None = None,
        similarity: str = Similarity.COSINE,
        frames: FrameCatalog | None = None,
        structured_evidence: Callable[[str, int | None], list[int]] | None = None,
        vector_preference: str = "auto",
        vector_kwargs: dict | None = None,
        lex_sharded: bool = False,
        mesh=None,
        lex_postings_budget: int | str | None = None,
    ):
        if dim is None:
            if embedder is None:
                raise ValueError("either embedder or dim is required")
            dim = embedder.dimensions
        self.embedder = embedder
        self.frames = frames if frames is not None else FrameCatalog()
        kw = dict(vector_kwargs or {})
        if vector_preference in ("auto", "flat"):
            kw.setdefault("similarity", similarity)
        self.vector: VectorEngine = make_vector_engine(vector_preference, dim=dim, **kw)
        self.lex = LexIndexBuilder(postings_budget=lex_postings_budget)
        self.structured_evidence = structured_evidence
        self._lex_snap: LexIndex | None = None
        self._lex_gen = -1
        # distributed BM25 lane: shard the CSR postings over the data mesh and merge
        # candidates over ICI (parallel/sharded_hybrid.py); single-device meshes
        # degrade gracefully to one shard
        self.lex_sharded = lex_sharded
        self.mesh = mesh
        if lex_sharded and mesh is None:
            from wax_tpu.parallel.mesh import data_mesh

            self.mesh = data_mesh()
        self._lex_sharded_snap = None
        self._lex_sharded_gen = -1
        self.stats = {"lex_snapshots": 0}
        import threading

        # snapshot builds are read-triggered cache fills; under the orchestrator's
        # RW lock multiple readers can race here, and a frozen lex builder's first
        # snapshot is itself a multi-step construction — serialize just the build
        self._snap_lock = threading.Lock()

    # -- ingest ------------------------------------------------------------------------
    def index_text(self, frame_id: int, text: str) -> None:
        self.lex.add(frame_id, text)

    def index_embedding(self, frame_id: int, vec: np.ndarray) -> None:
        self.vector.add(frame_id, vec)

    def index_embedding_batch(self, frame_ids: Sequence[int], vecs: np.ndarray) -> None:
        self.vector.add_batch(np.asarray(frame_ids), vecs)

    def remove(self, frame_id: int) -> None:
        self.lex.remove(frame_id)
        self.vector.remove(frame_id)

    # -- snapshots ------------------------------------------------------------------------
    def lex_snapshot(self) -> LexIndex:
        if self._lex_snap is None or self._lex_gen != self.lex.generation:
            with self._snap_lock:
                if self._lex_snap is None or self._lex_gen != self.lex.generation:
                    from wax_tpu.utils.profiling import span

                    with span("engine.lex_snapshot"):
                        self._lex_snap = self.lex.snapshot()
                    self._lex_gen = self.lex.generation
                    self.stats["lex_snapshots"] += 1
        return self._lex_snap

    def lex_sharded_snapshot(self):
        """Mesh-sharded CSR snapshot, cached per builder generation (like lex_snapshot)."""
        if self._lex_sharded_snap is None or self._lex_sharded_gen != self.lex.generation:
            with self._snap_lock:
                if self._lex_sharded_snap is None or self._lex_sharded_gen != self.lex.generation:
                    from wax_tpu.parallel.sharded_hybrid import shard_lex_index

                    n_rows = self.lex.row_space()
                    self._lex_sharded_snap = shard_lex_index(self.lex, self.mesh, n_rows)
                    self._lex_sharded_gen = self.lex.generation
                    self.stats["lex_snapshots"] += 1
        return self._lex_sharded_snap

    def embed_query(self, text: str) -> np.ndarray | None:
        if self.embedder is None:
            return None
        return np.asarray(self.embedder.embed(text), np.float32)
