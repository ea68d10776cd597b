"""wax-tpu: a TPU-native retrieval & AI-memory engine.

Brand-new JAX/XLA/Pallas/pjit framework with the capability surface of the reference
on-device RAG engine (christopherkarani/Wax): one snapshot file holds documents,
embeddings, a BM25 index, vector indexes (exact fused-scan and HNSW), a structured
entity/fact store, and a crash-safe WAL; retrieval is hybrid (BM25 + dense + temporal
+ structured lanes) fused with weighted Reciprocal Rank Fusion and assembled into a
deterministic token-budgeted RAG context. See README.md / docs/architecture.md.
"""
from wax_tpu.version import __version__

from wax_tpu.index.dense import DenseIndex, DenseIndexBuilder, Similarity
from wax_tpu.index.graph import GraphIndex, HNSWBuilder
from wax_tpu.ops.beam_search import hnsw_search
from wax_tpu.ops.flat_scan import flat_scan_topk, normalize_rows
from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.types import (
    SearchRequest,
    SearchResponse,
    SearchHit,
    SearchMode,
    QueryType,
    TimeRange,
)

__all__ = [
    "__version__",
    "DenseIndex",
    "DenseIndexBuilder",
    "GraphIndex",
    "HNSWBuilder",
    "Similarity",
    "flat_scan_topk",
    "hnsw_search",
    "normalize_rows",
    "HashEmbedder",
    "SearchRequest",
    "SearchResponse",
    "SearchHit",
    "SearchMode",
    "QueryType",
    "TimeRange",
    "MemoryOrchestrator",
    "OrchestratorConfig",
    "WaxStore",
    "StoreOptions",
    "FastRAGConfig",
    "WaxSession",
    "open_session",
]


def __getattr__(name):
    # heavy imports stay lazy so `import wax_tpu` is cheap
    if name == "MemoryOrchestrator":
        from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator

        return MemoryOrchestrator
    if name == "OrchestratorConfig":
        from wax_tpu.orchestrator.config import OrchestratorConfig

        return OrchestratorConfig
    if name == "FastRAGConfig":
        from wax_tpu.rag.config import FastRAGConfig

        return FastRAGConfig
    if name in ("WaxStore", "StoreOptions"):
        import wax_tpu.storage.store as _store

        return getattr(_store, name)
    if name in ("WaxSession", "open_session"):
        import wax_tpu.session as _session

        return getattr(_session, name)
    raise AttributeError(f"module 'wax_tpu' has no attribute {name!r}")
