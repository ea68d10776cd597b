"""wax-tpu: a TPU-native retrieval & AI-memory engine.

Brand-new JAX/XLA/Pallas/pjit framework with the capability surface of the reference
on-device RAG engine (christopherkarani/Wax): one snapshot file holds documents,
embeddings, a BM25 index, an HNSW-style vector index, a structured entity/fact store,
and a crash-safe WAL; retrieval is hybrid (BM25 + dense flat-scan or graph beam search
+ temporal + structured lanes) fused with weighted Reciprocal Rank Fusion and assembled
into a deterministic token-budgeted RAG context. See SURVEY.md for the full map.
"""
from wax_tpu.version import __version__

from wax_tpu.index.dense import DenseIndex, DenseIndexBuilder, Similarity
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
    "Similarity",
    "flat_scan_topk",
    "normalize_rows",
    "HashEmbedder",
    "SearchRequest",
    "SearchResponse",
    "SearchHit",
    "SearchMode",
    "QueryType",
    "TimeRange",
]
