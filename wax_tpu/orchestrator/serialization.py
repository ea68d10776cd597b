"""Index builder <-> segment blob serialization.

The TPU analogue of the reference's index-image serialization: FTS5 serializes the
whole SQLite image into the lex segment (reference: FTS5SearchEngine.swift:486-543) and
the vector engines serialize a raw f32 matrix / USearch buffer wrapped in a "MV2V"
header (VectorSerializer.swift:5-220). Here both become array serialization: the dense
index as an .npz of its live arrays, the lex index as JSON-structured postings (small,
host-side state) — each wrapped in the store's checksummed segment manifest.
"""
from __future__ import annotations

import io
import json

import numpy as np

from wax_tpu.index.dense import DenseIndexBuilder
from wax_tpu.index.lex import LexIndexBuilder

__all__ = [
    "serialize_dense",
    "deserialize_dense",
    "serialize_lex",
    "deserialize_lex",
    "serialize_vector_engine",
    "deserialize_vector_engine",
]

DENSE_FORMAT = "wxs-dense-npz-v1"
LEX_FORMAT = "wxs-lex-json-v1"
HNSW_FORMAT = "wxs-hnsw-npz-v1"


def serialize_dense(builder: DenseIndexBuilder) -> tuple[bytes, dict[str, str]]:
    arrays = builder.state_arrays()
    buf = io.BytesIO()
    np.savez(
        buf,
        emb=arrays["emb"].astype(np.float32),
        frame_ids=arrays["frame_ids"],
        active=arrays["active"],
    )
    attrs = {
        "format": DENSE_FORMAT,
        "dim": str(builder.dim),
        "similarity": builder.similarity,
        "count": str(builder.count),
        "live": str(len(builder)),
    }
    return buf.getvalue(), attrs


def deserialize_dense(blob: bytes, attrs: dict[str, str]) -> DenseIndexBuilder:
    if attrs.get("format") != DENSE_FORMAT:
        raise ValueError(f"unsupported dense segment format {attrs.get('format')!r}")
    data = np.load(io.BytesIO(blob))
    return DenseIndexBuilder.from_state_arrays(
        {"emb": data["emb"], "frame_ids": data["frame_ids"], "active": data["active"]},
        dim=int(attrs["dim"]),
        similarity=attrs.get("similarity", "cosine"),
    )


def serialize_vector_engine(
    engine, embedder_identity: str | None = None
) -> tuple[bytes, dict[str, str]]:
    """Serialize a FlatVectorEngine or HNSWVectorEngine into a segment blob.

    When `embedder_identity` is given it is recorded in the segment attrs so a later
    open can detect that the index was built by a different provider (the analogue of
    the reference tying its vector index to the CoreML model identity)."""
    blob, attrs = _serialize_vector_engine(engine)
    if embedder_identity is not None:
        attrs["embedder"] = embedder_identity
    return blob, attrs


def _serialize_vector_engine(engine) -> tuple[bytes, dict[str, str]]:
    if engine.kind in ("flat", "sharded"):
        blob, attrs = serialize_dense(engine.builder)
        attrs["engine"] = engine.kind
        return blob, attrs
    if engine.kind == "hnsw":
        arrays = engine.builder.state_arrays()
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        attrs = {
            "format": HNSW_FORMAT,
            "engine": "hnsw",
            "dim": str(engine.dim),
            "count": str(len(engine)),
            "ef_search": str(engine.ef_search),
        }
        return buf.getvalue(), attrs
    if engine.kind == "ivf":
        # the raw vectors are the source of truth; buckets rebuild deterministically
        blob, attrs = serialize_dense(engine.builder)
        attrs.update(
            engine="ivf",
            nprobe=str(engine.nprobe),
            seed=str(engine.seed),
            n_clusters="" if engine.n_clusters is None else str(engine.n_clusters),
        )
        return blob, attrs
    raise ValueError(f"unknown vector engine kind {engine.kind!r}")


def deserialize_vector_engine(blob: bytes, attrs: dict[str, str]):
    from wax_tpu.search.vector_engines import FlatVectorEngine, HNSWVectorEngine

    kind = attrs.get("engine", "flat")
    if kind in ("flat", "sharded"):
        from wax_tpu.search.vector_engines import ShardedFlatVectorEngine

        builder = deserialize_dense(blob, attrs)
        cls = ShardedFlatVectorEngine if kind == "sharded" else FlatVectorEngine
        eng = cls(dim=builder.dim, similarity=builder.similarity)
        eng.builder = builder
        return eng
    if kind == "hnsw":
        data = np.load(io.BytesIO(blob))
        arrays = {k: data[k] for k in data.files}
        eng = HNSWVectorEngine(dim=int(attrs["dim"]))
        eng.builder = type(eng.builder).from_state_arrays(arrays, dim=int(attrs["dim"]))
        eng.ef_search = int(attrs.get("ef_search", "64"))
        return eng
    if kind == "ivf":
        from wax_tpu.search.vector_engines import IVFVectorEngine

        builder = deserialize_dense(blob, attrs)
        eng = IVFVectorEngine(
            dim=builder.dim,
            n_clusters=int(attrs["n_clusters"]) if attrs.get("n_clusters") else None,
            nprobe=int(attrs.get("nprobe", "8")),
            seed=int(attrs.get("seed", "0")),
        )
        eng.builder = builder
        return eng
    raise ValueError(f"unknown vector engine kind {kind!r}")


def serialize_lex(builder: LexIndexBuilder) -> tuple[bytes, dict[str, str]]:
    state = builder.state()
    payload = {
        "vocab": state["vocab"],
        "doc_terms": state["doc_terms"],
        "doc_len": state["doc_len"],
        "frame_ids": state["frame_ids"],
        "active": state["active"],
    }
    blob = json.dumps(payload, ensure_ascii=False, separators=(",", ":")).encode("utf-8")
    attrs = {"format": LEX_FORMAT, "docs": str(len(builder)), "terms": str(len(state["vocab"]))}
    return blob, attrs


def deserialize_lex(blob: bytes, attrs: dict[str, str]) -> LexIndexBuilder:
    if attrs.get("format") != LEX_FORMAT:
        raise ValueError(f"unsupported lex segment format {attrs.get('format')!r}")
    payload = json.loads(blob.decode("utf-8"))
    b = LexIndexBuilder()
    # rebuild postings from stored analyses (no re-tokenization)
    from collections import Counter

    for terms, dl, fid, active in zip(
        payload["doc_terms"], payload["doc_len"], payload["frame_ids"], payload["active"]
    ):
        row = len(b._doc_len)
        b._doc_terms.append(terms)
        b._doc_len.append(dl)
        b._frame_ids.append(fid)
        b._active.append(active)
        if active and fid >= 0:
            b._row_of[fid] = row
        for term, tf in Counter(terms).items():
            b._postings[b._tid(term)][row] = tf
    return b
