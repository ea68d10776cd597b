"""Photo RAG: asset-level ingest (OCR + caption + regions + GPS bins) and recall.

Mirrors the reference's PhotoRAGOrchestrator (reference:
Sources/Wax/PhotoRAG/PhotoRAGOrchestrator.swift:21-1316 and PhotoRAGConfig.swift —
ingest assets offline-only into a root frame + OCR block frames + caption frame +
region frames with CLIP-style multimodal embeddings, GPS location bins, dedupe by
asset id + pipeline version; recall with location/time constraint queries returning
evidence + thumbnail/crop references). OS photo-library access stays behind the
provider protocols; frames live in a dedicated store (the reference keeps
~/.wax/photo.mv2s).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Sequence

import numpy as np

from wax_tpu.multimodal.protocols import (
    CaptionProvider,
    MultimodalEmbeddingProvider,
    OCRProvider,
)
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.types import SearchRequest, TimeRange, now_ms

__all__ = ["PhotoRAGConfig", "PhotoIngestResult", "PhotoHit", "PhotoRAGOrchestrator", "gps_bin"]

PHOTO_ROOT_KIND = "wax.photo.root"
PHOTO_CAPTION_KIND = "wax.photo.caption"
PHOTO_OCR_KIND = "wax.photo.ocr"
PHOTO_REGION_KIND = "wax.photo.region"
PIPELINE_VERSION = "photo-v1"


def gps_bin(lat: float, lon: float, precision: float = 0.01) -> str:
    """Quantized location bin tag (reference: GPS location bins)."""
    return f"gps:{round(lat / precision) * precision:.2f},{round(lon / precision) * precision:.2f}"


@dataclass(frozen=True)
class PhotoRAGConfig:
    max_ocr_blocks: int = 32
    min_ocr_confidence: float = 0.3
    orchestrator: OrchestratorConfig = field(default_factory=OrchestratorConfig)


@dataclass(frozen=True)
class PhotoIngestResult:
    asset_id: str
    root_frame: int
    caption_frame: int | None
    ocr_frames: tuple[int, ...]
    region_frames: tuple[int, ...]
    skipped_duplicate: bool = False


@dataclass(frozen=True)
class PhotoHit:
    asset_id: str
    score: float
    frame_id: int
    kind: str
    text: str
    taken_at_ms: int
    gps: str | None = None
    thumbnail_ref: str | None = None


class PhotoRAGOrchestrator:
    def __init__(
        self,
        store_path: str | Path,
        embedder: MultimodalEmbeddingProvider | None = None,
        ocr_provider: OCRProvider | None = None,
        caption_provider: CaptionProvider | None = None,
        config: PhotoRAGConfig = PhotoRAGConfig(),
    ):
        self.config = config
        self.mm_embedder = embedder
        self.ocr_provider = ocr_provider
        self.caption_provider = caption_provider
        # text lane uses the multimodal text tower when available
        inner_embedder = _TextTowerAdapter(embedder) if embedder is not None else None
        self.inner = MemoryOrchestrator(store_path, inner_embedder, config.orchestrator)
        self._ingested: dict[str, int] = {}
        for m in self.inner.store.timeline(include_superseded=True):
            if m.kind == PHOTO_ROOT_KIND and m.metadata.get("pipeline") == PIPELINE_VERSION:
                self._ingested[m.metadata.get("asset_id", "")] = m.frame_id
        # keep root-frame ids valid across scheduled live-set rewrites (which renumber
        # the dense id space — orchestrator/maintenance.py)
        self.inner.maintainer.remap_listeners.append(self._on_remap)

    def _on_remap(self, remap: dict[int, int]) -> None:
        self._ingested = {
            aid: remap[fid] for aid, fid in self._ingested.items() if fid in remap
        }

    def forget(self, asset_id: str) -> bool:
        """Delete an asset's root/caption/OCR frames; space is reclaimed by the
        scheduled live-set rewrite of the inner store."""
        root = self._ingested.pop(asset_id, None)
        if root is None:
            return False
        return self.inner.forget(root)

    # ---------------------------------------------------------------------- ingest ----
    def ingest(
        self,
        asset_id: str,
        image: np.ndarray | bytes | str,
        taken_at_ms: int | None = None,
        gps: tuple[float, float] | None = None,
        tags: Sequence[str] = (),
        thumbnail_ref: str | None = None,
        caption_text: str | None = None,
        ocr_texts: Sequence[str] | None = None,
    ) -> PhotoIngestResult:
        """Ingest one asset. `caption_text`/`ocr_texts` override the providers when
        the host has already run its own vision pipeline (the MCP path)."""
        if asset_id in self._ingested:
            return PhotoIngestResult(asset_id, self._ingested[asset_id], None, (), (), True)
        ts = taken_at_ms if taken_at_ms is not None else now_ms()
        base_tags = tuple(tags)
        if gps is not None:
            base_tags = base_tags + (gps_bin(*gps),)
        root_meta = {"asset_id": asset_id, "pipeline": PIPELINE_VERSION}
        if thumbnail_ref:
            root_meta["thumbnail_ref"] = thumbnail_ref
        if gps is not None:
            root_meta["gps"] = f"{gps[0]:.5f},{gps[1]:.5f}"
        root = self.inner.store.put(
            f"photo {asset_id}", kind=PHOTO_ROOT_KIND, timestamp_ms=ts, metadata=root_meta, tags=base_tags
        )

        def child(content: str, kind: str, extra_meta: dict | None = None) -> int:
            fid = self.inner.store.put(
                content,
                kind=kind,
                timestamp_ms=ts,
                parent_id=root,
                metadata={"asset_id": asset_id, **(extra_meta or {})},
                tags=base_tags,
                search_text=content,
            )
            self.inner.engine.index_text(fid, content)
            return fid

        embed_jobs: list[tuple[int, np.ndarray]] = []
        caption_frame = None
        caption = caption_text
        if caption is None and self.caption_provider is not None:
            caption = self.caption_provider.caption(image)
        if caption and caption.strip():
            caption_frame = child(caption, PHOTO_CAPTION_KIND)
            if self.mm_embedder is not None:
                embed_jobs.append((caption_frame, np.asarray(self.mm_embedder.embed_text(caption))))

        ocr_frames: list[int] = []
        if ocr_texts is not None:
            texts = [t for t in ocr_texts if t.strip()][: self.config.max_ocr_blocks]
        elif self.ocr_provider is not None:
            texts = [
                b.text
                for b in self.ocr_provider.ocr(image)
                if b.confidence >= self.config.min_ocr_confidence and b.text.strip()
            ][: self.config.max_ocr_blocks]
        else:
            texts = []
        if texts:
            summary = " ".join(texts)
            fid = child(summary, PHOTO_OCR_KIND, {"blocks": str(len(texts))})
            ocr_frames.append(fid)
            if self.mm_embedder is not None:
                embed_jobs.append((fid, np.asarray(self.mm_embedder.embed_text(summary))))

        region_frames: list[int] = []
        if self.mm_embedder is not None:
            # whole-image region frame with an image-tower embedding
            fid = child(f"image of asset {asset_id}", PHOTO_REGION_KIND, {"bbox": "0,0,1,1"})
            embed_jobs.append((fid, np.asarray(self.mm_embedder.embed_image(image))))
            region_frames.append(fid)

        if embed_jobs:
            fids = [f for f, _ in embed_jobs]
            vecs = np.stack([v for _, v in embed_jobs]).astype(np.float32)
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = np.where(norms > 0, vecs / np.maximum(norms, 1e-12), vecs)
            self.inner.store.put_embedding_batch(fids, vecs)
            self.inner.engine.index_embedding_batch(fids, vecs)

        self._ingested[asset_id] = root
        return PhotoIngestResult(asset_id, root, caption_frame, tuple(ocr_frames), tuple(region_frames))

    # ---------------------------------------------------------------------- recall ----
    def recall(
        self,
        query: str,
        top_k: int = 8,
        time_range: TimeRange | None = None,
        near: tuple[float, float] | None = None,
    ) -> list[PhotoHit]:
        """Constraint recall: optional time range and GPS-bin filter
        (reference: recall with constraint queries, location/time)."""
        embedding = None
        if self.mm_embedder is not None:
            embedding = np.asarray(self.mm_embedder.embed_text(query), np.float32).tolist()
        resp = self.inner.search(
            SearchRequest(query=query, embedding=embedding, top_k=top_k * 3, time_range=time_range)
        )
        want_bin = gps_bin(*near) if near is not None else None
        hits: list[PhotoHit] = []
        seen_assets: set[str] = set()
        for h in resp.hits:
            m = self.inner.store.frame_meta(h.frame_id)
            if m is None or not m.kind.startswith("wax.photo."):
                continue
            if want_bin is not None and want_bin not in m.tags:
                continue
            asset_id = m.metadata.get("asset_id", "")
            root = self._ingested.get(asset_id)
            root_meta = self.inner.store.frame_meta(root) if root is not None else None
            raw = self.inner.store.frame_content(h.frame_id) or b""
            hits.append(
                PhotoHit(
                    asset_id=asset_id,
                    score=h.score,
                    frame_id=h.frame_id,
                    kind=m.kind,
                    text=raw.decode("utf-8", errors="ignore"),
                    taken_at_ms=m.timestamp_ms,
                    gps=root_meta.metadata.get("gps") if root_meta else None,
                    thumbnail_ref=root_meta.metadata.get("thumbnail_ref") if root_meta else None,
                )
            )
            seen_assets.add(asset_id)
            if len(hits) >= top_k:
                break
        return hits

    def flush(self) -> int:
        return self.inner.flush()

    def close(self) -> None:
        self.inner.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class _TextTowerAdapter:
    """EmbeddingProvider view of a multimodal provider's text tower."""

    def __init__(self, mm: MultimodalEmbeddingProvider):
        self._mm = mm

    @property
    def dimensions(self) -> int:
        return self._mm.dimensions

    @property
    def identity(self) -> str:
        return f"text-tower/{self._mm.identity}"

    @property
    def normalized(self) -> bool:
        return True

    @property
    def execution_mode(self) -> str:
        from wax_tpu.embed.provider import ExecutionMode

        return ExecutionMode.ON_DEVICE_ONLY

    @property
    def batch_size(self) -> int:
        return 256

    def embed(self, text: str) -> np.ndarray:
        v = np.asarray(self._mm.embed_text(text), np.float32)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def embed_batch(self, texts):
        return np.stack([self.embed(t) for t in texts])
