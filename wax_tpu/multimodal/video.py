"""Video RAG: segment-level ingest + recall over host-supplied transcripts.

Mirrors the reference's VideoRAGOrchestrator (reference:
Sources/Wax/VideoRAG/VideoRAGOrchestrator.swift:22-1277 and VideoRAGConfig.swift:14-21
— 10 s segments, <= 360 segments/video, host transcript provider mapped to segments by
>= 250 ms overlap, per-segment embeddings, recall returning segment hits with evidence
and keyframe references). Frames live in a dedicated store (the reference keeps
~/.wax/video.mv2s) managed by an inner MemoryOrchestrator.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Sequence

from wax_tpu.multimodal.protocols import TranscriptProvider
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.types import SearchRequest, now_ms

__all__ = ["VideoRAGConfig", "VideoSegmentHit", "VideoIngestResult", "VideoRAGOrchestrator"]

VIDEO_ROOT_KIND = "wax.video.root"
VIDEO_SEGMENT_KIND = "wax.video.segment"
PIPELINE_VERSION = "video-v1"
_MIN_OVERLAP_MS = 250  # reference: VideoRAGProtocols.swift:36-44


@dataclass(frozen=True)
class VideoRAGConfig:
    segment_ms: int = 10_000
    max_segments_per_video: int = 360
    orchestrator: OrchestratorConfig = field(default_factory=OrchestratorConfig)


@dataclass(frozen=True)
class VideoIngestResult:
    video_id: str
    root_frame: int
    segment_frames: tuple[int, ...]
    skipped_duplicate: bool = False


@dataclass(frozen=True)
class VideoSegmentHit:
    video_id: str
    segment_index: int
    start_ms: int
    end_ms: int
    score: float
    text: str
    frame_id: int
    keyframe_ref: str | None = None


class VideoRAGOrchestrator:
    def __init__(self, store_path: str | Path, embedder=None, config: VideoRAGConfig = VideoRAGConfig()):
        self.config = config
        self.inner = MemoryOrchestrator(store_path, embedder, config.orchestrator)
        self._ingested: dict[str, int] = {}
        self._load_ingested()
        # keep root-frame ids valid across scheduled live-set rewrites (which renumber
        # the dense id space — orchestrator/maintenance.py)
        self.inner.maintainer.remap_listeners.append(self._on_remap)

    def _on_remap(self, remap: dict[int, int]) -> None:
        self._ingested = {
            vid: remap[fid] for vid, fid in self._ingested.items() if fid in remap
        }

    def _load_ingested(self) -> None:
        for m in self.inner.store.timeline(include_superseded=True):
            if m.kind == VIDEO_ROOT_KIND and m.metadata.get("pipeline") == PIPELINE_VERSION:
                self._ingested[m.metadata.get("video_id", "")] = m.frame_id

    # ---------------------------------------------------------------------- ingest ----
    def ingest(
        self,
        video_id: str,
        duration_ms: int,
        transcript_provider: TranscriptProvider,
        keyframe_refs: Sequence[str] | None = None,
        taken_at_ms: int | None = None,
    ) -> VideoIngestResult:
        """Segment the video, map transcript spans to segments by temporal overlap,
        embed and index each non-empty segment."""
        if video_id in self._ingested:
            return VideoIngestResult(video_id, self._ingested[video_id], (), skipped_duplicate=True)
        ts = taken_at_ms if taken_at_ms is not None else now_ms()
        seg_ms = self.config.segment_ms
        n_segments = min(
            max(1, -(-duration_ms // seg_ms)), self.config.max_segments_per_video
        )
        spans = list(transcript_provider.transcript(video_id))

        def seg_text(i: int) -> str:
            s0, s1 = i * seg_ms, min((i + 1) * seg_ms, duration_ms)
            parts = []
            for sp in spans:
                overlap = min(s1, sp.end_ms) - max(s0, sp.start_ms)
                if overlap >= _MIN_OVERLAP_MS:
                    parts.append(sp.text)
            return " ".join(parts)

        root = self.inner.store.put(
            f"video {video_id}",
            kind=VIDEO_ROOT_KIND,
            timestamp_ms=ts,
            metadata={
                "video_id": video_id,
                "duration_ms": str(duration_ms),
                "segments": str(n_segments),
                "pipeline": PIPELINE_VERSION,
            },
        )
        seg_frames: list[int] = []
        texts_to_embed: list[tuple[int, str]] = []
        for i in range(n_segments):
            text = seg_text(i)
            if not text.strip():
                continue
            meta = {
                "video_id": video_id,
                "segment_index": str(i),
                "start_ms": str(i * seg_ms),
                "end_ms": str(min((i + 1) * seg_ms, duration_ms)),
            }
            if keyframe_refs is not None and i < len(keyframe_refs):
                meta["keyframe_ref"] = keyframe_refs[i]
            fid = self.inner.store.put(
                text,
                kind=VIDEO_SEGMENT_KIND,
                timestamp_ms=ts + i * seg_ms,
                parent_id=root,
                metadata=meta,
                search_text=text,
            )
            self.inner.engine.index_text(fid, text)
            texts_to_embed.append((fid, text))
            seg_frames.append(fid)
        if texts_to_embed and self.inner.config.enable_vector_search:
            fids = [f for f, _ in texts_to_embed]
            vecs = self.inner.memoizer.embed_batch([t for _, t in texts_to_embed])
            self.inner.store.put_embedding_batch(fids, vecs)
            self.inner.engine.index_embedding_batch(fids, vecs)
        self._ingested[video_id] = root
        return VideoIngestResult(video_id, root, tuple(seg_frames))

    # ---------------------------------------------------------------------- recall ----
    def recall(self, query: str, top_k: int = 8) -> list[VideoSegmentHit]:
        resp = self.inner.search(SearchRequest(query=query, top_k=top_k * 2))
        hits: list[VideoSegmentHit] = []
        for h in resp.hits:
            m = self.inner.store.frame_meta(h.frame_id)
            if m is None or m.kind != VIDEO_SEGMENT_KIND:
                continue
            raw = self.inner.store.frame_content(h.frame_id) or b""
            hits.append(
                VideoSegmentHit(
                    video_id=m.metadata.get("video_id", ""),
                    segment_index=int(m.metadata.get("segment_index", "0")),
                    start_ms=int(m.metadata.get("start_ms", "0")),
                    end_ms=int(m.metadata.get("end_ms", "0")),
                    score=h.score,
                    text=raw.decode("utf-8", errors="ignore"),
                    frame_id=h.frame_id,
                    keyframe_ref=m.metadata.get("keyframe_ref"),
                )
            )
            if len(hits) >= top_k:
                break
        return hits

    def forget(self, video_id: str) -> bool:
        """Delete a video's root and segment frames; space is reclaimed by the
        scheduled live-set rewrite (reference: the maintenance policy of the inner
        store applies to multimodal frames identically)."""
        root = self._ingested.pop(video_id, None)
        if root is None:
            return False
        return self.inner.forget(root)

    def flush(self) -> int:
        return self.inner.flush()

    def close(self) -> None:
        self.inner.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
