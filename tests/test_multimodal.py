"""Photo/Video RAG: ingest data models, transcript mapping, GPS/time constraints,
dedupe, recall with evidence.

Stub providers mirror the reference's mocks (Mocks/MockProviders.swift:5-47:
StubOCRProvider, StubCaptionProvider, StubTranscriptProvider;
MockEmbedders.swift DeterministicMultimodalEmbedder).
"""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.multimodal.photo import PhotoRAGConfig, PhotoRAGOrchestrator, gps_bin
from wax_tpu.multimodal.protocols import OCRBlock, TranscriptSpan
from wax_tpu.multimodal.video import VideoRAGConfig, VideoRAGOrchestrator
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.storage.store import StoreOptions
from wax_tpu.types import TimeRange

_OC = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))


class StubTranscript:
    def __init__(self, spans):
        self.spans = spans

    def transcript(self, video_ref):
        return self.spans


class StubOCR:
    def __init__(self, blocks):
        self.blocks = blocks

    def ocr(self, image):
        return self.blocks


class StubCaption:
    def __init__(self, text):
        self.text = text

    def caption(self, image):
        return self.text


class DeterministicMultimodalEmbedder:
    """Hash text; images embed near their descriptive text (joint space fake)."""

    def __init__(self, dim=64):
        self._h = HashEmbedder(dim)

    @property
    def dimensions(self):
        return self._h.dimensions

    @property
    def identity(self):
        return "det-multimodal"

    def embed_text(self, text):
        return self._h.embed(text)

    def embed_image(self, image):
        return self._h.embed(f"image:{image if isinstance(image, str) else 'pixels'}")


class TestVideoRAG:
    def test_ingest_and_recall_segments(self, tmp_path):
        spans = [
            TranscriptSpan(0, 9_000, "welcome to the cooking show"),
            TranscriptSpan(9_500, 21_000, "today we bake sourdough bread"),
            TranscriptSpan(21_500, 30_000, "let the dough rest overnight"),
        ]
        cfg = VideoRAGConfig(orchestrator=_OC)
        with VideoRAGOrchestrator(tmp_path / "v.wxs", HashEmbedder(64), cfg) as v:
            res = v.ingest("vid1", duration_ms=30_000, transcript_provider=StubTranscript(spans),
                           keyframe_refs=["kf0.jpg", "kf1.jpg", "kf2.jpg"])
            assert len(res.segment_frames) == 3
            hits = v.recall("baking sourdough bread")
            assert hits and hits[0].video_id == "vid1"
            assert hits[0].segment_index == 1
            assert hits[0].start_ms == 10_000 and hits[0].keyframe_ref == "kf1.jpg"

    def test_overlap_threshold_250ms(self, tmp_path):
        # span overlaps segment 1 by only 200ms -> excluded from it
        spans = [TranscriptSpan(9_800, 10_200, "tiny overlap marker")]
        with VideoRAGOrchestrator(tmp_path / "v.wxs", HashEmbedder(64), VideoRAGConfig(orchestrator=_OC)) as v:
            res = v.ingest("vid2", duration_ms=20_000, transcript_provider=StubTranscript(spans))
            assert len(res.segment_frames) == 0  # no segment gets >=250ms of it

    def test_dedupe_by_video_id(self, tmp_path):
        spans = [TranscriptSpan(0, 5_000, "hello world")]
        with VideoRAGOrchestrator(tmp_path / "v.wxs", HashEmbedder(64), VideoRAGConfig(orchestrator=_OC)) as v:
            r1 = v.ingest("vid3", 5_000, StubTranscript(spans))
            r2 = v.ingest("vid3", 5_000, StubTranscript(spans))
            assert not r1.skipped_duplicate and r2.skipped_duplicate

    def test_max_segments_cap(self, tmp_path):
        spans = [TranscriptSpan(i * 10_000, i * 10_000 + 9_000, f"part {i}") for i in range(500)]
        cfg = VideoRAGConfig(orchestrator=_OC)
        with VideoRAGOrchestrator(tmp_path / "v.wxs", HashEmbedder(64), cfg) as v:
            res = v.ingest("vid4", duration_ms=5_000_000, transcript_provider=StubTranscript(spans))
            assert len(res.segment_frames) <= cfg.max_segments_per_video

    def test_persistence(self, tmp_path):
        spans = [TranscriptSpan(0, 8_000, "persistent transcript content")]
        p = tmp_path / "v.wxs"
        with VideoRAGOrchestrator(p, HashEmbedder(64), VideoRAGConfig(orchestrator=_OC)) as v:
            v.ingest("vid5", 8_000, StubTranscript(spans))
            v.flush()
        with VideoRAGOrchestrator(p, HashEmbedder(64), VideoRAGConfig(orchestrator=_OC)) as v2:
            assert v2.ingest("vid5", 8_000, StubTranscript(spans)).skipped_duplicate
            assert v2.recall("persistent transcript")


class TestPhotoRAG:
    def _orch(self, tmp_path):
        return PhotoRAGOrchestrator(
            tmp_path / "p.wxs",
            embedder=DeterministicMultimodalEmbedder(),
            ocr_provider=StubOCR([OCRBlock("EXIT sign above the door", confidence=0.9)]),
            caption_provider=StubCaption("a red door in a brick wall"),
            config=PhotoRAGConfig(orchestrator=_OC),
        )

    def test_ingest_creates_frames(self, tmp_path):
        with self._orch(tmp_path) as p:
            res = p.ingest("asset1", "img1", taken_at_ms=1_700_000_000_000,
                           gps=(41.39, 2.17), thumbnail_ref="thumb1.jpg")
            assert res.caption_frame is not None
            assert res.ocr_frames and res.region_frames

    def test_recall_by_caption_and_ocr(self, tmp_path):
        with self._orch(tmp_path) as p:
            p.ingest("asset1", "img1", taken_at_ms=1_700_000_000_000, gps=(41.39, 2.17))
            hits = p.recall("red door brick")
            assert hits and hits[0].asset_id == "asset1"
            hits2 = p.recall("exit sign")
            assert hits2 and hits2[0].kind == "wax.photo.ocr"

    def test_gps_constraint(self, tmp_path):
        with self._orch(tmp_path) as p:
            p.ingest("bcn", "img1", gps=(41.39, 2.17))
            p.ingest("nyc", "img2", gps=(40.71, -74.00))
            hits = p.recall("red door brick", near=(41.3901, 2.1702))
            assert hits and all(h.asset_id == "bcn" for h in hits)

    def test_time_constraint(self, tmp_path):
        with self._orch(tmp_path) as p:
            p.ingest("old", "img1", taken_at_ms=1_000_000)
            p.ingest("new", "img2", taken_at_ms=2_000_000)
            hits = p.recall("red door", time_range=TimeRange(after_ms=1_500_000))
            assert hits and all(h.asset_id == "new" for h in hits)

    def test_dedupe(self, tmp_path):
        with self._orch(tmp_path) as p:
            assert not p.ingest("a", "img").skipped_duplicate
            assert p.ingest("a", "img").skipped_duplicate

    def test_gps_bin(self):
        assert gps_bin(41.39222, 2.17111) == gps_bin(41.39, 2.17)
        assert gps_bin(41.39, 2.17) != gps_bin(40.71, -74.0)

    def test_ocr_block_frames_carry_bbox_and_confidence(self, tmp_path):
        # per-block frames with bbox + confidence metadata, not lex-indexed
        # (reference: ingestOne :585-607 — blocks stored, only the summary indexed)
        blocks = [
            OCRBlock("EXIT", bbox=(0.1, 0.1, 0.2, 0.05), confidence=0.95),
            OCRBlock("FIRE HOSE", bbox=(0.6, 0.7, 0.3, 0.1), confidence=0.80),
        ]
        with PhotoRAGOrchestrator(
            tmp_path / "p.wxs",
            embedder=DeterministicMultimodalEmbedder(),
            ocr_provider=StubOCR(blocks),
            config=PhotoRAGConfig(orchestrator=_OC),
        ) as p:
            res = p.ingest("a1", "img")
            assert len(res.ocr_block_frames) == 2
            m = p.inner.store.frame_meta(res.ocr_block_frames[0])
            assert m.metadata["bbox"] == "0.1000,0.1000,0.2000,0.0500"
            assert m.metadata["confidence"] == "0.950"
            assert m.search_text is None  # blocks are evidence, not a search lane
            sm = p.inner.store.frame_meta(res.ocr_summary_frame)
            assert sm.search_text  # the summary IS indexed

    def test_region_frames_from_ocr_bboxes(self, tmp_path):
        # overlapping blocks merge into one region; disjoint blocks get their own
        # (reference: proposeRegions :1246-1262)
        blocks = [
            OCRBlock("A", bbox=(0.1, 0.1, 0.2, 0.1), confidence=0.9),
            OCRBlock("B", bbox=(0.15, 0.12, 0.2, 0.1), confidence=0.9),  # overlaps A
            OCRBlock("C", bbox=(0.7, 0.8, 0.1, 0.1), confidence=0.9),
        ]
        with PhotoRAGOrchestrator(
            tmp_path / "p.wxs",
            embedder=DeterministicMultimodalEmbedder(),
            ocr_provider=StubOCR(blocks),
            config=PhotoRAGConfig(orchestrator=_OC),
        ) as p:
            res = p.ingest("a1", "img")
            assert len(res.region_frames) == 2
            metas = [p.inner.store.frame_meta(f) for f in res.region_frames]
            assert all("bbox" in m.metadata for m in metas)

    def test_pipeline_version_bump_reingests(self, tmp_path):
        # same version -> duplicate skip; bumped version -> re-ingest, old root gone
        # (reference: dedupe by asset id + pipeline version, ingestOne :462-466)
        emb = DeterministicMultimodalEmbedder()
        p = PhotoRAGOrchestrator(
            tmp_path / "p.wxs", embedder=emb,
            config=PhotoRAGConfig(orchestrator=_OC, pipeline_version="v1"),
        )
        r1 = p.ingest("a1", "img", caption_text="old caption about canals")
        assert p.ingest("a1", "img").skipped_duplicate
        p.flush()
        p.close()
        p2 = PhotoRAGOrchestrator(
            tmp_path / "p.wxs", embedder=emb,
            config=PhotoRAGConfig(orchestrator=_OC, pipeline_version="v2"),
        )
        r2 = p2.ingest("a1", "img", caption_text="new caption about canals")
        assert not r2.skipped_duplicate
        assert r2.superseded_root == r1.root_frame
        hits = p2.recall("caption about canals")
        assert hits and hits[0].frame_id != r1.caption_frame
        assert all(h.text != "old caption about canals" for h in hits)
        p2.close()

    def test_recall_aggregates_by_asset_with_evidence(self, tmp_path):
        with self._orch(tmp_path) as p:
            p.ingest("asset1", "img1", tags=["holiday"])
            hits = p.recall("red door exit sign")
            # one item per asset, not one per matching child frame
            assert len([h for h in hits if h.asset_id == "asset1"]) == 1
            h = hits[0]
            assert h.evidence and set(h.evidence) <= {"vector", "text", "region", "timeline", "structured"}
            assert "a red door in a brick wall" in h.summary
            assert "EXIT sign above the door" in h.summary

    def test_recall_summary_respects_token_budget(self, tmp_path):
        from wax_tpu.text.token_counter import TokenCounter

        blocks = [OCRBlock(f"line {i} with several words of text", confidence=0.9) for i in range(30)]
        with PhotoRAGOrchestrator(
            tmp_path / "p.wxs",
            embedder=DeterministicMultimodalEmbedder(),
            ocr_provider=StubOCR(blocks),
            caption_provider=StubCaption("busy poster full of text"),
            config=PhotoRAGConfig(orchestrator=_OC, max_text_tokens=40),
        ) as p:
            p.ingest("a1", "img")
            ctx = p.recall_context("poster text")
            assert ctx.items
            assert ctx.used_text_tokens <= 40
            tc = TokenCounter.shared()
            assert all(tc.count(i.summary) <= 40 for i in ctx.items)


class TestMultimodalMaintenance:
    """Forget + live-set rewrite through the multimodal wrappers (the scheduled
    maintenance policy of the inner store applies to video/photo frames)."""

    def test_video_forget_and_rewrite_remaps_roots(self, tmp_path):
        spans_a = [TranscriptSpan(0, 9_000, "alpha topic segment")]
        spans_b = [TranscriptSpan(0, 9_000, "bravo topic segment")]
        with VideoRAGOrchestrator(tmp_path / "v.wxs", HashEmbedder(64), VideoRAGConfig(orchestrator=_OC)) as v:
            v.ingest("vid-a", 10_000, StubTranscript(spans_a))
            v.ingest("vid-b", 10_000, StubTranscript(spans_b))
            assert v.forget("vid-a")
            assert not v.forget("vid-a")  # already gone
            v.flush()
            report = v.inner.maintainer.rewrite_live_set()
            assert report.executed and report.frames_after < report.frames_before
            # surviving root id was remapped and recall still works
            assert "vid-b" in v._ingested and "vid-a" not in v._ingested
            root_meta = v.inner.store.frame_meta(v._ingested["vid-b"][0])
            assert root_meta.metadata["video_id"] == "vid-b"
            hits = v.recall("bravo topic")
            assert hits and hits[0].video_id == "vid-b"
            assert not [h for h in v.recall("alpha topic") if h.video_id == "vid-a"]
            # re-ingest of the forgotten video is NOT a duplicate skip
            res = v.ingest("vid-a", 10_000, StubTranscript(spans_a))
            assert not res.skipped_duplicate

    def test_photo_forget_and_rewrite_remaps_roots(self, tmp_path):
        emb = DeterministicMultimodalEmbedder()
        cfg = PhotoRAGConfig(orchestrator=_OC)
        with PhotoRAGOrchestrator(tmp_path / "p.wxs", embedder=emb, config=cfg) as p:
            p.ingest("img-1", image="sunset", caption_text="a sunset over the bay")
            p.ingest("img-2", image="mountain", caption_text="a mountain trail hike")
            assert p.forget("img-1")
            p.flush()
            report = p.inner.maintainer.rewrite_live_set()
            assert report.executed
            assert "img-2" in p._ingested and "img-1" not in p._ingested
            hits = p.recall("mountain trail")
            assert hits and hits[0].asset_id == "img-2"
            assert not [h for h in p.recall("sunset bay") if h.asset_id == "img-1"]
