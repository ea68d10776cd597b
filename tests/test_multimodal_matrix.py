"""Photo/Video behavior matrices: multi-asset combinations, forget lifecycles,
constraint stacking, provider fallbacks, budget degradation.

Extends tests/test_multimodal.py toward the reference's integration breadth
(reference: Tests/WaxIntegrationTests PhotoRAG*/VideoRAG* suites — behavior
combinations, not just happy paths).
"""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.multimodal.photo import PhotoRAGConfig, PhotoRAGOrchestrator
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


class JointEmbedder:
    """Joint-space fake: images embed near their descriptive string."""

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


# ------------------------------------------------------------------------- video ----


class TestVideoMatrix:
    def _orch(self, tmp_path, name="vm.wxs"):
        return VideoRAGOrchestrator(tmp_path / name, HashEmbedder(64), VideoRAGConfig(orchestrator=_OC))

    def test_multi_video_isolation(self, tmp_path):
        with self._orch(tmp_path) as v:
            v.ingest("cook", 20_000, StubTranscript([TranscriptSpan(0, 9_000, "bake sourdough bread")]))
            v.ingest("hike", 20_000, StubTranscript([TranscriptSpan(0, 9_000, "mountain trail sunrise")]))
            hits = v.recall("sourdough bread baking")
            assert hits and hits[0].video_id == "cook"
            hits2 = v.recall("sunrise mountain trail")
            assert hits2 and hits2[0].video_id == "hike"

    def test_span_crossing_three_segments(self, tmp_path):
        # 0..25s span overlaps segments 0,1 fully and 2 by 5s: all three indexed
        with self._orch(tmp_path) as v:
            res = v.ingest("long", 30_000, StubTranscript([TranscriptSpan(0, 25_000, "continuous narration topic")]))
            assert len(res.segment_frames) == 3

    def test_forget_lifecycle(self, tmp_path):
        spans = [TranscriptSpan(0, 8_000, "forgettable content marker")]
        with self._orch(tmp_path) as v:
            v.ingest("gone", 8_000, StubTranscript(spans))
            assert v.recall("forgettable content")
            assert v.forget("gone") is True
            assert v.forget("gone") is False  # second forget: unknown
            assert not [h for h in v.recall("forgettable content") if h.video_id == "gone"]
            # re-ingest after forget is NOT a duplicate
            r = v.ingest("gone", 8_000, StubTranscript(spans))
            assert not r.skipped_duplicate
            assert v.recall("forgettable content")

    def test_forget_persists_across_reopen(self, tmp_path):
        p = tmp_path / "fp.wxs"
        spans = [TranscriptSpan(0, 8_000, "ephemeral recording")]
        with VideoRAGOrchestrator(p, HashEmbedder(64), VideoRAGConfig(orchestrator=_OC)) as v:
            v.ingest("vid", 8_000, StubTranscript(spans))
            v.forget("vid")
            v.flush()
        with VideoRAGOrchestrator(p, HashEmbedder(64), VideoRAGConfig(orchestrator=_OC)) as v2:
            assert not [h for h in v2.recall("ephemeral recording") if h.video_id == "vid"]
            assert not v2.ingest("vid", 8_000, StubTranscript(spans)).skipped_duplicate

    def test_empty_transcript_ingest_ok(self, tmp_path):
        with self._orch(tmp_path) as v:
            res = v.ingest("silent", 20_000, StubTranscript([]))
            assert res.segment_frames == () and not res.skipped_duplicate
            # and the video is still dedupe-tracked
            assert v.ingest("silent", 20_000, StubTranscript([])).skipped_duplicate

    def test_keyframes_shorter_than_segments(self, tmp_path):
        spans = [TranscriptSpan(i * 10_000, i * 10_000 + 9_000, f"part {i} marker") for i in range(4)]
        with self._orch(tmp_path) as v:
            v.ingest("kf", 40_000, StubTranscript(spans), keyframe_refs=["only0.jpg"])
            hits = v.recall("part 3 marker", top_k=8)
            h3 = next(h for h in hits if h.segment_index == 3)
            assert h3.keyframe_ref in (None, "")  # no keyframe for segment 3

    def test_segment_limit_per_video(self, tmp_path):
        cfg = VideoRAGConfig(orchestrator=_OC, segment_limit_per_video=2)
        spans = [TranscriptSpan(i * 10_000, i * 10_000 + 9_000, f"repeated theme {i}") for i in range(6)]
        with VideoRAGOrchestrator(tmp_path / "lim.wxs", HashEmbedder(64), cfg) as v:
            v.ingest("many", 60_000, StubTranscript(spans))
            # the grouped recall enforces the per-video cap (the flat compat view
            # deliberately relaxes it to fill top_k)
            ctx = v.recall_context("repeated theme", top_k=4)
            item = next(i for i in ctx.items if i.video_id == "many")
            assert len(item.segments) <= 2

    def test_transcript_bytes_cap(self, tmp_path):
        cfg = VideoRAGConfig(orchestrator=_OC, max_transcript_bytes_per_segment=64)
        big = "word " * 200
        with VideoRAGOrchestrator(tmp_path / "cap.wxs", HashEmbedder(64), cfg) as v:
            res = v.ingest("big", 10_000, StubTranscript([TranscriptSpan(0, 9_000, big)]))
            assert res.segment_frames
            raw = v.inner.store.frame_content(res.segment_frames[0])
            assert raw is not None and len(raw) <= 80  # cap + small header slack


# ------------------------------------------------------------------------- photo ----


class TestPhotoMatrix:
    def _orch(self, tmp_path, name="pm.wxs", **kw):
        kw.setdefault("embedder", JointEmbedder())
        kw.setdefault("config", PhotoRAGConfig(orchestrator=_OC))
        return PhotoRAGOrchestrator(tmp_path / name, **kw)

    def test_no_providers_embedding_only_ingest(self, tmp_path):
        with self._orch(tmp_path) as p:
            res = p.ingest("bare", "beach.jpg", caption_text=None, ocr_texts=None)
            assert not res.skipped_duplicate
            assert res.caption_frame is None and res.ocr_block_frames == ()

    def test_ocr_confidence_filter(self, tmp_path):
        blocks = [
            OCRBlock("high confidence sign", (0.1, 0.1, 0.3, 0.1), 0.9),
            OCRBlock("noise glyphs", (0.5, 0.5, 0.2, 0.1), 0.05),
        ]
        with self._orch(tmp_path, ocr_provider=StubOCR(blocks)) as p:
            res = p.ingest("conf", np.zeros((64, 64, 3), np.uint8))
            texts = [p.inner.store.frame_content(f).decode() for f in res.ocr_block_frames]
            assert any("high confidence" in t for t in texts)
            assert not any("noise glyphs" in t for t in texts)

    def test_out_of_range_bbox_from_provider_is_clamped(self, tmp_path):
        blocks = [OCRBlock("edge text", (-0.2, 0.9, 0.5, 0.4), 0.9)]
        with self._orch(tmp_path, ocr_provider=StubOCR(blocks)) as p:
            res = p.ingest("clamp", np.arange(64 * 64 * 3, dtype=np.uint8).reshape(64, 64, 3))
            # region frames embed a valid crop — no crash, no empty-slice wrap
            assert res.root_frame >= 0

    def test_max_ocr_blocks_cap(self, tmp_path):
        cfg = PhotoRAGConfig(orchestrator=_OC, max_ocr_blocks=4)
        blocks = [OCRBlock(f"line {i}", (0.0, i / 40, 0.5, 0.02), 0.9) for i in range(40)]
        with self._orch(tmp_path, ocr_provider=StubOCR(blocks), config=cfg) as p:
            res = p.ingest("many", np.zeros((32, 32, 3), np.uint8))
            assert len(res.ocr_block_frames) <= 4

    def test_constraint_stacking_time_and_location(self, tmp_path):
        with self._orch(tmp_path) as p:
            p.ingest("paris-old", "tower.jpg", taken_at_ms=1_000, gps=(48.858, 2.294),
                     caption_text="eiffel tower at night")
            p.ingest("paris-new", "tower2.jpg", taken_at_ms=9_000, gps=(48.858, 2.294),
                     caption_text="eiffel tower at sunrise")
            p.ingest("tokyo", "tower3.jpg", taken_at_ms=9_000, gps=(35.658, 139.745),
                     caption_text="tokyo tower at sunrise")
            hits = p.recall("tower", time_range=TimeRange(5_000, None), near=(48.858, 2.294))
            ids = {h.asset_id for h in hits}
            assert "paris-new" in ids and "paris-old" not in ids and "tokyo" not in ids

    def test_forget_lifecycle_and_reingest(self, tmp_path):
        with self._orch(tmp_path) as p:
            p.ingest("temp", "cat.jpg", caption_text="a fluffy cat on a sofa")
            assert p.forget("temp") is True
            assert p.forget("temp") is False
            assert not [h for h in p.recall("fluffy cat") if h.asset_id == "temp"]
            r = p.ingest("temp", "cat.jpg", caption_text="a fluffy cat on a sofa")
            assert not r.skipped_duplicate

    def test_recall_budget_degrades_item_count(self, tmp_path):
        small = PhotoRAGConfig(orchestrator=_OC, max_text_tokens=60)
        with self._orch(tmp_path, config=small) as p:
            for i in range(6):
                p.ingest(f"a{i}", f"img{i}.jpg", caption_text=f"golden retriever playing fetch variant {i}")
            ctx = p.recall_context("golden retriever fetch", top_k=6)
            assert ctx.used_text_tokens <= 60

    def test_unicode_ocr_text(self, tmp_path):
        blocks = [OCRBlock("営業時間 9:00〜18:00", (0.1, 0.1, 0.5, 0.1), 0.95)]
        with self._orch(tmp_path, ocr_provider=StubOCR(blocks)) as p:
            p.ingest("sign", np.zeros((32, 32, 3), np.uint8))
            hits = p.recall("営業時間")
            assert hits and hits[0].asset_id == "sign"

    def test_same_asset_different_stores_independent(self, tmp_path):
        with self._orch(tmp_path, name="s1.wxs") as p1, self._orch(tmp_path, name="s2.wxs") as p2:
            p1.ingest("x", "a.jpg", caption_text="only in store one")
            assert not p2.ingest("x", "b.jpg", caption_text="only in store two").skipped_duplicate
            assert p1.recall("store one") and p2.recall("store two")
