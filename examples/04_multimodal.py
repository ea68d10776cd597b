"""Photo + video memory: ingest with OCR/caption/transcript providers, recall with
location/time constraints.

The analogue of the reference's PhotoRAG / VideoRAG orchestrators. Caption/OCR/
transcript content is passed inline here (the MCP-server path); plug real OCR/
caption/ASR behind the provider protocols in wax_tpu/multimodal/protocols.py.
Run: python examples/04_multimodal.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("WAX_EXAMPLES_FORCE_CPU"):  # tests run the examples on CPU
    jax.config.update("jax_platforms", "cpu")

from wax_tpu.multimodal.photo import PhotoRAGOrchestrator
from wax_tpu.multimodal.protocols import TranscriptSpan
from wax_tpu.multimodal.video import VideoRAGOrchestrator


def main() -> None:
    with tempfile.TemporaryDirectory() as d:
        photos = PhotoRAGOrchestrator(os.path.join(d, "photos.wxs"))
        photos.ingest(
            "harbor-001",
            image="harbor-001",  # opaque ref; real pipelines pass pixels/bytes
            caption_text="sailboats in the harbor at sunset",
            ocr_texts=["PIER 39", "NO PARKING"],
            gps=(37.8087, -122.4098),
            taken_at_ms=1_700_000_000_000,
        )
        hits = photos.recall("sunset sailboats")
        print("photo hit:", hits[0].asset_id)
        near = photos.recall("pier sign", near=(37.8087, -122.4098))
        print("ocr near-hit:", near[0].asset_id)
        photos.close()

        videos = VideoRAGOrchestrator(os.path.join(d, "videos.wxs"))
        spans = [
            TranscriptSpan(0, 15_000, "today we prune the roses"),
            TranscriptSpan(15_000, 40_000, "cut above the leaf node"),
        ]

        class InlineTranscript:
            def transcript(self, ref):
                return spans

        videos.ingest("tutorial-7", 60_000, InlineTranscript())
        vhits = videos.recall("pruning roses")
        print("video hit:", vhits[0].video_id, f"@{vhits[0].start_ms}-{vhits[0].end_ms}ms")
        videos.close()


if __name__ == "__main__":
    main()
