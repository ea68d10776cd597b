"""CommandOCRProvider: tesseract-CLI adapter driven by a stub binary.

Mirrors the reference's VisionOCRProvider contract (per-block text + normalized
bbox + confidence) without needing tesseract installed: a fake executable on PATH
prints canned TSV, exercising the real subprocess/TSV-grouping/normalization path.
"""
import os
import stat

import numpy as np
import pytest

from wax_tpu.multimodal.ocr import CommandOCRProvider, write_pnm

TSV = """level\tpage_num\tblock_num\tpar_num\tline_num\tword_num\tleft\ttop\twidth\theight\tconf\ttext
1\t1\t0\t0\t0\t0\t0\t0\t200\t100\t-1\t
5\t1\t1\t1\t1\t1\t10\t10\t50\t12\t96.5\tHello
5\t1\t1\t1\t1\t2\t70\t10\t60\t12\t91.2\tworld
5\t1\t1\t1\t2\t1\t10\t40\t80\t12\t88.0\tsecond
5\t1\t1\t1\t2\t2\t100\t40\t40\t12\t12.0\tline
5\t1\t2\t1\t1\t1\t10\t80\t100\t12\t45.0\tlowconf
5\t1\t1\t1\t3\t1\t10\t60\t30\t12\t-1\t
"""


@pytest.fixture()
def fake_tesseract(tmp_path, monkeypatch):
    exe = tmp_path / "tesseract"
    exe.write_text("#!/bin/sh\n" f"cat <<'EOF'\n{TSV}EOF\n")
    exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    return str(exe)


class TestWritePnm:
    def test_gray_and_rgb(self, tmp_path):
        g = (np.arange(12, dtype=np.uint8).reshape(3, 4))
        h, w = write_pnm(g, tmp_path / "g.pgm")
        assert (h, w) == (3, 4)
        raw = (tmp_path / "g.pgm").read_bytes()
        assert raw.startswith(b"P5\n4 3\n255\n") and raw.endswith(g.tobytes())
        c = np.zeros((2, 2, 3), np.uint8)
        write_pnm(c, tmp_path / "c.ppm")
        assert (tmp_path / "c.ppm").read_bytes().startswith(b"P6\n2 2\n255\n")

    def test_float_input_rescaled(self, tmp_path):
        f = np.linspace(0.0, 1.0, 16).reshape(4, 4)
        write_pnm(f, tmp_path / "f.pgm")
        raw = (tmp_path / "f.pgm").read_bytes()
        assert raw[-1] == 255 and raw.split(b"\n", 3)[3][0] == 0

    def test_bad_shape_raises(self, tmp_path):
        with pytest.raises(ValueError):
            write_pnm(np.zeros((2, 2, 5), np.uint8), tmp_path / "x.pnm")


class TestCommandOCR:
    def test_available(self, fake_tesseract):
        assert CommandOCRProvider.available()

    def test_lines_grouped_with_bboxes(self, fake_tesseract):
        p = CommandOCRProvider()
        blocks = p.ocr(np.zeros((100, 200), np.uint8))
        texts = [b.text for b in blocks]
        assert "Hello world" in texts and "second line" in texts and "lowconf" in texts
        hello = next(b for b in blocks if b.text == "Hello world")
        # words span x 10..130 of 200, y 10..22 of 100
        assert hello.bbox == pytest.approx((10 / 200, 10 / 100, 120 / 200, 12 / 100))
        assert hello.confidence == pytest.approx((96.5 + 91.2) / 200.0)

    def test_min_confidence_filters_lines(self, fake_tesseract):
        p = CommandOCRProvider(min_confidence=0.5)
        texts = [b.text for b in p.ocr(np.zeros((100, 200), np.uint8))]
        assert "Hello world" in texts and "second line" in texts and "lowconf" not in texts

    def test_missing_binary_unavailable_and_empty(self, monkeypatch, tmp_path):
        monkeypatch.setenv("PATH", str(tmp_path))  # empty PATH dir
        assert not CommandOCRProvider.available()
        assert CommandOCRProvider().ocr(np.zeros((4, 4), np.uint8)) == []

    def test_failing_binary_yields_empty(self, tmp_path, monkeypatch):
        exe = tmp_path / "tesseract"
        exe.write_text("#!/bin/sh\nexit 3\n")
        exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", str(tmp_path))
        assert CommandOCRProvider().ocr(np.zeros((4, 4), np.uint8)) == []

    def test_garbage_output_yields_empty(self, tmp_path, monkeypatch):
        exe = tmp_path / "tesseract"
        exe.write_text("#!/bin/sh\necho 'not a tsv at all'\n")
        exe.chmod(exe.stat().st_mode | stat.S_IEXEC)
        monkeypatch.setenv("PATH", str(tmp_path))
        assert CommandOCRProvider().ocr(np.zeros((4, 4), np.uint8)) == []

    def test_photo_rag_integration(self, fake_tesseract, tmp_path):
        from wax_tpu.embed.hash_embedder import HashEmbedder
        from wax_tpu.multimodal.photo import PhotoRAGConfig, PhotoRAGOrchestrator
        from wax_tpu.orchestrator.config import OrchestratorConfig
        from wax_tpu.storage.store import StoreOptions

        class JE:
            dimensions = 64
            identity = "je"

            def __init__(self):
                self._h = HashEmbedder(64)

            def embed_text(self, t):
                return self._h.embed(t)

            def embed_image(self, i):
                return self._h.embed("img")

        cfg = PhotoRAGConfig(orchestrator=OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024)))
        with PhotoRAGOrchestrator(
            tmp_path / "p.wxs", embedder=JE(), ocr_provider=CommandOCRProvider(), config=cfg
        ) as p:
            res = p.ingest("shot", np.zeros((100, 200), np.uint8))
            assert res.ocr_block_frames  # tesseract-adapter blocks became frames
            hits = p.recall("Hello world")
            assert hits and hits[0].asset_id == "shot"


TSV_MANY_LINES = "level\tpage_num\tblock_num\tpar_num\tline_num\tword_num\tleft\ttop\twidth\theight\tconf\ttext\n" + "".join(
    f"5\t1\t1\t1\t{ln}\t1\t10\t{ln*10}\t50\t8\t90.0\tline{ln}\n" for ln in range(1, 13)
)


class TestLineOrdering:
    def test_numeric_line_order_not_lexicographic(self, tmp_path, monkeypatch):
        import stat as stat_mod

        exe = tmp_path / "tesseract"
        exe.write_text("#!/bin/sh\n" f"cat <<'EOF'\n{TSV_MANY_LINES}EOF\n")
        exe.chmod(exe.stat().st_mode | stat_mod.S_IEXEC)
        monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
        blocks = CommandOCRProvider().ocr(np.zeros((200, 100), np.uint8))
        texts = [b.text for b in blocks]
        assert texts == [f"line{i}" for i in range(1, 13)]  # 2 before 10, not after
