"""PDF text extraction + file ingest (reference: PDFIngestTests with blank/text PDF
fixtures)."""
import zlib

import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.orchestrator.config import OrchestratorConfig
from wax_tpu.orchestrator.orchestrator import MemoryOrchestrator
from wax_tpu.storage.store import StoreOptions
from wax_tpu.text.pdf import extract_pdf_text


def _make_pdf(texts: list[str], compress: bool = False) -> bytes:
    """Tiny single-object PDF with one content stream per text line."""
    parts = [b"%PDF-1.4\n"]
    for i, t in enumerate(texts):
        content = f"BT /F1 12 Tf 72 720 Td ({t}) Tj ET".encode("latin-1")
        if compress:
            content = zlib.compress(content)
        parts.append(
            b"%d 0 obj\n<< /Length %d %s>>\nstream\n" % (i + 1, len(content),
            b"/Filter /FlateDecode " if compress else b"")
        )
        parts.append(content)
        parts.append(b"\nendstream\nendobj\n")
    parts.append(b"%%EOF\n")
    return b"".join(parts)


class TestExtraction:
    def test_plain_stream(self):
        pdf = _make_pdf(["Hello PDF world", "Second page line"])
        out = extract_pdf_text(pdf)
        assert "Hello PDF world" in out and "Second page line" in out

    def test_flate_stream(self):
        pdf = _make_pdf(["Compressed content here"], compress=True)
        assert "Compressed content here" in extract_pdf_text(pdf)

    def test_escapes(self):
        pdf = _make_pdf([r"paren \( inside \) and backslash \\ done"])
        out = extract_pdf_text(pdf)
        assert "paren ( inside )" in out and "backslash \\ done" in out

    def test_tj_array(self):
        content = b"BT [(Hel) -250 (lo ar) 10 (ray)] TJ ET"
        header = f"1 0 obj\n<< /Length {len(content)} >>\nstream\n".encode()
        pdf = b"%PDF-1.4\n" + header + content + b"\nendstream\nendobj\n%%EOF"
        assert "Helloarray" in extract_pdf_text(pdf).replace(" ", "")

    def test_blank_pdf_empty(self):
        pdf = b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n%%EOF"
        assert extract_pdf_text(pdf) == ""

    def test_not_a_pdf(self):
        with pytest.raises(ValueError):
            extract_pdf_text(b"plain text")

    def test_page_cap(self):
        pdf = _make_pdf([f"page {i}" for i in range(10)])
        out = extract_pdf_text(pdf, max_pages=3)
        assert "page 2" in out and "page 9" not in out


class TestFileIngest:
    def test_ingest_pdf_and_text(self, tmp_path):
        cfg = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))
        pdf_path = tmp_path / "doc.pdf"
        pdf_path.write_bytes(_make_pdf(["The treasury report shows surplus growth"]))
        txt_path = tmp_path / "note.txt"
        txt_path.write_text("Reminder: rotate the backup keys on friday")
        with MemoryOrchestrator(tmp_path / "m.wxs", HashEmbedder(64), cfg) as o:
            r1 = o.remember_file(pdf_path)
            r2 = o.remember_file(txt_path)
            assert o.store.frame_meta(r1.document_id).metadata["source_file"] == "doc.pdf"
            hits = o.search("treasury surplus").hits
            assert hits and hits[0].frame_id == r1.document_id
            hits = o.search("rotate backup keys").hits
            assert hits and hits[0].frame_id == r2.document_id

    def test_blank_pdf_raises(self, tmp_path):
        cfg = OrchestratorConfig(store=StoreOptions(wal_size=512 * 1024))
        p = tmp_path / "blank.pdf"
        p.write_bytes(b"%PDF-1.4\n%%EOF")
        with MemoryOrchestrator(tmp_path / "m.wxs", HashEmbedder(64), cfg) as o:
            with pytest.raises(ValueError):
                o.remember_file(p)
