"""Minimal self-contained PDF text extraction.

Mirrors the reference's ingest capability (reference:
Sources/Wax/Ingest/PDFTextExtractor.swift:15-43 — PDFKit text extraction capped at 500
pages, feeding remember()). No PDF library ships in this environment, so this is a
small direct parser for the common case: FlateDecode/plain content streams with
Tj/TJ/' text-showing operators and standard string escapes. Scanned/image-only or
exotic-encoding PDFs yield empty text (callers treat that as "no text", as the
reference does for blank PDFs).
"""
from __future__ import annotations

import re
import zlib
from pathlib import Path

__all__ = ["extract_pdf_text", "MAX_PAGES"]

MAX_PAGES = 500  # reference cap

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_TEXT_BLOCK_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
# (string) Tj   |   (string) '   |   [(a) -250 (b)] TJ
_TJ_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')|\[(?:[^\[\]\\]|\\.)*\]\s*TJ", re.DOTALL)
_STR_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.DOTALL)

_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _decode_pdf_string(raw: bytes) -> str:
    """Decode a parenthesized PDF literal string (escapes + octal)."""
    out = bytearray()
    i = 0
    body = raw[1:-1]
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():
                octal = body[i + 1 : i + 4]
                j = 1
                while j < 3 and i + 1 + j < len(body) and body[i + 1 + j : i + 2 + j].isdigit():
                    j += 1
                try:
                    out.append(int(body[i + 1 : i + 1 + j], 8) & 0xFF)
                except ValueError:
                    pass
                i += 1 + j
                continue
            i += 2
            continue
        out += c
        i += 1
    # PDFDocEncoding approximated as latin-1 (exact for ASCII text PDFs)
    return out.decode("latin-1", errors="ignore")


def _extract_from_content(content: bytes) -> list[str]:
    lines: list[str] = []
    for block in _TEXT_BLOCK_RE.findall(content):
        parts: list[str] = []
        for m in _TJ_RE.finditer(block):
            for s in _STR_RE.findall(m.group(0)):
                parts.append(_decode_pdf_string(s))
        if parts:
            lines.append("".join(parts))
    return lines


def extract_pdf_text(path_or_bytes: str | Path | bytes, max_pages: int = MAX_PAGES) -> str:
    """Extract visible text from a PDF; empty string when no text is found."""
    data = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else Path(path_or_bytes).read_bytes()
    )
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF file")
    pages_seen = 0
    lines: list[str] = []
    for m in _STREAM_RE.finditer(data):
        if pages_seen >= max_pages:
            break
        raw = m.group(1)
        content = None
        try:
            content = zlib.decompress(raw)
        except zlib.error:
            if b"BT" in raw and b"ET" in raw:
                content = raw
        if content is None or b"BT" not in content:
            continue
        extracted = _extract_from_content(content)
        if extracted:
            pages_seen += 1
            lines.extend(extracted)
    return "\n".join(lines).strip()
