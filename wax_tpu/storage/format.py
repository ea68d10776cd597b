"""WXS1 single-file snapshot format: dual header pages, TOC, footer, manifests.

TPU-build redesign of the reference's MV2S format (reference:
Sources/WaxCore/FileFormat/ — MV2SHeaderPage.swift:3-340 dual 4 KiB headers with
generation + checksum + optional WAL replay snapshot; MV2STOC.swift:42-253 dense frame
array + index manifests + segment catalog; MV2SFooter.swift:1-86 64-byte footer;
FooterScanner.swift:20-267 bounded backward scan; Constants.swift:4-55). The layout
keeps the same crash-safety recipe — append-only data, atomic footer+header flip —
with segment manifests generalized to the TPU index set (lex CSR / dense vectors /
graph adjacency / structured store) stored as checksummed array blobs.

File layout:
    [header A: 4 KiB][header B: 4 KiB][WAL ring: wal_size][data region ...]
Data region holds payload frames, index segment blobs, TOCs and footers, all
append-only; commits write TOC -> footer -> alternate header.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass, field, replace

from wax_tpu.storage.codec import BinaryDecoder, BinaryEncoder, CodecError
from wax_tpu.types import FrameMeta

__all__ = [
    "MAGIC",
    "FOOTER_MAGIC",
    "HEADER_SIZE",
    "HEADER_REGION",
    "FOOTER_SIZE",
    "FOOTER_ALIGN",
    "FOOTER_SCAN_BOUND",
    "DEFAULT_WAL_SIZE",
    "FORMAT_VERSION",
    "HeaderPage",
    "ReplaySnapshot",
    "SegmentManifest",
    "StoreTOC",
    "Footer",
    "encode_frame_meta",
    "decode_frame_meta",
    "select_valid_header",
    "scan_all_footers",
    "scan_for_footer",
]

MAGIC = b"WXS1"
FOOTER_MAGIC = b"WXS1FOOT"
FORMAT_VERSION = 1
HEADER_SIZE = 4096
HEADER_REGION = 2 * HEADER_SIZE
FOOTER_SIZE = 64
FOOTER_ALIGN = 64
FOOTER_SCAN_BOUND = 32 * 1024 * 1024  # reference Constants.swift:53
DEFAULT_WAL_SIZE = 16 * 1024 * 1024


def sha256(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


# -- header -----------------------------------------------------------------------------


@dataclass(frozen=True)
class ReplaySnapshot:
    """WAL scan state persisted in the header so open() can skip the full WAL scan
    (reference: MV2SHeaderPage.swift:22-48, used Wax.swift:607-650)."""

    wal_write_pos: int
    wal_last_seq: int
    pending_bytes: int


@dataclass(frozen=True)
class HeaderPage:
    header_gen: int
    file_gen: int
    footer_offset: int
    wal_offset: int
    wal_size: int
    committed_seq: int
    replay_snapshot: ReplaySnapshot | None = None
    format_version: int = FORMAT_VERSION

    def encode(self) -> bytes:
        e = BinaryEncoder()
        e.raw(MAGIC).u32(self.format_version)
        e.u64(self.header_gen).u64(self.file_gen).u64(self.footer_offset)
        e.u64(self.wal_offset).u64(self.wal_size).u64(self.committed_seq)
        e.boolean(self.replay_snapshot is not None)
        if self.replay_snapshot is not None:
            s = self.replay_snapshot
            e.u64(s.wal_write_pos).u64(s.wal_last_seq).u64(s.pending_bytes)
        body = e.data()
        page = body + sha256(body)
        assert len(page) <= HEADER_SIZE
        return page + b"\x00" * (HEADER_SIZE - len(page))

    @classmethod
    def decode(cls, page: bytes) -> "HeaderPage":
        if len(page) < 64 or page[:4] != MAGIC:
            raise CodecError("bad header magic")
        d = BinaryDecoder(page, 4)
        version = d.u32()
        header_gen = d.u64()
        file_gen = d.u64()
        footer_offset = d.u64()
        wal_offset = d.u64()
        wal_size = d.u64()
        committed_seq = d.u64()
        snap = None
        if d.boolean():
            snap = ReplaySnapshot(d.u64(), d.u64(), d.u64())
        body_len = d.offset
        digest = page[body_len : body_len + 32]
        if digest != sha256(page[:body_len]):
            raise CodecError("header checksum mismatch")
        return cls(header_gen, file_gen, footer_offset, wal_offset, wal_size, committed_seq, snap, version)


def select_valid_header(page_a: bytes, page_b: bytes) -> tuple[HeaderPage, int] | None:
    """Pick the newest valid header page; returns (header, slot 0|1) or None
    (reference: MV2SHeaderPage.selectValidPage :309)."""
    best: tuple[HeaderPage, int] | None = None
    for slot, page in ((0, page_a), (1, page_b)):
        try:
            h = HeaderPage.decode(page)
        except CodecError:
            continue
        if best is None or h.header_gen > best[0].header_gen:
            best = (h, slot)
    return best


# -- frame meta codec ---------------------------------------------------------------------


def encode_frame_meta(m: FrameMeta, payload_offset: int, payload_len: int, payload_sha: bytes, encoding: int) -> bytes:
    e = BinaryEncoder()
    e.i64(m.frame_id).i64(m.timestamp_ms).string(m.kind)
    e.opt_string(m.search_text)
    e.str_map(dict(m.metadata)).str_list(list(m.tags))
    e.opt_i64(m.parent_id).opt_i64(m.chunk_index).opt_i64(m.chunk_count)
    e.string(m.status).opt_i64(m.supersedes).opt_i64(m.superseded_by)
    e.u64(payload_offset).u64(payload_len).raw(payload_sha).u8(encoding)
    return e.data()


def decode_frame_meta(d: BinaryDecoder) -> tuple[FrameMeta, int, int, bytes, int]:
    frame_id = d.i64()
    ts = d.i64()
    kind = d.string()
    search_text = d.opt_string()
    metadata = d.str_map()
    tags = tuple(d.str_list())
    parent_id = d.opt_i64()
    chunk_index = d.opt_i64()
    chunk_count = d.opt_i64()
    status = d.string()
    supersedes = d.opt_i64()
    superseded_by = d.opt_i64()
    off = d.u64()
    ln = d.u64()
    sha = d.raw(32)
    encoding = d.u8()
    meta = FrameMeta(
        frame_id=frame_id,
        timestamp_ms=ts,
        kind=kind,
        search_text=search_text,
        metadata=metadata,
        tags=tags,
        parent_id=parent_id,
        chunk_index=chunk_index,
        chunk_count=chunk_count,
        status=status,
        supersedes=supersedes,
        superseded_by=superseded_by,
    )
    return meta, off, ln, sha, encoding


# -- TOC ----------------------------------------------------------------------------------


@dataclass(frozen=True)
class SegmentManifest:
    """Committed index blob descriptor (reference: IndexManifests.swift:1-156 +
    SegmentCatalog.swift:1-122 unified — kind in {"lex","vec","graph","structured"})."""

    kind: str
    offset: int
    length: int
    sha: bytes
    version: int = 1
    # kind-specific counters (doc_count / vector_count+dim / node_count ...)
    attrs: dict[str, str] = field(default_factory=dict)

    def encode(self, e: BinaryEncoder) -> None:
        e.string(self.kind).u64(self.offset).u64(self.length).raw(self.sha)
        e.u32(self.version).str_map(self.attrs)

    @classmethod
    def decode(cls, d: BinaryDecoder) -> "SegmentManifest":
        return cls(
            kind=d.string(),
            offset=d.u64(),
            length=d.u64(),
            sha=d.raw(32),
            version=d.u32(),
            attrs=d.str_map(),
        )


@dataclass(frozen=True)
class StoreTOC:
    """Table of contents written on every commit (reference: MV2STOC.swift:42-253).

    frames: dense by frame id — (meta, payload_offset, payload_len, payload_sha,
    encoding). manifests: current committed index blobs keyed by kind.
    segment_catalog: append-only history of every segment ever written.
    """

    frames: tuple
    manifests: dict[str, SegmentManifest]
    segment_catalog: tuple[SegmentManifest, ...]
    committed_seq: int
    generation: int

    def merkle_root(self) -> bytes:
        """Merkle root over all committed content hashes (reference: MV2STOC.swift:42
        carries a merkle root next to the TOC checksum).

        Leaves are the per-frame payload sha256s followed by the segment-catalog
        sha256s, each re-hashed for domain separation, then reduced pairwise (odd
        node pairs with itself). Lets an auditor prove any single payload against
        one 32-byte commitment without re-reading the whole file.
        """
        leaves = [sha for (_m, _o, _l, sha, _e) in self.frames]
        leaves += [seg.sha for seg in self.segment_catalog]
        if not leaves:
            return b"\x00" * 32
        level = [sha256(leaf) for leaf in leaves]
        while len(level) > 1:
            level = [
                sha256(level[i] + (level[i + 1] if i + 1 < len(level) else level[i]))
                for i in range(0, len(level), 2)
            ]
        return level[0]

    def encode(self) -> bytes:
        e = BinaryEncoder()
        e.raw(b"WXSTOC01").u32(FORMAT_VERSION)
        e.u64(self.generation).u64(self.committed_seq)
        e.u32(len(self.frames))
        for i, (meta, off, ln, sha, enc) in enumerate(self.frames):
            if meta.frame_id != i:
                raise CodecError(f"non-dense frame ids: slot {i} holds {meta.frame_id}")
            e.blob(encode_frame_meta(meta, off, ln, sha, enc))
        e.u32(len(self.manifests))
        for kind in sorted(self.manifests):
            self.manifests[kind].encode(e)
        e.u32(len(self.segment_catalog))
        for seg in self.segment_catalog:
            seg.encode(e)
        e.raw(self.merkle_root())
        body = e.data()
        return body + sha256(body)

    @classmethod
    def decode(cls, data: bytes) -> "StoreTOC":
        if len(data) < 44 or data[:8] != b"WXSTOC01":
            raise CodecError("bad TOC magic")
        body, digest = data[:-32], data[-32:]
        if sha256(body) != digest:
            raise CodecError("TOC checksum mismatch")
        d = BinaryDecoder(body, 8)
        _version = d.u32()
        generation = d.u64()
        committed_seq = d.u64()
        n = d.u32()
        frames = []
        for _ in range(n):
            sub = BinaryDecoder(d.blob())
            frames.append(decode_frame_meta(sub))
        manifests = {}
        for _ in range(d.u32()):
            m = SegmentManifest.decode(d)
            manifests[m.kind] = m
        catalog = tuple(SegmentManifest.decode(d) for _ in range(d.u32()))
        toc = cls(tuple(frames), manifests, catalog, committed_seq, generation)
        stored_root = d.raw(32)
        if stored_root != toc.merkle_root():
            raise CodecError("TOC merkle root mismatch")
        return toc

    @classmethod
    def empty(cls) -> "StoreTOC":
        return cls(frames=(), manifests={}, segment_catalog=(), committed_seq=0, generation=0)

    def with_updates(self, **kw) -> "StoreTOC":
        return replace(self, **kw)


# -- footer --------------------------------------------------------------------------------


@dataclass(frozen=True)
class Footer:
    """64-byte footer (reference: MV2SFooter.swift:1-86): magic, TOC location+hash,
    generation, committed WAL seq, self-checksum."""

    toc_offset: int
    toc_len: int
    generation: int
    committed_seq: int
    toc_sha16: bytes  # first 16 bytes of the TOC sha256

    def encode(self) -> bytes:
        body = (
            FOOTER_MAGIC
            + self.toc_offset.to_bytes(8, "little")
            + self.toc_len.to_bytes(8, "little")
            + self.generation.to_bytes(8, "little")
            + self.committed_seq.to_bytes(8, "little")
            + self.toc_sha16
        )
        out = body + sha256(body)[:8]
        assert len(out) == FOOTER_SIZE
        return out

    @classmethod
    def decode(cls, data: bytes) -> "Footer":
        if len(data) != FOOTER_SIZE or data[:8] != FOOTER_MAGIC:
            raise CodecError("bad footer")
        if sha256(data[:56])[:8] != data[56:]:
            raise CodecError("footer checksum mismatch")
        return cls(
            toc_offset=int.from_bytes(data[8:16], "little"),
            toc_len=int.from_bytes(data[16:24], "little"),
            generation=int.from_bytes(data[24:32], "little"),
            committed_seq=int.from_bytes(data[32:40], "little"),
            toc_sha16=data[40:56],
        )


def scan_all_footers(fd, file_size: int, data_start: int) -> list[tuple[Footer, int]]:
    """Bounded backward scan for EVERY decodable footer, newest generation first
    (reference: FooterScanner.findLastValidFooter :20-72 — last 32 MiB). Returning
    all candidates lets recovery fall back to an older generation when the newest
    footer's TOC bytes are damaged (the WaxDemoCorruptTOC scenario)."""
    lo = max(data_start, file_size - FOOTER_SCAN_BOUND)
    lo = lo + (-lo) % FOOTER_ALIGN
    found: list[tuple[Footer, int]] = []
    off = file_size - (file_size % FOOTER_ALIGN) - FOOTER_SIZE
    # read in chunks from the end backward
    while off >= lo:
        chunk_lo = max(lo, off - 4 * 1024 * 1024)
        blob = fd.pread(chunk_lo, off - chunk_lo + FOOTER_SIZE)
        pos = len(blob) - FOOTER_SIZE
        while pos >= 0:
            cand = blob[pos : pos + FOOTER_SIZE]
            if cand[:8] == FOOTER_MAGIC:
                try:
                    f = Footer.decode(cand)
                    found.append((f, chunk_lo + pos))
                except CodecError:
                    pass
            pos -= FOOTER_ALIGN
        off = chunk_lo - FOOTER_SIZE
        if chunk_lo == lo:
            break
    found.sort(key=lambda t: (-t[0].generation, -t[1]))
    return found


def scan_for_footer(fd, file_size: int, data_start: int) -> tuple[Footer, int] | None:
    """Newest valid footer, or None (see scan_all_footers)."""
    all_found = scan_all_footers(fd, file_size, data_start)
    return all_found[0] if all_found else None
