"""Compression codecs: zlib + native LZ4 round-trips, interop across codec choices,
store-smaller-only policy (reference: CompressionTests + CompressionInteroperabilityTests)."""
import os

import pytest

from wax_tpu.native.build import native_available
from wax_tpu.storage.compression import (
    ENC_LZ4,
    ENC_RAW,
    ENC_ZLIB,
    compress,
    decompress,
    lz4_available,
)
from wax_tpu.storage.store import StoreOptions, WaxStore

SAMPLES = [
    b"",
    b"short",
    b"abc " * 4000,
    os.urandom(3000),
    bytes(range(256)) * 100,
    "unicode text 日本語".encode() * 50,
]


class TestZlib:
    def test_roundtrip_and_policy(self):
        for s in SAMPLES:
            payload, enc = compress(s, "zlib")
            assert decompress(payload, enc) == s
            if enc == ENC_ZLIB:
                assert len(payload) < len(s)

    def test_incompressible_stays_raw(self):
        payload, enc = compress(os.urandom(5000), "zlib")
        assert enc == ENC_RAW


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
class TestLz4:
    def test_roundtrip(self):
        for s in SAMPLES:
            payload, enc = compress(s, "lz4")
            assert decompress(payload, enc) == s, s[:20]

    def test_compresses_repetitive(self):
        payload, enc = compress(b"abcd" * 10_000, "lz4")
        assert enc == ENC_LZ4
        assert len(payload) < 1000

    def test_rle_overlap(self):
        # single repeated byte exercises the overlapping-match copy path
        s = b"x" * 100_000
        payload, enc = compress(s, "lz4")
        assert enc == ENC_LZ4 and decompress(payload, enc) == s

    def test_malformed_rejected(self):
        from wax_tpu.storage.compression import lz4_decompress

        with pytest.raises(ValueError):
            lz4_decompress(b"\xff\xff\xff\xff\xff", 100)

    def test_store_with_lz4(self, tmp_path):
        opts = StoreOptions(wal_size=256 * 1024, compression="lz4")
        p = tmp_path / "l.wxs"
        body = ("lz4 framed payload " * 500).encode()
        with WaxStore.create(p, opts) as s:
            fid = s.put(body)
            s.commit()
        # reopen with default (zlib) options: encoding id decodes regardless
        with WaxStore.open(p, StoreOptions(wal_size=256 * 1024)) as s:
            assert s.frame_content(fid) == body


class TestCompressionEdges:
    """Cross-codec interop + adversarial payloads (reference:
    CompressionInteroperabilityTests breadth)."""

    def test_empty_and_tiny_payloads_stay_raw(self):
        for data in (b"", b"x", b"short"):
            payload, enc = compress(data, "zlib")
            assert enc == ENC_RAW and decompress(payload, enc) == data

    def test_store_written_zlib_read_any_codec_config(self, tmp_path):
        """The encoding byte travels with the frame: a store written with one
        codec preference reads fine under another."""
        from wax_tpu.storage.store import StoreOptions, WaxStore

        p = tmp_path / "x.wxs"
        s = WaxStore.create(p, StoreOptions(wal_size=256 * 1024, compression="zlib"))
        fid = s.put(("repeat " * 200).encode())
        s.commit()
        s.close()
        s2 = WaxStore.open(p, StoreOptions(wal_size=256 * 1024, compression="lz4"))
        assert s2.frame_content(fid) == ("repeat " * 200).encode()
        s2.close()

    def test_none_codec_never_compresses(self, tmp_path):
        from wax_tpu.storage.store import StoreOptions, WaxStore

        p = tmp_path / "n.wxs"
        s = WaxStore.create(p, StoreOptions(wal_size=256 * 1024, compression="none"))
        fid = s.put(("abc " * 500).encode())
        s.commit()
        rec = s.toc.frames[fid]
        assert rec[4] == ENC_RAW  # stored encoding byte
        s.close()

    def test_high_entropy_roundtrip(self):
        import os as _os

        data = _os.urandom(4096)
        payload, enc = compress(data, "zlib")
        assert decompress(payload, enc) == data
        assert enc == ENC_RAW  # store-smaller-only policy on incompressible data

    def test_unknown_encoding_byte_raises(self):
        with pytest.raises(Exception):
            decompress(b"whatever", 99)

    def test_decompress_corrupted_zlib_raises(self):
        payload, enc = compress(b"A" * 10_000, "zlib")
        assert enc == ENC_ZLIB
        bad = payload[:-4] + b"\x00\x00\x00\x00"
        with pytest.raises(Exception):
            decompress(bad, enc)
