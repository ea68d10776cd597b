"""Storage engine: codecs, header/footer selection, WAL ring semantics, store
commit/open round-trips, crash recovery, fault injection.

Mirrors the reference's WaxCoreTests axis (HeaderFooterTests, MV2STOCTests,
BinaryCodecTests, WALRingTests incl. wrap/padding, FDFileTests fault plans,
CrashRecoveryTests.swift:5-306 — corrupt header A -> open via B, stale footer ->
newest wins, replay-snapshot fast path + fallbacks).
"""
import os

import numpy as np
import pytest

from wax_tpu.storage.codec import BinaryDecoder, BinaryEncoder, CodecError
from wax_tpu.storage.fdfile import FaultKind, FaultPlan, FDFile, FileLock, IOFault
from wax_tpu.storage.format import (
    FOOTER_SIZE,
    Footer,
    HEADER_SIZE,
    HeaderPage,
    ReplaySnapshot,
    select_valid_header,
)
from wax_tpu.storage.store import (
    StaleIndexError,
    StoreError,
    StoreOptions,
    WaxStore,
)
from wax_tpu.storage.wal import (
    WalEntry,
    WalFullError,
    WalOp,
    WalRingReader,
    WalRingWriter,
)

SMALL = StoreOptions(wal_size=256 * 1024)


class TestCodec:
    def test_roundtrip_all_types(self):
        e = BinaryEncoder()
        e.u8(7).u32(1234).u64(2**60).i64(-5).f32(1.5).f64(2.25)
        e.boolean(True).string("héllo").opt_string(None).opt_i64(42)
        e.blob(b"\x00\x01\x02").str_map({"b": "2", "a": "1"}).str_list(["x", "y"])
        d = BinaryDecoder(e.data())
        assert d.u8() == 7 and d.u32() == 1234 and d.u64() == 2**60 and d.i64() == -5
        assert d.f32() == 1.5 and d.f64() == 2.25 and d.boolean() is True
        assert d.string() == "héllo" and d.opt_string() is None and d.opt_i64() == 42
        assert d.blob() == b"\x00\x01\x02"
        assert d.str_map() == {"a": "1", "b": "2"} and d.str_list() == ["x", "y"]
        assert d.remaining == 0

    def test_overrun_raises(self):
        with pytest.raises(CodecError):
            BinaryDecoder(b"\x01").u32()

    def test_deterministic_map_order(self):
        e1 = BinaryEncoder().str_map({"a": "1", "z": "2"}).data()
        e2 = BinaryEncoder().str_map({"z": "2", "a": "1"}).data()
        assert e1 == e2


class TestHeaderFooter:
    def _header(self, gen=1):
        return HeaderPage(
            header_gen=gen, file_gen=gen, footer_offset=8192, wal_offset=8192,
            wal_size=1024, committed_seq=3, replay_snapshot=ReplaySnapshot(10, 3, 0),
        )

    def test_header_roundtrip(self):
        h = self._header()
        h2 = HeaderPage.decode(h.encode())
        assert h2 == h

    def test_header_checksum_detects_corruption(self):
        page = bytearray(self._header().encode())
        page[20] ^= 0xFF
        with pytest.raises(CodecError):
            HeaderPage.decode(bytes(page))

    def test_select_newest_valid(self):
        a, b = self._header(3).encode(), self._header(7).encode()
        h, slot = select_valid_header(a, b)
        assert h.header_gen == 7 and slot == 1
        corrupt = bytearray(b)
        corrupt[30] ^= 1
        h, slot = select_valid_header(a, bytes(corrupt))
        assert h.header_gen == 3 and slot == 0

    def test_footer_roundtrip(self):
        f = Footer(toc_offset=100, toc_len=200, generation=5, committed_seq=9, toc_sha16=b"x" * 16)
        assert Footer.decode(f.encode()) == f
        assert len(f.encode()) == FOOTER_SIZE


class TestWalRing:
    def _ring(self, tmp_path, size=4096):
        fd = FDFile(tmp_path / "wal.bin", create=True)
        fd.pwrite_exact(0, b"\x00" * size)
        return fd, WalRingWriter(fd, 0, size), WalRingReader(fd, 0, size)

    def test_append_and_scan(self, tmp_path):
        fd, w, r = self._ring(tmp_path)
        w.write_sentinel(0)
        w.append(WalEntry(op=WalOp.DELETE_FRAME, frame_id=9))
        w.append_batch([WalEntry(op=WalOp.DELETE_FRAME, frame_id=i) for i in (1, 2)])
        res = r.scan_pending(0, 0)
        assert [e.frame_id for _, e in res.entries] == [9, 1, 2]
        assert res.stopped_on == "sentinel"
        assert res.last_seq == 3

    def test_scan_skips_committed(self, tmp_path):
        fd, w, r = self._ring(tmp_path)
        for i in range(5):
            w.append(WalEntry(op=WalOp.DELETE_FRAME, frame_id=i))
        res = r.scan_pending(0, committed_seq=3)
        assert [e.frame_id for _, e in res.entries] == [3, 4]

    def test_wrap_with_padding(self, tmp_path):
        fd, w, r = self._ring(tmp_path, size=1024)
        # fill most of the ring, checkpoint, then append past the end
        for i in range(8):
            w.append(WalEntry(op=WalOp.DELETE_FRAME, frame_id=i))
        w.record_checkpoint()
        committed = w.stats.last_seq
        n_more = 12  # 57-byte records from pos 456 in a 1024 ring must wrap
        for i in range(n_more):
            w.append(WalEntry(op=WalOp.DELETE_FRAME, frame_id=100 + i))
        assert w.stats.wrap_count >= 1
        res = r.scan_pending(w.stats.checkpoint_pos, committed)
        assert [e.frame_id for _, e in res.entries] == [100 + i for i in range(n_more)]

    def test_full_raises(self, tmp_path):
        fd, w, r = self._ring(tmp_path, size=512)
        with pytest.raises(WalFullError):
            for i in range(100):
                w.append(WalEntry(op=WalOp.DELETE_FRAME, frame_id=i))

    def test_embedding_roundtrip(self, tmp_path):
        fd, w, r = self._ring(tmp_path)
        vec = np.arange(8, dtype=np.float32)
        w.append(WalEntry(op=WalOp.PUT_EMBEDDING, frame_id=4, embedding=vec))
        res = r.scan_pending(0, 0)
        seq, e = res.entries[0]
        assert e.frame_id == 4
        np.testing.assert_array_equal(e.embedding, vec)

    def test_corruption_stops_scan(self, tmp_path):
        fd, w, r = self._ring(tmp_path)
        w.append(WalEntry(op=WalOp.DELETE_FRAME, frame_id=1))
        pos_second = w.stats.write_pos
        w.append(WalEntry(op=WalOp.DELETE_FRAME, frame_id=2))
        # flip a byte in the second record's payload
        fd.pwrite_exact(pos_second + 50, b"\xff")
        res = r.scan_pending(0, 0)
        assert [e.frame_id for _, e in res.entries] == [1]
        assert res.stopped_on == "corruption"


class TestFDFileFaults:
    def test_eintr_injection(self, tmp_path):
        f = FDFile(tmp_path / "x", create=True)
        f.inject(FaultPlan(op="write", kind=FaultKind.EINTR))
        with pytest.raises(IOFault):
            f.pwrite_exact(0, b"hello")
        f.pwrite_exact(0, b"hello")  # fault cleared
        assert f.pread_exact(0, 5) == b"hello"
        assert f.stats["faults"] == 1

    def test_short_write_detected(self, tmp_path):
        f = FDFile(tmp_path / "x", create=True)
        f.inject(FaultPlan(op="write", kind=FaultKind.SHORT_WRITE, short_by=2))
        with pytest.raises(IOFault):
            f.pwrite_exact(0, b"hello")

    def test_countdown(self, tmp_path):
        f = FDFile(tmp_path / "x", create=True)
        f.inject(FaultPlan(op="write", kind=FaultKind.EIO, countdown=2))
        f.pwrite_exact(0, b"a")
        f.pwrite_exact(1, b"b")
        with pytest.raises(IOFault):
            f.pwrite_exact(2, b"c")

    def test_file_lock_exclusive(self, tmp_path):
        l1 = FileLock(tmp_path / "l")
        l2 = FileLock(tmp_path / "l")
        assert l1.acquire(exclusive=True, blocking=False)
        assert not l2.acquire(exclusive=True, blocking=False)
        l1.release()
        assert l2.acquire(exclusive=True, blocking=False)
        l2.release()


class TestStore:
    def test_put_commit_reopen(self, tmp_path):
        p = tmp_path / "s.wxs"
        with WaxStore.create(p, SMALL) as s:
            fid = s.put("hello world", kind="document", search_text="hello")
            s.put_batch([("second doc", {}), ("third doc", {"tags": ("t",)})])
            assert s.frame_count() == 3
            s.commit()
        with WaxStore.open(p, SMALL) as s:
            assert s.frame_count() == 3
            assert s.frame_content(fid) == b"hello world"
            assert s.frame_meta(2).tags == ("t",)
            assert s.toc.generation == 1

    def test_pending_visible_before_commit_and_recovered(self, tmp_path):
        p = tmp_path / "s.wxs"
        s = WaxStore.create(p, SMALL)
        s.put("committed", kind="document")
        s.commit()
        s.put("pending doc", kind="document")
        s.close()  # no commit for the second put
        with WaxStore.open(p, SMALL) as s2:
            assert s2.frame_count() == 2
            assert s2.frame_content(1) == b"pending doc"
            assert s2.toc.generation == 1  # still one commit

    def test_delete_supersede(self, tmp_path):
        p = tmp_path / "s.wxs"
        with WaxStore.create(p, SMALL) as s:
            a = s.put("original")
            b = s.put("other")
            s.delete(b)
            new = s.supersede(a, "replacement")
            s.commit()
        with WaxStore.open(p, SMALL) as s:
            assert s.frame_meta(b).status == "deleted"
            assert s.frame_meta(a).superseded_by == new
            assert s.frame_content(new) == b"replacement"
            tl = s.timeline()
            assert [m.frame_id for m in tl] == [new]

    def test_embedding_staging_guard(self, tmp_path):
        p = tmp_path / "s.wxs"
        with WaxStore.create(p, SMALL) as s:
            fid = s.put("doc")
            s.put_embedding(fid, np.ones(4, np.float32))
            with pytest.raises(StaleIndexError):
                s.commit()
            s.stage_index("vec", b"fake vec blob", {"count": "1"})
            s.commit()
            assert s.read_segment("vec") == b"fake vec blob"

    def test_auto_commit_persists_embeddings(self, tmp_path):
        p = tmp_path / "s.wxs"
        with WaxStore.create(p, SMALL) as s:
            fid = s.put("doc")
            s.put_embedding(fid, np.arange(4, dtype=np.float32))
            s.commit(allow_pending_embeddings=True)
        with WaxStore.open(p, SMALL) as s:
            pend = s.pending_embeddings()
            assert len(pend) == 1 and pend[0][0] == fid
            np.testing.assert_array_equal(pend[0][1], np.arange(4, dtype=np.float32))

    def test_overflow_embeddings_survive_plain_commit_after_reopen(self, tmp_path):
        # Regression: overflow-recovered embeddings carried seq 0 and were treated as
        # covered, so a plain commit() after reopen silently dropped the pending_emb
        # segment and the durably-journaled embeddings with it.
        p = tmp_path / "s.wxs"
        with WaxStore.create(p, SMALL) as s:
            fid = s.put("doc")
            s.put_embedding(fid, np.arange(4, dtype=np.float32))
            s.commit(allow_pending_embeddings=True)
        with WaxStore.open(p, SMALL) as s:
            with pytest.raises(StaleIndexError):
                s.commit()  # recovered embeddings are NOT covered yet
            # re-persisting keeps them across another cycle
            s.commit(allow_pending_embeddings=True)
        with WaxStore.open(p, SMALL) as s:
            pend = s.pending_embeddings()
            assert len(pend) == 1 and pend[0][0] == fid
            # staging a vec index after recovery covers them; commit clears overflow
            s.stage_index("vec", b"covering blob", {"count": "1"})
            s.commit()
            assert s.pending_embeddings() == []
        with WaxStore.open(p, SMALL) as s:
            assert s.pending_embeddings() == []
            assert s.read_segment("vec") == b"covering blob"

    def test_compression_store_smaller_only(self, tmp_path):
        p = tmp_path / "s.wxs"
        with WaxStore.create(p, SMALL) as s:
            compressible = s.put("abc " * 1000)
            rnd = os.urandom(500)
            incompressible = s.put(rnd)
            s.commit()
            rec_c = s._frame_record(compressible)
            rec_i = s._frame_record(incompressible)
            assert rec_c[2] < len("abc " * 1000)
            assert s.frame_content(compressible) == ("abc " * 1000).encode()
            assert s.frame_content(incompressible) == rnd
            assert rec_i[4] == 0  # stored raw

    def test_corrupt_newest_toc_salvages_previous_generation(self, tmp_path):
        # Regression: the backward scan returned only the newest-generation footer,
        # so when its TOC bytes were damaged, salvage found NOTHING instead of the
        # intact generation-1 state (the WaxDemoCorruptTOC scenario).
        from wax_tpu.storage.fdfile import FDFile as FD
        from wax_tpu.storage.format import HEADER_REGION, scan_for_footer

        p = tmp_path / "c.wxs"
        with WaxStore.create(p, SMALL) as s:
            s.put("generation one doc")
            s.commit()
            s.put("generation two doc")
            s.commit()
        fd = FD(p, readonly=True)
        footer, _ = scan_for_footer(fd, fd.size(), HEADER_REGION)
        fd.close()
        assert footer.generation == 2
        raw = bytearray(p.read_bytes())
        raw[footer.toc_offset] ^= 0xFF
        p.write_bytes(bytes(raw))
        # default open refuses the rollback...
        with pytest.raises(StoreError, match="rollback"):
            WaxStore.open(p, SMALL)
        # ...salvage recovers generation 1, not an empty store
        opts = StoreOptions(wal_size=SMALL.wal_size, allow_rollback_recovery=True)
        with WaxStore.open(p, opts) as s:
            assert s.toc.generation == 1
            assert s.frame_content(0) == b"generation one doc"

    def test_wal_wrap_recovery_without_replay_snapshot(self, tmp_path):
        # Regression: with enable_replay_snapshot=False the header carried no WAL
        # checkpoint position, so recovery scanned from 0; after a ring wrap it saw
        # only post-wrap records and the dense-prefix prune dropped every journaled
        # pending frame. The checkpoint must be persisted unconditionally.
        opts = StoreOptions(wal_size=16 * 1024, enable_replay_snapshot=False)
        p = tmp_path / "wrap.wxs"
        payload = "x" * 512
        with WaxStore.create(p, opts) as s:
            # advance the write position deep into the ring, then checkpoint
            for _ in range(90):
                s.put(payload + os.urandom(8).hex())
            s.commit()
            committed = s.frame_count()
            # journal enough new frames to wrap the ring past the end
            for i in range(30):
                s.put(f"pending frame {i} " + "y" * 512)
            assert s.wal.stats.wrap_count >= 1, "test setup must actually wrap the ring"
            pending_total = s.frame_count() - committed
        with WaxStore.open(p, opts) as s:
            assert s.frame_count() == committed + pending_total

    def test_verify_deep(self, tmp_path):
        p = tmp_path / "s.wxs"
        with WaxStore.create(p, SMALL) as s:
            s.put("content one")
            s.commit()
            assert s.verify(deep=True)["ok"]

    def test_single_writer_lock(self, tmp_path):
        p = tmp_path / "s.wxs"
        s1 = WaxStore.create(p, SMALL)
        with pytest.raises(StoreError):
            WaxStore.open(p, SMALL)
        s1.close()
        WaxStore.open(p, SMALL).close()

    def test_wal_pressure_auto_commit(self, tmp_path):
        p = tmp_path / "s.wxs"
        opts = StoreOptions(wal_size=32 * 1024, auto_commit_fill=0.5)
        with WaxStore.create(p, opts) as s:
            for i in range(200):
                s.put(f"document number {i} with some padding text " * 5)
            assert s.stats()["auto_commits"] >= 1
            assert s.frame_count() == 200
        with WaxStore.open(p, opts) as s:
            assert s.frame_count() == 200


class TestCrashRecovery:
    """Header/footer corruption matrix (reference: CrashRecoveryTests.swift:5-306)."""

    def _store_with_commits(self, p):
        s = WaxStore.create(p, SMALL)
        s.put("gen one doc")
        s.commit()
        s.put("gen two doc")
        s.commit()
        s.close()

    def test_corrupt_header_a_opens_via_b(self, tmp_path):
        p = tmp_path / "s.wxs"
        self._store_with_commits(p)
        with open(p, "r+b") as f:
            # find which slot holds the newest header and corrupt it
            pass
        with FDFile(p) as fd:
            a = fd.pread(0, HEADER_SIZE)
            b = fd.pread(HEADER_SIZE, HEADER_SIZE)
            h, slot = select_valid_header(a, b)
            fd.pwrite_exact(slot * HEADER_SIZE, b"\xde\xad" * 32)
        with WaxStore.open(p, SMALL) as s:
            assert s.frame_count() == 2  # recovered via the other page + footer scan

    def test_both_headers_corrupt_fails(self, tmp_path):
        p = tmp_path / "s.wxs"
        self._store_with_commits(p)
        with FDFile(p) as fd:
            fd.pwrite_exact(0, b"\x00" * HEADER_SIZE)
            fd.pwrite_exact(HEADER_SIZE, b"\x00" * HEADER_SIZE)
        with pytest.raises(StoreError):
            WaxStore.open(p, SMALL)

    def test_header_points_at_stale_footer_newest_wins(self, tmp_path):
        p = tmp_path / "s.wxs"
        s = WaxStore.create(p, SMALL)
        s.put("first")
        s.commit()
        with FDFile(p) as fd:
            a = fd.pread(0, HEADER_SIZE)
            b = fd.pread(HEADER_SIZE, HEADER_SIZE)
            stale_header, slot = select_valid_header(a, b)
        s.put("second")
        s.commit()
        s.close()
        # rewind both header slots to the stale header (points at gen-1 footer)
        with FDFile(p) as fd:
            fd.pwrite_exact(0, stale_header.encode())
            fd.pwrite_exact(HEADER_SIZE, b"\x00" * HEADER_SIZE)
        with WaxStore.open(p, SMALL) as s2:
            # backward scan must find the NEWEST footer despite the stale pointer
            assert s2.toc.generation == 2
            assert s2.frame_count() == 2

    def test_torn_tail_truncated(self, tmp_path):
        p = tmp_path / "s.wxs"
        s = WaxStore.create(p, SMALL)
        s.put("solid doc")
        s.commit()
        end = s.data_end
        s.close()
        # simulate a torn write: garbage appended past the committed footer
        with open(p, "ab") as f:
            f.write(b"\xff" * 1000)
        with WaxStore.open(p, SMALL) as s2:
            assert s2.frame_count() == 1
            assert s2.data_end == end
            assert s2.fd.size() == end

    def test_damaged_mid_batch_entry_keeps_dense_prefix(self, tmp_path):
        """A corrupted payload for one pending frame must not wedge the store: later
        frames drop with it, earlier ones survive, and committing still works."""
        p = tmp_path / "s.wxs"
        s = WaxStore.create(p, SMALL)
        s.put("committed base")
        s.commit()
        fids = [s.put(f"pending {i} " + "x" * 200) for i in range(3)]
        rec = s._frame_record(fids[1])
        s.close()
        # corrupt the MIDDLE pending frame's payload on disk
        with FDFile(p) as fd:
            fd.pwrite_exact(rec[1] + 5, b"\xff\xff\xff")
        with WaxStore.open(p, SMALL) as s2:
            assert s2.frame_content(fids[0]) is not None
            assert s2.frame_count() == 2  # base + first pending; damaged + later dropped
            s2.put("new frame after recovery")
            s2.commit()  # density preserved -> commit succeeds
            assert s2.verify(deep=True)["ok"]

    def test_replay_snapshot_fast_path(self, tmp_path):
        p = tmp_path / "s.wxs"
        s = WaxStore.create(p, SMALL)
        s.put("doc")
        s.commit()
        s.close()
        with WaxStore.open(p, SMALL) as s2:
            assert s2.wal_stats()["replay_snapshot_hit_count"] == 1

    def test_snapshot_fallback_when_pending(self, tmp_path):
        p = tmp_path / "s.wxs"
        s = WaxStore.create(p, SMALL)
        s.put("doc")
        s.commit()
        s.put("pending")
        s.close()
        with WaxStore.open(p, SMALL) as s2:
            assert s2.wal_stats()["replay_snapshot_hit_count"] == 0
            assert s2.frame_count() == 2


class TestCommitAtomicityUnderWriteFaults:
    """Systematic single-fault matrix: inject a sticky EIO at the Nth write issued by
    commit(), for EVERY N, and assert no journaled mutation is ever lost.

    The WAL journals every mutation before commit touches the TOC/footer/header, so
    whatever write dies, a clean reopen must recover all five puts, the delete, and
    the embedding (pending or committed — either is durable). This is the exhaustive
    generalization of the reference's CrashRecoveryTests single-scenario checks."""

    def _mutate(self, store):
        ids = [store.put(f"fault doc {i}", search_text=f"fault doc {i}") for i in range(5)]
        store.put_embedding(ids[0], np.full(8, 0.1, np.float32))
        store.delete(ids[1])
        return ids

    def _assert_recovered(self, r, tag):
        live = {
            r.frame_content(m.frame_id).decode()
            for m in r.timeline(include_superseded=False)
        }
        assert live == {f"fault doc {i}" for i in (0, 2, 3, 4)}, f"{tag}: {live}"
        pend = r.pending_embeddings()
        # the embedding survives either as a pending (WAL/overflow) entry or, if the
        # faulted commit actually completed durably, inside the committed state
        assert len(pend) in (0, 1), tag
        if not pend:
            # commit completed before the fault fired — nothing pending is correct
            assert r.toc.committed_seq > 0, tag

    def test_every_commit_write_site(self, tmp_path):
        # pass 1: count the writes a clean commit issues
        p = tmp_path / "count.wxs"
        s = WaxStore.create(p, SMALL)
        self._mutate(s)
        w0 = s.fd.stats["writes"]
        s.commit(allow_pending_embeddings=True)
        n_writes = s.fd.stats["writes"] - w0
        s.close()
        assert n_writes >= 3  # payload-independent: TOC + footer + header at least

    # pass 2: one store per fault position
        for i in range(n_writes):
            q = tmp_path / f"fault{i}.wxs"
            s = WaxStore.create(q, SMALL)
            self._mutate(s)
            s.fd.inject(FaultPlan(op="write", kind=FaultKind.EIO, countdown=i, sticky=True))
            with pytest.raises(Exception):
                s.commit(allow_pending_embeddings=True)
            s.close()  # crash: no further writes, just drop the handle + lock
            r = WaxStore.open(q, SMALL)
            self._assert_recovered(r, f"write fault @{i}")
            r.close()

    def test_every_commit_fsync_site(self, tmp_path):
        p = tmp_path / "count.wxs"
        s = WaxStore.create(p, SMALL)
        self._mutate(s)
        f0 = s.fd.stats["fsyncs"]
        s.commit(allow_pending_embeddings=True)
        n_fsyncs = s.fd.stats["fsyncs"] - f0
        s.close()
        assert n_fsyncs >= 1

        for i in range(n_fsyncs):
            q = tmp_path / f"fsfault{i}.wxs"
            s = WaxStore.create(q, SMALL)
            self._mutate(s)
            s.fd.inject(FaultPlan(op="fsync", kind=FaultKind.EIO, countdown=i, sticky=True))
            with pytest.raises(Exception):
                s.commit(allow_pending_embeddings=True)
            s.close()
            r = WaxStore.open(q, SMALL)
            self._assert_recovered(r, f"fsync fault @{i}")
            r.close()
