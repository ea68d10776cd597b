"""Randomized corruption campaign: seeded byte flips, zero-fills, and truncations
anywhere in a committed store file must never produce silent corruption.

The generalization of the crash-recovery matrix (reference: CrashRecoveryTests +
DurabilityRegressionTests cover hand-picked corruptions; this fuzzes the whole file
deterministically). Invariant under ANY single corruption:
  * open() either succeeds or raises StoreError/CodecError — no other exception type,
    no hang, no partially-constructed store;
  * after a successful open, every frame read either returns bytes matching the
    recorded sha256 or raises StoreError — never wrong bytes;
  * verify(deep) reports ok=False whenever any content actually changed under a
    successful open (detection), and the WAL-side mutations replay or are dropped as
    a unit (no half-applied batch).
"""
from __future__ import annotations

import shutil

import numpy as np
import pytest

from wax_tpu.storage.store import StoreError, StoreOptions, WaxStore
from wax_tpu.storage.codec import CodecError

OPTS = StoreOptions(wal_size=256 * 1024)
N_FRAMES = 24


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    """A committed store + a pending (journal-only) tail, plus its golden contents."""
    root = tmp_path_factory.mktemp("fuzz")
    path = root / "golden.wxs"
    s = WaxStore.create(path, OPTS)
    for i in range(N_FRAMES):
        s.put(f"frame {i}: " + "x" * (50 + 37 * i), kind="document")
    s.commit()
    # journaled-but-uncommitted tail — exercises WAL replay under corruption
    for i in range(4):
        s.put(f"pending {i}", kind="document")
    contents = {i: s.frame_content(i) for i in range(s.frame_count())}
    s.close()
    return path, contents


def _mutate(src, dst, rng):
    shutil.copyfile(src, dst)
    size = dst.stat().st_size
    mode = rng.integers(0, 3)
    with open(dst, "r+b") as f:
        if mode == 0:  # flip 1-8 random bytes
            for _ in range(int(rng.integers(1, 9))):
                off = int(rng.integers(0, size))
                f.seek(off)
                b = f.read(1)
                f.seek(off)
                f.write(bytes([b[0] ^ (1 << int(rng.integers(0, 8)))]))
            return f"flip@{mode}"
        if mode == 1:  # zero a random 64-512B window
            off = int(rng.integers(0, size))
            ln = int(rng.integers(64, 512))
            f.seek(off)
            f.write(b"\x00" * min(ln, size - off))
            return f"zero@{off}"
        # truncate to a random prefix (but keep at least the header pages)
        keep = int(rng.integers(8192, size + 1))
        f.truncate(keep)
        return f"trunc@{keep}"


class TestCorruptionFuzz:
    @pytest.mark.parametrize("seed", range(40))
    def test_no_silent_corruption(self, golden, tmp_path, seed):
        src, contents = golden
        rng = np.random.default_rng(seed)
        dst = tmp_path / f"mut_{seed}.wxs"
        what = _mutate(src, dst, rng)

        try:
            s = WaxStore.open(dst, OPTS)
        except (StoreError, CodecError):
            return  # loud failure is a valid outcome
        try:
            report = s.verify(deep=True)
            mismatched = False
            for fid in range(s.frame_count()):
                try:
                    got = s.frame_content(fid)
                except StoreError:
                    continue  # detected — acceptable
                want = contents.get(fid)
                if want is not None and got != want:
                    mismatched = True
            # any undetected content change is the one unacceptable outcome
            assert not (mismatched and report["ok"]), (
                f"silent corruption under {what}: contents differ but verify ok"
            )
            # a clean verify must also mean the store is usable end-to-end
            if report["ok"]:
                s.put(b"post-recovery write")
                s.commit()
                assert s.verify(deep=True)["ok"]
        finally:
            s.close()

    def test_double_corruption_both_headers(self, golden, tmp_path):
        """Destroying BOTH header pages must fail loudly, not open garbage."""
        src, _ = golden
        dst = tmp_path / "hdrs.wxs"
        shutil.copyfile(src, dst)
        with open(dst, "r+b") as f:
            f.write(b"\xff" * 8192)
        with pytest.raises((StoreError, CodecError)):
            WaxStore.open(dst, OPTS)


class TestRollbackRefusal:
    def test_truncation_refused_then_salvageable(self, golden, tmp_path):
        """Losing a durably-committed footer must refuse by default (silent rollback
        is data loss a crash can never produce); allow_rollback_recovery salvages the
        newest decodable generation explicitly."""
        from dataclasses import replace

        src, _ = golden
        dst = tmp_path / "trunc.wxs"
        shutil.copyfile(src, dst)
        with open(dst, "r+b") as f:
            f.truncate(dst.stat().st_size - 80)  # destroy the newest footer
        with pytest.raises(StoreError, match="committed state lost"):
            WaxStore.open(dst, OPTS)
        s = WaxStore.open(dst, replace(OPTS, allow_rollback_recovery=True))
        assert s.verify(deep=True)["ok"]  # whatever survives is consistent
        s.close()
