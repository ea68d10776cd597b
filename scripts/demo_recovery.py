"""Recovery demos: watch the store survive (or refuse) specific corruption shapes.

Standalone analogue of the reference's WaxDemo package (reference:
WaxDemo/Sources/WaxDemoCorruptTOC/main.swift and WaxDemoMultiFooter/main.swift —
self-contained programs that corrupt a TOC after its footer is durable / leave
multiple footers with a stale header pointer, then show open() recovering).

    python scripts/demo_recovery.py corrupt-toc
    python scripts/demo_recovery.py multi-footer
    python scripts/demo_recovery.py all
"""
import pathlib
import subprocess
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from wax_tpu.storage.format import scan_for_footer  # noqa: E402
from wax_tpu.storage.store import StoreError, StoreOptions, WaxStore  # noqa: E402

OPTS = StoreOptions(wal_size=64 * 1024)


def demo_corrupt_toc() -> None:
    """Corrupt the newest TOC body in place. open() must detect the damage via the
    footer's TOC hash; because the header proves generation 2 was durably committed,
    the default open REFUSES silent rollback, and allow_rollback_recovery=True
    salvages the previous generation."""
    print("=== corrupt-toc ===")
    with tempfile.TemporaryDirectory() as d:
        path = pathlib.Path(d) / "demo.wxs"
        with WaxStore.create(path, OPTS) as s:
            s.put("generation one doc")
            s.commit()
            s.put("generation two doc")
            s.commit()
        size = path.stat().st_size
        from wax_tpu.storage.fdfile import FDFile
        from wax_tpu.storage.format import HEADER_REGION

        fd = FDFile(path, readonly=True)
        found = scan_for_footer(fd, size, HEADER_REGION)
        fd.close()
        assert found is not None
        footer, footer_off = found
        print(f"file={path.name} size={size} newest footer at {footer_off} gen={footer.generation}")
        raw = bytearray(path.read_bytes())
        raw[footer.toc_offset] ^= 0xFF  # flip one TOC byte
        path.write_bytes(bytes(raw))
        print("corrupted one byte of the generation-2 TOC")
        try:
            WaxStore.open(path, OPTS)
            print("UNEXPECTED: open succeeded")
        except StoreError as e:
            print(f"open() refused (as designed): {e}")
        salvage = WaxStore.open(
            path, StoreOptions(wal_size=64 * 1024, allow_rollback_recovery=True)
        )
        try:
            print(
                f"salvage open: generation={salvage.toc.generation} "
                f"frames={salvage.frame_count()} "
                f"content[0]={salvage.frame_content(0)!r}"
            )
        finally:
            salvage.close()


def demo_multi_footer() -> None:
    """Crash between footer fsync and header flip: the file holds a NEWER valid
    footer than the header points at. open() must pick the newest via the bounded
    backward scan (reference: FooterScanner.findLastValidFooter)."""
    print("=== multi-footer ===")
    with tempfile.TemporaryDirectory() as d:
        path = pathlib.Path(d) / "demo.wxs"
        code = f"""
import os
from wax_tpu.storage.store import CrashCheckpoint, StoreOptions, WaxStore
s = WaxStore.create({str(path)!r}, StoreOptions(wal_size=64*1024))
s.put("gen one doc")
s.commit()
s.put("gen two doc")
os.environ[CrashCheckpoint.ENV] = CrashCheckpoint.FSYNC_DONE
s.commit()  # SIGKILLed after the gen-2 footer fsync, before the header flip
"""
        proc = subprocess.run([sys.executable, "-c", code], capture_output=True)
        print(f"child crashed with rc={proc.returncode} (footer durable, header stale)")
        with WaxStore.open(path, OPTS) as s:
            print(
                f"reopen: generation={s.toc.generation} frames={s.frame_count()} "
                f"(header pointed at gen 1; backward scan found the newer footer)"
            )
            assert s.frame_count() == 2


DEMOS = {"corrupt-toc": demo_corrupt_toc, "multi-footer": demo_multi_footer}


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    for name, fn in DEMOS.items():
        if which in (name, "all"):
            fn()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
