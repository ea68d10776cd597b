"""Cross-option store interop matrix: a file written under one option set must read
back bit-identically under every other (encodings are self-describing per frame, not
per store).

Mirrors the reference's CompressionInteroperabilityTests / cross-platform interop axis
(Tests/WaxCoreTests/CompressionInteroperabilityTests — write with Apple Compression,
read via the C shims, and vice versa) and extends it with the replay-snapshot and
native-availability axes.
"""
import itertools
import os

import numpy as np
import pytest

from wax_tpu.storage.store import StoreOptions, WaxStore

WRITE_OPTS = [
    ("zlib", True),
    ("lz4", True),
    ("none", True),
    ("zlib", False),  # replay snapshot off
]
READ_OPTS = list(WRITE_OPTS)

PAYLOADS = [
    ("compressible " * 400).encode(),
    os.urandom(700),  # incompressible -> stored raw under every codec
    b"",
    "unicode éàü \U0001f389".encode(),
    b"x" * (64 * 1024),
]


def _opts(comp: str, snap: bool) -> StoreOptions:
    return StoreOptions(
        wal_size=256 * 1024,
        compression=comp,
        compress_payloads=comp != "none",
        enable_replay_snapshot=snap,
    )


class TestCrossOptionInterop:
    @pytest.mark.parametrize(
        "w,r", [(w, r) for w, r in itertools.product(WRITE_OPTS, READ_OPTS) if w != r]
    )
    def test_write_x_read_y(self, tmp_path, w, r):
        p = tmp_path / "x.wxs"
        with WaxStore.create(p, _opts(*w)) as s:
            fids = [s.put(pl) for pl in PAYLOADS]
            s.put_embedding(fids[0], np.arange(8, dtype=np.float32))
            s.stage_index("vec", b"vec-blob", {"count": "1"})
            s.stage_index("lex", b"lex-blob", {})
            s.commit()
            # one journaled-but-uncommitted tail mutation
            tail = s.put("pending tail frame")
        with WaxStore.open(p, _opts(*r)) as s2:
            for fid, pl in zip(fids, PAYLOADS):
                assert s2.frame_content(fid) == pl, (w, r, fid)
            assert s2.frame_content(tail) == b"pending tail frame"
            assert s2.read_segment("vec") == b"vec-blob"
            assert s2.read_segment("lex") == b"lex-blob"
            assert s2.verify(deep=True)["ok"]

    def test_python_fallback_reads_native_lz4(self, tmp_path):
        # force the pure-Python path on read of a natively-compressed store
        p = tmp_path / "n.wxs"
        with WaxStore.create(p, _opts("lz4", True)) as s:
            fid = s.put(("native lz4 " * 300).encode())
            s.commit()
        os.environ["WAX_TPU_DISABLE_NATIVE"] = "1"
        try:
            import importlib

            import wax_tpu.storage.compression as comp

            importlib.reload(comp)
            with WaxStore.open(p, _opts("lz4", True)) as s2:
                assert s2.frame_content(fid) == ("native lz4 " * 300).encode()
        finally:
            os.environ.pop("WAX_TPU_DISABLE_NATIVE", None)
            import importlib

            import wax_tpu.storage.compression as comp

            importlib.reload(comp)
