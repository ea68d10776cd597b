"""Property-based tests for the round-3 subsystems: columnar TOC round-trips,
frozen-lex equivalence under mutation sequences, dedup_topk invariants, the raw
array container, PDF parser robustness, tokenizer normalization idempotence.
"""
import string

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from wax_tpu.storage.format import SegmentManifest, StoreTOC
from wax_tpu.types import FrameMeta

# -- columnar TOC --------------------------------------------------------------------

_txt = st.text(max_size=24)
_opt_int = st.one_of(st.none(), st.integers(0, 2**40))


@st.composite
def frame_records(draw, n_max=12):
    n = draw(st.integers(0, n_max))
    recs = []
    for i in range(n):
        meta = FrameMeta(
            frame_id=i,
            timestamp_ms=draw(st.integers(0, 2**48)),
            kind=draw(st.sampled_from(["document", "chunk", "wax.handoff", "wax.internal.x", "κλ"])),
            search_text=draw(st.one_of(st.none(), _txt)),
            metadata=draw(st.dictionaries(st.text(min_size=1, max_size=12), _txt, max_size=4)),
            tags=tuple(draw(st.lists(_txt, max_size=3))),
            parent_id=draw(_opt_int),
            chunk_index=draw(_opt_int),
            chunk_count=draw(_opt_int),
            status=draw(st.sampled_from(["active", "deleted"])),
            supersedes=draw(_opt_int),
            superseded_by=draw(_opt_int),
        )
        payload_sha = bytes(draw(st.binary(min_size=32, max_size=32)))
        recs.append((meta, draw(st.integers(0, 2**48)), draw(st.integers(0, 2**32)), payload_sha, draw(st.integers(0, 2))))
    return tuple(recs)


class TestColumnarTocProperties:
    @settings(max_examples=40, deadline=None)
    @given(frames=frame_records())
    def test_roundtrip_exact(self, frames):
        toc = StoreTOC(
            frames=frames,
            manifests={"lex": SegmentManifest("lex", 1, 2, b"\x01" * 32, attrs={"k": "v"})},
            segment_catalog=(SegmentManifest("vec", 3, 4, b"\x02" * 32),),
            committed_seq=7,
            generation=3,
        )
        blob = toc.encode()
        back = StoreTOC.decode(blob)
        assert len(back.frames) == len(frames)
        for want, got in zip(frames, back.frames):
            assert got[0] == want[0]  # FrameMeta dataclass equality (all fields)
            assert got[1:] == want[1:]
        assert back.committed_seq == 7 and back.generation == 3
        assert back.stored_merkle == toc.merkle_root() == back.merkle_root()
        # re-encode is byte-stable (modulo the decoded stored_merkle which encode ignores)
        assert StoreTOC.decode(back.encode()).merkle_root() == toc.merkle_root()

    @settings(max_examples=20, deadline=None)
    @given(frames=frame_records(), flip=st.integers(0, 10**6))
    def test_any_corruption_detected_or_valid(self, frames, flip):
        toc = StoreTOC(frames=frames, manifests={}, segment_catalog=(), committed_seq=0, generation=1)
        blob = bytearray(toc.encode())
        pos = flip % len(blob)
        blob[pos] ^= 0x5A
        from wax_tpu.storage.codec import CodecError

        try:
            StoreTOC.decode(bytes(blob))
        except CodecError:
            pass  # detected — the expected outcome for nearly every flip
        # (a flip that lands on ignorable padding may decode; never crash otherwise)


# -- raw array container -------------------------------------------------------------

from wax_tpu.orchestrator.serialization import load_arrays, save_arrays  # noqa: E402

_dtypes = st.sampled_from([np.int32, np.int64, np.float32, np.uint8, np.bool_])


class TestArrayContainer:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_roundtrip(self, data):
        n_arrays = data.draw(st.integers(0, 4))
        arrays = {}
        for i in range(n_arrays):
            dt = data.draw(_dtypes)
            shape = tuple(data.draw(st.lists(st.integers(0, 5), min_size=0, max_size=2)))
            arrays[f"a{i}"] = np.zeros(shape, dt)
        blob = save_arrays(arrays)
        back = load_arrays(blob)
        assert set(back) == set(arrays)
        for k in arrays:
            assert back[k].dtype == arrays[k].dtype
            assert back[k].shape == arrays[k].shape


# -- frozen lex under mutation sequences ---------------------------------------------

from wax_tpu.index.lex import LexIndexBuilder  # noqa: E402
from wax_tpu.orchestrator.serialization import deserialize_lex, serialize_lex  # noqa: E402

_word = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6)
_doc = st.lists(_word, min_size=1, max_size=8).map(" ".join)


class TestFrozenLexEquivalence:
    @settings(max_examples=25, deadline=None)
    @given(
        docs=st.lists(_doc, min_size=1, max_size=8),
        ops=st.lists(st.tuples(st.sampled_from(["remove", "add"]), st.integers(0, 20)), max_size=5),
    )
    def test_frozen_and_dict_builders_agree_after_ops(self, docs, ops):
        a = LexIndexBuilder()
        a.add_batch(list(enumerate(docs)))
        blob, attrs = serialize_lex(a)
        b = deserialize_lex(blob, attrs)  # frozen
        next_id = len(docs)
        for op, x in ops:
            if op == "remove":
                fid = x % (next_id or 1)
                assert a.remove(fid) == b.remove(fid)
            else:
                text = f"added doc number {x}"
                a.add(next_id, text)
                b.add(next_id, text)
                next_id += 1
        sa, sb = a.snapshot(), b.snapshot()
        for f in ("doc_rows", "tfs", "offsets", "idf", "doc_len", "frame_ids", "active"):
            np.testing.assert_array_equal(np.asarray(getattr(sa, f)), np.asarray(getattr(sb, f)), err_msg=f)


# -- dedup_topk invariants ------------------------------------------------------------

from wax_tpu.index.ivf import dedup_topk  # noqa: E402


class TestDedupTopkProperties:
    @settings(max_examples=40, deadline=None)
    @given(data=st.data())
    def test_invariants(self, data):
        b = data.draw(st.integers(1, 3))
        w = data.draw(st.integers(1, 12))
        k = data.draw(st.integers(1, w))
        fids = np.array(
            [[data.draw(st.integers(-1, 6)) for _ in range(w)] for _ in range(b)], np.int32
        )
        # no subnormals: XLA flushes them to zero, making "best copy of a fid"
        # ambiguous at <1e-38 score granularity (meaningless for retrieval scores)
        vals = np.array(
            [[data.draw(st.floats(-10, 10, allow_nan=False, allow_subnormal=False, width=32)) for _ in range(w)] for _ in range(b)],
            np.float32,
        )
        vals = np.where(np.abs(vals) < 1e-30, 0.0, vals).astype(np.float32)
        vals = np.where(fids < 0, np.float32(-3.0e38), vals)
        ov, of = dedup_topk(jnp.asarray(vals), jnp.asarray(fids), k)
        ov, of = np.asarray(ov), np.asarray(of)
        for r in range(b):
            live = of[r][of[r] >= 0]
            # 1. no duplicate ids
            assert len(live) == len(set(live.tolist()))
            # 2. scores descending over live entries
            lv = ov[r][of[r] >= 0]
            assert all(lv[i] >= lv[i + 1] - 1e-6 for i in range(len(lv) - 1))
            # 3. each surviving id carries its BEST input score
            for fid, v in zip(live.tolist(), lv.tolist()):
                best = vals[r][fids[r] == fid].max()
                assert v == best
            # 4. count = min(k, distinct live input ids)
            distinct = len(set(fids[r][fids[r] >= 0].tolist()))
            assert len(live) == min(k, distinct)


# -- PDF structured mutations ---------------------------------------------------------

from wax_tpu.text.pdf import extract_pdf_text  # noqa: E402


class TestPdfNeverCrashes:
    @settings(max_examples=30, deadline=None)
    @given(body=st.binary(max_size=400))
    def test_arbitrary_bodies(self, body):
        out = extract_pdf_text(b"%PDF-1.4\n" + body)
        assert isinstance(out, str)

    @settings(max_examples=20, deadline=None)
    @given(
        objnum=st.integers(0, 99),
        dict_bytes=st.text(alphabet="<>/[]()0123456789 RLengthTypePageobj\\", max_size=60),
    )
    def test_object_shaped_garbage(self, objnum, dict_bytes):
        pdf = f"%PDF-1.4\n{objnum} 0 obj\n{dict_bytes}\nendobj\n".encode("latin-1")
        assert isinstance(extract_pdf_text(pdf), str)


# -- tokenizer normalization ----------------------------------------------------------

from wax_tpu.text.wordpiece import _basic_normalize  # noqa: E402


class TestNormalizeProperties:
    @settings(max_examples=60, deadline=None)
    @given(s=st.text(max_size=60))
    def test_idempotent(self, s):
        once = _basic_normalize(s)
        assert _basic_normalize(once) == once

    @settings(max_examples=60, deadline=None)
    @given(s=st.text(max_size=60))
    def test_output_has_no_marks_or_controls(self, s):
        import unicodedata

        for c in _basic_normalize(s):
            cat = unicodedata.category(c)
            assert cat != "Mn"
            assert not (cat.startswith("C") and c not in ("\t", "\n", "\r"))
