"""Property-based tests (hypothesis): codec round-trips, WAL integrity, BPE
determinism/subadditivity, RRF invariants, chunker coverage.

Extends the reference's determinism-property axis (DeterminismPropertyTests.swift:5-56)
with generative coverage.
"""
import string

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from wax_tpu.ops.fusion import rrf_fuse
from wax_tpu.storage.codec import BinaryDecoder, BinaryEncoder
from wax_tpu.text.bpe import load_cl100k
from wax_tpu.text.token_counter import TokenCounter

_SETTINGS = settings(max_examples=50, deadline=None)

text_strategy = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)), max_size=300
)


class TestCodecProperties:
    @_SETTINGS
    @given(
        u32=st.integers(0, 2**32 - 1),
        i64=st.integers(-(2**63), 2**63 - 1),
        s=text_strategy,
        blob=st.binary(max_size=500),
        flag=st.booleans(),
    )
    def test_roundtrip(self, u32, i64, s, blob, flag):
        e = BinaryEncoder().u32(u32).i64(i64).string(s).blob(blob).boolean(flag)
        d = BinaryDecoder(e.data())
        assert d.u32() == u32
        assert d.i64() == i64
        assert d.string() == s
        assert d.blob() == blob
        assert d.boolean() is flag
        assert d.remaining == 0

    @_SETTINGS
    @given(m=st.dictionaries(st.text(max_size=20), st.text(max_size=20), max_size=10))
    def test_map_roundtrip_and_determinism(self, m):
        e1 = BinaryEncoder().str_map(m).data()
        e2 = BinaryEncoder().str_map(dict(reversed(list(m.items())))).data()
        assert e1 == e2  # insertion-order independent
        assert BinaryDecoder(e1).str_map() == m


class TestBpeProperties:
    enc = load_cl100k()
    tc = TokenCounter()

    @_SETTINGS
    @given(s=text_strategy)
    def test_deterministic(self, s):
        assert self.enc.encode(s) == self.enc.encode(s)

    @_SETTINGS
    @given(a=text_strategy, b=text_strategy)
    def test_concat_boundary_bounded(self, a, b):
        """BPE is NOT strictly subadditive: the pre-tokenizer can merge the join into
        one word whose BPE is longer than the parts' (e.g. "true"+"true" -> "truetrue"
        re-splits to 4 tokens vs 1+1). What IS true: only the straddling boundary word
        re-tokenizes, and a word's token count never exceeds its byte length."""
        import re

        tail = re.search(r"\S*\s*$", a).group(0)
        head = re.match(r"\s*\S*", b).group(0)
        boundary_bytes = len((tail + head).encode("utf-8"))
        assert self.enc.count(a + b) <= self.enc.count(a) + self.enc.count(b) + boundary_bytes
        # and token count never exceeds byte count overall
        assert self.enc.count(a + b) <= max(1, len((a + b).encode("utf-8"))) if (a + b) else True

    @_SETTINGS
    @given(s=text_strategy)
    def test_roundtrip_when_exact(self, s):
        if self.enc.exact:
            assert self.enc.decode(self.enc.encode(s)) == s

    @_SETTINGS
    @given(s=st.text(alphabet=string.printable, min_size=1, max_size=400), k=st.integers(0, 50))
    def test_truncate_budget(self, s, k):
        out = self.tc.truncate(s, k)
        assert self.tc.count(out) <= k or k == 0


class TestRrfProperties:
    lanes_strategy = st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.lists(st.tuples(st.integers(0, 30), st.floats(0, 10, allow_nan=False)), max_size=10),
        min_size=1,
        max_size=3,
    )

    @_SETTINGS
    @given(lanes=lanes_strategy)
    def test_idempotent(self, lanes):
        w = {"a": 0.5, "b": 0.3, "c": 0.2}
        assert rrf_fuse(lanes, w) == rrf_fuse(lanes, w)

    @_SETTINGS
    @given(lanes=lanes_strategy)
    def test_scores_sorted_and_ids_unique(self, lanes):
        out = rrf_fuse(lanes, {"a": 0.5, "b": 0.3, "c": 0.2})
        scores = [h.score for h in out]
        assert scores == sorted(scores, reverse=True)
        ids = [h.frame_id for h in out]
        assert len(set(ids)) == len(ids)

    @_SETTINGS
    @given(lanes=lanes_strategy, k=st.integers(1, 5))
    def test_topk_is_prefix(self, lanes, k):
        full = rrf_fuse(lanes, {"a": 0.5, "b": 0.3, "c": 0.2})
        topk = rrf_fuse(lanes, {"a": 0.5, "b": 0.3, "c": 0.2}, top_k=k)
        assert topk == full[:k]


class TestRerankProperties:
    """The intent-aware rerank is a pure function: deterministic, tail-preserving,
    and invariant to how the head window happened to be ordered on score ties
    (extends DeterminismPropertyTests with the rerank axis; reference weights in
    wax_tpu/search/rerank.py)."""

    @staticmethod
    def _mk(hits_data):
        from dataclasses import dataclass

        @dataclass(frozen=True)
        class H:
            frame_id: int
            score: float
            sources: tuple = ("bm25",)

        return [H(fid, sc) for fid, sc in hits_data]

    previews_strategy = st.lists(
        st.tuples(
            st.floats(0.001, 1.0, allow_nan=False),
            st.sampled_from(
                [
                    "Dana owns deployment readiness for the rollout",
                    "the public launch is March 14, 2024",
                    "draft memo: tentative launch target is April 2",
                    "weekly report checklist needs signoff",
                    "Omar moved to Valencia last spring",
                    "a note about gardening and nothing else",
                ]
            ),
        ),
        min_size=2,
        max_size=10,
    )

    @_SETTINGS
    @given(data=previews_strategy)
    def test_deterministic_and_tail_preserving(self, data):
        from wax_tpu.search.rerank import intent_aware_rerank
        from wax_tpu.text.analyzer import analyze_query

        hits = self._mk([(i, s) for i, (s, _) in enumerate(data)])
        previews = {i: t for i, (_, t) in enumerate(data)}
        signals = analyze_query('who owns deployment readiness for the "public launch"')
        a = intent_aware_rerank(hits, previews, signals, 4, lambda h: False)
        b = intent_aware_rerank(hits, previews, signals, 4, lambda h: False)
        assert a == b
        assert a[4:] == hits[4:]  # tail untouched
        assert sorted(h.frame_id for h in a) == sorted(h.frame_id for h in hits)

    @_SETTINGS
    @given(data=previews_strategy)
    def test_equal_score_head_is_permutation_stable(self, data):
        # equal original scores: reordering the input head must not change which
        # frame wins (composite + frame-id tie-break fully determine the order)
        from wax_tpu.search.rerank import intent_aware_rerank
        from wax_tpu.text.analyzer import analyze_query

        hits = self._mk([(i, 0.5) for i in range(len(data))])
        previews = {i: t for i, (_, t) in enumerate(data)}
        signals = analyze_query("when is the public launch date for Atlas10")
        w = len(hits)
        a = intent_aware_rerank(hits, previews, signals, w, lambda h: False)
        b = intent_aware_rerank(list(reversed(hits)), previews, signals, w, lambda h: False)
        assert [h.frame_id for h in a] == [h.frame_id for h in b]

    def test_answer_rerank_prefers_authoritative_over_tentative(self):
        from wax_tpu.search.rerank import rerank_for_answer
        from wax_tpu.text.analyzer import analyze_query

        contents = {
            0: "Draft memo: the public launch target is April 2, pending approval.",
            1: "The public launch is March 14, 2024.",
        }
        hits = self._mk([(0, 0.55), (1, 0.50)])  # distractor ranks first by raw score
        out = rerank_for_answer(
            hits,
            contents=lambda f: contents[f],
            signals=analyze_query("when is the public launch"),
            window=2,
            distractor_penalty=0.30,
            vector_influenced=True,
        )
        assert out[0].frame_id == 1

    def test_search_rerank_demotes_distractors(self):
        from wax_tpu.search.rerank import intent_aware_rerank
        from wax_tpu.text.analyzer import analyze_query

        previews = {
            0: "The public launch weekly report needs a signoff from Dana's team.",
            1: "Dana owns deployment readiness for the rollout.",
        }
        hits = self._mk([(0, 0.55), (1, 0.50)])
        out = intent_aware_rerank(
            hits, previews, analyze_query("who owns deployment readiness Dana"),
            window=2, vector_influenced=lambda h: False,
        )
        assert out[0].frame_id == 1


class TestWalProperties:
    @_SETTINGS
    @given(fids=st.lists(st.integers(0, 10**6), min_size=1, max_size=30))
    def test_append_scan_roundtrip(self, fids, tmp_path_factory):
        from wax_tpu.storage.fdfile import FDFile
        from wax_tpu.storage.wal import WalEntry, WalOp, WalRingReader, WalRingWriter

        p = tmp_path_factory.mktemp("wal") / "ring.bin"
        with FDFile(p, create=True) as fd:
            fd.pwrite_exact(0, b"\x00" * 65536)
            w = WalRingWriter(fd, 0, 65536)
            w.write_sentinel(0)
            for fid in fids:
                w.append(WalEntry(op=WalOp.DELETE_FRAME, frame_id=fid))
            r = WalRingReader(fd, 0, 65536)
            res = r.scan_pending(0, 0)
            assert [e.frame_id for _, e in res.entries] == fids
            assert res.stopped_on == "sentinel"
