"""BPE / token counter / chunker: exactness vs tiktoken (when vocab available),
determinism, subadditivity, truncation, chunk overlap.

Mirrors the reference's tokenization test axis (DeterminismPropertyTests token-count
subadditivity; TokenCounter comparison stats vs swift-tiktoken).
"""
import os
from pathlib import Path

import pytest

from wax_tpu.text.bpe import BpeEncoder, find_cl100k_vocab, load_cl100k
from wax_tpu.text.chunker import ChunkingStrategy, chunk_text
from wax_tpu.text.token_counter import TokenCounter

SAMPLES = [
    "Hello, world!",
    "The quick brown fox jumps over the lazy dog.",
    "número de teléfono: +34 612 345 678",
    "def f(x):\n    return x ** 2  # square\n",
    "unicode: 日本語のテキスト and emoji 🎉🎉",
    "",
    "    leading and trailing whitespace     ",
    "it's we've they'll I'd o'clock",
]

_vocab = find_cl100k_vocab()


class TestBpe:
    @pytest.mark.skipif(_vocab is None, reason="no cl100k vocab file on this machine")
    def test_exact_matches_tiktoken(self):
        tiktoken = pytest.importorskip("tiktoken")
        from tiktoken.load import load_tiktoken_bpe  # noqa: F401

        enc = BpeEncoder.from_tiktoken_file(_vocab)
        ref = tiktoken.Encoding(
            name="cl100k_test",
            pat_str=r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+""",
            mergeable_ranks={k: v for k, v in enc.ranks.items()},
            special_tokens={},
        )
        for s in SAMPLES:
            assert enc.encode(s) == ref.encode(s), repr(s)

    @pytest.mark.skipif(_vocab is None, reason="no cl100k vocab file")
    def test_roundtrip(self):
        enc = BpeEncoder.from_tiktoken_file(_vocab)
        for s in SAMPLES:
            assert enc.decode(enc.encode(s)) == s

    def test_vendored_vocab_gives_exact_counts(self):
        # Exact counts are a contract (reference: RAG/TokenCounter.swift:6-460); the
        # vendored resources/cl100k_base.tiktoken.gz must make them available with no
        # external checkout, cache dir, or env var present.
        import wax_tpu.text.bpe as bpe_mod

        old = dict(os.environ)
        for var in ("WAX_TPU_CL100K", "TIKTOKEN_CACHE_DIR"):
            os.environ.pop(var, None)
        try:
            path = find_cl100k_vocab()
            assert path is not None and path.name == "cl100k_base.tiktoken.gz"
            assert path.is_relative_to(Path(bpe_mod.__file__).parent)
            enc = BpeEncoder.from_tiktoken_file(path)
            assert enc.exact
            assert len(enc.ranks) > 100_000
            assert enc.decode(enc.encode("Hello, world!")) == "Hello, world!"
        finally:
            os.environ.clear()
            os.environ.update(old)

    def test_fallback_deterministic(self):
        enc = BpeEncoder.byte_fallback()
        assert enc.encode("hello world") == enc.encode("hello world")
        assert not enc.exact

    def test_subadditivity(self):
        enc = load_cl100k()
        for a in SAMPLES:
            for b in SAMPLES:
                assert enc.count(a + b) <= enc.count(a) + enc.count(b) + 1


class TestTokenCounter:
    def test_cache_hits(self):
        tc = TokenCounter()
        tc.count("repeated text")
        tc.count("repeated text")
        assert tc.stats["hits"] >= 1

    def test_truncate_respects_budget(self):
        tc = TokenCounter()
        long = " ".join(f"word{i}" for i in range(500))
        out = tc.truncate(long, 50)
        assert tc.count(out) <= 50
        assert out  # non-empty

    def test_truncate_noop_if_under(self):
        tc = TokenCounter()
        assert tc.truncate("short", 100) == "short"

    def test_input_cap(self):
        tc = TokenCounter()
        with pytest.raises(ValueError):
            tc.count("x" * (8 * 1024 * 1024 + 1))

    def test_batch(self):
        tc = TokenCounter()
        counts = tc.count_batch(["a b c", "d e"])
        assert counts == [tc.count("a b c"), tc.count("d e")]


class TestChunker:
    def _corpus(self, n=300):
        return " ".join(
            f"Sentence number {i} talks about subject {i % 7} in some detail." for i in range(n)
        )

    def test_single_chunk_if_small(self):
        chunks = chunk_text("tiny text")
        assert len(chunks) == 1 and chunks[0].index == 0

    def test_chunks_respect_target(self):
        strat = ChunkingStrategy(target_tokens=100, overlap_tokens=10)
        chunks = chunk_text(self._corpus(), strat)
        assert len(chunks) > 3
        for c in chunks:
            assert c.token_count <= 110  # small tolerance over target

    def test_coverage_no_text_lost(self):
        tc = TokenCounter()
        strat = ChunkingStrategy(target_tokens=80, overlap_tokens=8)
        text = self._corpus(100)
        chunks = chunk_text(text, strat, tc)
        # every sentence must appear in at least one chunk
        for i in range(100):
            marker = f"Sentence number {i} "
            assert any(marker in c.text for c in chunks), marker

    def test_overlap_exists(self):
        tc = TokenCounter()
        strat = ChunkingStrategy(target_tokens=80, overlap_tokens=20)
        chunks = chunk_text(self._corpus(100), strat, tc)
        if tc.exact and len(chunks) > 1:
            # consecutive chunks share some suffix/prefix words
            for a, b in zip(chunks, chunks[1:]):
                shared = set(a.text.split()[-10:]) & set(b.text.split()[:30])
                assert shared, (a.text[-80:], b.text[:80])

    def test_invalid_strategy(self):
        with pytest.raises(ValueError):
            ChunkingStrategy(target_tokens=10, overlap_tokens=10)

    def test_deterministic(self):
        strat = ChunkingStrategy(target_tokens=60, overlap_tokens=6)
        c1 = chunk_text(self._corpus(50), strat)
        c2 = chunk_text(self._corpus(50), strat)
        assert [c.text for c in c1] == [c.text for c in c2]
