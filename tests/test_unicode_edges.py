"""Unicode edge cases across the text stack: WordPiece tokenizer, lex analyzer,
cl100k token counting, chunker.

Mirrors the reference's tokenizer-edge breadth (reference: BertTokenizer.swift's
basic-tokenizer normalization and Tests/WaxIntegrationTests tokenizer suites):
CJK per-character treatment, accent stripping, emoji, control chars, RTL scripts,
surrogate-heavy strings, zero-width characters.
"""
import numpy as np
import pytest

from wax_tpu.index.lex import analyze
from wax_tpu.text.token_counter import TokenCounter
from wax_tpu.text.wordpiece import CLS_ID, SEP_ID, WordPieceTokenizer, _basic_normalize


class TestBasicNormalize:
    def test_accent_stripping(self):
        assert _basic_normalize("Café Naïve Zürich") == "cafe naive zurich"

    def test_case_folding(self):
        assert _basic_normalize("HeLLo WORLD") == "hello world"

    def test_control_chars_removed_but_whitespace_kept(self):
        assert _basic_normalize("a\x00b\x07c") == "abc"
        assert _basic_normalize("a\tb\nc") == "a\tb\nc"

    def test_zero_width_removed(self):
        # ZWSP is Cf (format) — removed like HF's _clean_text does for controls
        assert _basic_normalize("a​b") == "ab"

    def test_combining_sequence(self):
        # e + combining acute == precomposed é — both normalize to 'e'
        assert _basic_normalize("é") == _basic_normalize("é") == "e"


class TestWordPieceUnicode:
    @pytest.fixture()
    def tok(self):
        return WordPieceTokenizer(vocab_size=30522)

    def _ids(self, tok, text):
        ids = tok.encode(text)
        assert ids[0] == CLS_ID and ids[-1] == SEP_ID
        return ids[1:-1]

    def test_cjk_one_token_per_char(self, tok):
        ids = self._ids(tok, "日本語")
        assert len(ids) == 3
        # per-character: each char alone produces the same id
        singles = [self._ids(tok, c)[0] for c in "日本語"]
        assert ids == singles

    def test_mixed_scripts(self, tok):
        ids = self._ids(tok, "TPU向けの retrieval エンジン")
        assert len(ids) >= 6  # latin words + per-char kana/kanji

    def test_emoji_do_not_crash_and_are_stable(self, tok):
        a = self._ids(tok, "rocket 🚀 launch")
        b = self._ids(tok, "rocket 🚀 launch")
        assert a == b and len(a) >= 3

    def test_accented_equals_stripped(self, tok):
        assert self._ids(tok, "café") == self._ids(tok, "cafe")
        assert self._ids(tok, "CAFÉ") == self._ids(tok, "cafe")

    def test_rtl_hebrew_arabic(self, tok):
        for text in ("שלום עולם", "مرحبا بالعالم"):
            ids = self._ids(tok, text)
            assert ids and all(isinstance(i, int) for i in ids)

    def test_empty_and_whitespace_only(self, tok):
        assert self._ids(tok, "") == []
        assert self._ids(tok, " \t\n ") == []

    def test_null_bytes_ignored(self, tok):
        assert self._ids(tok, "he\x00llo") == self._ids(tok, "hello")

    def test_very_long_word_truncates_to_max_len(self, tok):
        ids = tok.encode("x" * 10_000, max_len=32)
        assert len(ids) <= 32 and ids[-1] == SEP_ID

    def test_batch_mask_covers_exact_tokens(self, tok):
        ids, mask = tok.encode_batch(["one", "日本語のテキスト", ""], 64)
        lens = mask.sum(axis=1)
        assert lens[0] >= 3 and lens[1] > lens[0] and lens[2] == 2  # CLS+SEP only
        assert ids.shape == mask.shape
        assert (ids[mask == 0] == 0).all()

    def test_determinism_across_instances(self):
        a = WordPieceTokenizer(vocab_size=30522).encode("déjà vu 日本 🚀")
        b = WordPieceTokenizer(vocab_size=30522).encode("déjà vu 日本 🚀")
        assert a == b


class TestAnalyzerUnicode:
    """unicode61-parity for the BM25 analyzer (reference: FTS5 unicode61)."""

    def test_accents_folded(self):
        assert analyze("Café crème brûlée") == ["cafe", "creme", "brulee"]

    def test_cjk_retained(self):
        terms = analyze("日本語テキスト search")
        assert "search" in terms and any("日" in t for t in terms)

    def test_emoji_separates_words(self):
        assert analyze("alpha🚀beta") == ["alpha", "beta"]

    def test_numbers_and_underscore(self):
        # unicode61 default: '_' is a separator
        assert analyze("foo_bar42") == ["foo", "bar42"]

    def test_case_fold_unicode(self):
        # unicode61 simple fold: ß is NOT expanded to ss (FTS5 ground truth,
        # tests/test_fts5_parity.py), unlike Python casefold
        assert analyze("STRASSE Straße") == ["strasse", "straße"]


class TestTokenCounterUnicode:
    @pytest.fixture(scope="class")
    def counter(self):
        return TokenCounter()

    def test_emoji_counts_positive_and_stable(self, counter):
        n1 = counter.count("🚀🚀🚀")
        n2 = counter.count("🚀🚀🚀")
        assert n1 == n2 > 0

    def test_cjk_counts(self, counter):
        assert counter.count("日本語のドキュメント") > 0

    def test_truncate_respects_budget_on_multibyte(self, counter):
        text = "héllo wörld 🚀 " * 50
        cut = counter.truncate(text, 20)
        assert counter.count(cut) <= 20
        # must remain valid UTF-8-decodable text
        cut.encode("utf-8").decode("utf-8")

    def test_subadditivity_on_unicode(self, counter):
        a, b = "naïve café ", "日本語 🚀"
        assert counter.count(a + b) <= counter.count(a) + counter.count(b) + 1
