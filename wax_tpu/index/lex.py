"""Lexical (BM25) index: CSR postings snapshot + host-side builder.

TPU-first replacement for the reference's SQLite FTS5 engine (reference:
Sources/WaxTextSearch/FTS5SearchEngine.swift:5-985 — in-memory FTS5 virtual table,
BM25 ranking via bm25(), whole-image serialization into the lex segment). Instead of a
C B-tree engine, the TPU build keeps postings as flat CSR arrays that score on device
via gathers + one fused scatter-add (wax_tpu/ops/bm25.py); "serializing the SQLite
image" becomes serializing the CSR arrays (see wax_tpu/orchestrator/serialization.py).

Analyzer parity: FTS5's default unicode61 tokenizer (case-fold, split on
non-alphanumeric, no stemming) is mirrored by `analyze`. Scoring parity: BM25 with
k1=1.2, b=0.75 (SQLite's built-in constants); FTS5's rank is negative-better and the
reference maps it to a positive score (FTS5SearchEngine.swift:966) — we produce the
positive BM25 score directly and keep `score_from_rank` for parity tests.
"""
from __future__ import annotations

import dataclasses
import re
from collections import Counter
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LexIndex", "LexIndexBuilder", "analyze", "BM25_K1", "BM25_B", "auto_postings_floor"]


def auto_postings_floor(n_rows: int) -> int | None:
    """The "auto" per-term postings budget for an n_rows corpus: None (exact)
    below 256K rows, then max(4096, n//256) — the measured ≥0.97 recall point
    (scripts/budget_recall.py). A MANUAL budget below this floor can silently
    lose recall, worst for AND queries (a conjunction dies if any one term's
    impact head drops the doc); unified search surfaces a warning there."""
    return None if n_rows < 262_144 else max(4096, n_rows // 256)

BM25_K1 = 1.2
BM25_B = 0.75
# Persisted in lex segment attrs; bump WHENEVER analyze()'s token output changes.
# A store whose segment carries a different version is silently unsearchable
# (stored vocab vs query tokens diverge), so the orchestrator rebuilds the lex
# index from frames on mismatch. "u61-r4" = probed-unicode61 tables (round 4);
# segments without the attr predate versioning (round-3 NFKD+casefold analyzer).
ANALYZER_VERSION = "u61-r4"
# forward-index width cap: docs with more unique terms keep only their
# highest-impact FWD_WIDTH_CAP terms in fwd_tids/fwd_wnorm (rescore slightly
# underestimates only those outlier docs)
FWD_WIDTH_CAP = 512

def _build_tokenizer():
    """Compile the probed unicode61 tables (text/unicode61_tables.py) into a
    run-finding regex + a per-char translate map.

    A token is a maximal run of token/internal chars; internal chars (the 25
    combining diacritics unicode61 strips) delete within a run, token chars map
    through the simple-fold table. Exactness vs the real FTS5 engine is enforced
    differentially in tests/test_fts5_parity.py."""
    from wax_tpu.text.unicode61_tables import (
        INTERNAL_RANGES,
        TOKEN_FOLD,
        TOKEN_RANGES,
    )

    cls = "".join(
        f"{chr(a)}-{chr(b)}" if b > a else re.escape(chr(a))
        for a, b in sorted(TOKEN_RANGES + INTERNAL_RANGES)
    )
    run_re = re.compile(f"[{cls}]+")
    trans: dict[int, str | None] = dict(TOKEN_FOLD)
    for a, b in INTERNAL_RANGES:
        for cp in range(a, b + 1):
            trans[cp] = None
    return run_re, trans


_TOKEN_RUN_RE, _FOLD_TRANS = _build_tokenizer()


_FOLD_MEMO: dict[str, str] = {}
_FOLD_MEMO_CAP = 262144  # natural token vocab is far smaller; guard only


def analyze(text: str) -> list[str]:
    """Exact SQLite unicode61 analysis (the reference's tokenizer — FTS5
    `tokenize='unicode61'`): simple per-char case folding, Latin diacritic
    removal, split on unicode61 separators. Tables probed from the real engine
    (scripts/gen_unicode61_tables.py); no NFKC compatibility folding — fullwidth
    forms, ligatures and ß survive, exactly as FTS5 keeps them.

    Folding is memoized per token run (pure function; repeated words dominate
    natural corpora, and str.translate over the 2K-entry fold table is the
    ingest-path hot loop otherwise)."""
    memo = _FOLD_MEMO
    out = []
    for m in _TOKEN_RUN_RE.finditer(text):
        run = m.group()
        t = memo.get(run)
        if t is None:
            t = run.translate(_FOLD_TRANS)
            # length-bound keys: >64-char runs (hashes, base64) barely repeat
            # and would let the process-global memo pin unbounded host RAM
            if len(run) <= 64:
                if len(memo) >= _FOLD_MEMO_CAP:
                    memo.clear()
                memo[run] = t
        if t:
            out.append(t)
    return out


def score_from_rank(rank: float) -> float:
    """Map an FTS5 negative-better rank to a higher-is-better score, mirroring the
    reference's scoreFromBM25Rank exactly (FTS5SearchEngine.swift:966-970:
    non-finite -> 0, else -rank). Our device scorer produces the positive BM25 sum
    directly, which equals -bm25() — so score_from_rank(fts5_rank) == device score."""
    import math

    return 0.0 if not math.isfinite(rank) else -rank


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LexIndex:
    """Device-resident CSR postings snapshot (pytree).

    Attributes:
      doc_rows:  [P] int32 — row index of each posting (grouped by term).
      tfs:       [P] float32 — term frequency of each posting.
      offsets:   [T+1] int32 — CSR offsets per term id.
      idf:       [T] float32 — BM25+ idf per term.
      doc_len:   [N_cap] float32 — analyzed token count per row.
      frame_ids: [N_cap] int32 — row -> external id (-1 pad/tombstone).
      active:    [N_cap] bool.
      count:     scalar int32 — occupied rows.
      avgdl:     scalar float32 — mean doc length over live rows.
      wnorm:     [P] float32 — precomputed tf-normalized weight per posting
                 (tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)); 0 for tombstoned rows) so
                 the candidate-set BM25 kernel (ops/bm25_candidates.py) streams
                 postings without any doc_len random gather. contribution =
                 idf[t] · wnorm[p].
      doc_rows_rev / wnorm_rev: [P] — per-term REVERSED copies (same offsets); the
                 Pallas kernel DMAs odd merge slots from these so every run
                 arrives pre-reversed and the bitonic merge tree needs zero
                 reversal stages (+8 B/posting HBM for ~15% kernel time).
      fwd_tids / fwd_wnorm: [N_cap, L_pad] doc-major forward index (-1 / 0.0
                 padding) — each doc's COMPLETE unique-term list with exact
                 per-(doc, term) weights. Present ONLY when the postings budget
                 actually truncated a term (otherwise candidate scores are
                 already exact): the rescore pass (ops/bm25_rescore.py) restores
                 exact multi-term scores for the top-F candidates.
      max_df:    static int — longest postings list (device scoring budget W).
    """

    doc_rows: jax.Array
    tfs: jax.Array
    offsets: jax.Array
    idf: jax.Array
    doc_len: jax.Array
    frame_ids: jax.Array
    active: jax.Array
    count: jax.Array
    avgdl: jax.Array
    wnorm: jax.Array | None = None
    doc_rows_rev: jax.Array | None = None
    wnorm_rev: jax.Array | None = None
    fwd_tids: jax.Array | None = None
    fwd_wnorm: jax.Array | None = None
    fwd_fused: jax.Array | None = None
    # impact-chunked PACKED postings (present iff the budget truncated a term —
    # exactly when fwd_tids is): per term, ceil(df/1024) chunks where chunk j
    # holds impact ranks [j*1024, (j+1)*1024) row-sorted, each posting pre-packed
    # as (row << pk_qb) | quantized(idf*wnorm), 1024-aligned blocks padded with
    # INT32_MAX, plus one all-INT32_MAX sentinel block at the end (dead slots).
    # pk_chunks_rev reverses each 1024-block in place (odd merge slots).
    # The chunked candidate kernel (ops/bm25_chunked_pallas.py) water-fills these
    # chunks across the query's terms into a fixed merge plane.
    pk_chunks: jax.Array | None = None
    pk_chunks_rev: jax.Array | None = None
    chunk_base: jax.Array | None = None  # [T] i32 first 1024-block of each term
    chunk_counts: jax.Array | None = None  # [T] i32 number of chunks per term
    max_df: int = dataclasses.field(metadata=dict(static=True), default=0)
    pk_qb: int = dataclasses.field(metadata=dict(static=True), default=0)
    pk_max_chunks: int = dataclasses.field(metadata=dict(static=True), default=0)
    # real (pre-padding) forward-index width: lets the rescore kernel pack two
    # candidates per 128-lane row when docs have <= 64 unique terms
    fwd_width: int = dataclasses.field(metadata=dict(static=True), default=0)
    # fused forward index [N_cap, 2*L2] i32 (fuse_forward): tids | f32 weight
    # bits — the rescore's single-gather fast path (exact_rescore_fused)

    @property
    def n_terms(self) -> int:
        return self.idf.shape[0]

    @property
    def n_postings(self) -> int:
        return self.doc_rows.shape[0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def dma_window(max_df: int) -> int:
    """Static DMA window (flat elements) the candidate-set BM25 kernel streams per
    query term: pow2 >= max_df + 1024. The +1024 head-room lets every window start
    on the enclosing 1024-aligned boundary (i32/f32 HBM tile = (8, 128); Mosaic
    requires provably tile-aligned dynamic slice offsets) with the unaligned head
    masked in-kernel. Snapshots pad the postings arrays past the last posting by
    this amount so no window can overrun."""
    w = 2048
    while w < max_df + 1024:
        w *= 2
    return w


def reverse_postings_copies(doc_rows: np.ndarray, wnorm: np.ndarray, offsets: np.ndarray):
    """Per-term reversed copies of (doc_rows, wnorm), same offsets.

    Vectorized: element at slice position j maps to off[t] + off[t+1] - 1 - j.
    Padding past the last posting is copied through unchanged.
    """
    p_total = int(offsets[-1])
    rev_r = doc_rows.copy()
    rev_w = wnorm.copy()
    if p_total:
        lengths = np.diff(offsets.astype(np.int64))
        mirror = np.repeat(offsets[:-1].astype(np.int64) + offsets[1:].astype(np.int64) - 1, lengths)
        src = mirror - np.arange(p_total, dtype=np.int64)
        rev_r[:p_total] = doc_rows[src]
        rev_w[:p_total] = wnorm[src]
    return rev_r, rev_w


PK_CHUNK = 1024  # flat elements per impact chunk (= the [P/1024, 8, 128] HBM tile)
_I32_MAX = np.int32(2**31 - 1)


def packed_row_bits(n_cap: int) -> tuple[int, int]:
    """(row_bits, qb) split of the 31 usable i32 bits for packed postings.

    row_bits = bit_length(n_cap) keeps max packed value strictly below INT32_MAX
    (the pad sentinel) even at row n_cap-1 with a saturated quantized weight.
    qb is capped at 12: ranking granularity gains nothing beyond that, and the
    kernel's rank*128 tie-break key must stay within i32."""
    rb = max(1, int(n_cap).bit_length())
    qb = min(31 - rb, 12)
    if qb < 6:
        raise ValueError(
            f"capacity {n_cap} leaves only {qb} quantization bits; "
            "shard the corpus below 2^25 rows per device"
        )
    return rb, qb


def build_impact_chunks(doc_rows, wnorm, offsets, idf, n_cap):
    """Impact-chunked PACKED postings for the chunked candidate kernel.

    Per term t: order its postings by exact BM25 contribution (idf[t]*wnorm,
    descending; ties lowest-row; tombstones con=0 last), split into PK_CHUNK-sized
    impact chunks, sort each chunk by row, and pack every posting into one i32
    (row << qb) | qcon with qcon = round(con/max_con * (2^qb-1)) clamped to
    [1, 2^qb-1] (0 for tombstones). Chunk blocks are 1024-aligned; pad slots and
    one trailing sentinel block carry INT32_MAX, so the kernel needs no masking:
    ascending (even) merge slots see trailing +inf pads and the per-block reversed
    copy gives descending (odd) slots leading +inf pads.

    Returns (pk [PB*1024] i32, pk_rev, chunk_base [T] i32, chunk_counts [T] i32,
    qb). The last block (PB-1) is the all-sentinel dead-slot target.
    Candidate RANKING is quantized; exact scores come from the forward-index
    rescore (ops/bm25_rescore.py), mirroring how FTS5 scores all postings exactly
    (reference: Sources/WaxTextSearch/FTS5SearchEngine.swift:129-161).
    """
    t = len(offsets) - 1
    p_total = int(offsets[-1])
    _, qb = packed_row_bits(n_cap)
    qmax = (1 << qb) - 1
    sizes = np.diff(offsets.astype(np.int64))
    nch = ((sizes + PK_CHUNK - 1) // PK_CHUNK).astype(np.int64)
    chunk_base = np.zeros(t, np.int32)
    if t:
        chunk_base[1:] = np.cumsum(nch)[:-1].astype(np.int32)
    pb_total = int(nch.sum()) + 1  # +1 sentinel dead block
    pk = np.full(pb_total * PK_CHUNK, _I32_MAX, np.int32)
    if p_total:
        rows = doc_rows[:p_total].astype(np.int64)
        tid_post = np.repeat(np.arange(t, dtype=np.int64), sizes)
        con = wnorm[:p_total].astype(np.float64) * idf[tid_post]
        scale = float(con.max())
        if scale <= 0.0:
            scale = 1.0
        qcon = np.clip(np.rint(con / scale * qmax), 1, qmax).astype(np.int64)
        qcon = np.where(con > 0.0, qcon, 0)
        # impact order within term (contribution desc, row asc ties)
        p1 = np.lexsort((rows, -con, tid_post))
        starts = np.concatenate([[0], np.cumsum(sizes)])
        chunk_j = (np.arange(p_total, dtype=np.int64) - starts[tid_post[p1]]) // PK_CHUNK
        # global chunk id of each (impact-ordered) posting, then row-sort per chunk
        gchunk = chunk_base[tid_post[p1]].astype(np.int64) + chunk_j
        p2 = np.lexsort((rows[p1], gchunk))
        g_sorted = gchunk[p2]
        src = p1[p2]
        # destination = chunk block start + rank within the chunk
        first_of_chunk = np.concatenate([[True], g_sorted[1:] != g_sorted[:-1]])
        chunk_start_pos = np.where(first_of_chunk, np.arange(p_total, dtype=np.int64), 0)
        chunk_start_pos = np.maximum.accumulate(chunk_start_pos)
        within = np.arange(p_total, dtype=np.int64) - chunk_start_pos
        dest = g_sorted * PK_CHUNK + within
        pk[dest] = ((rows[src] << qb) | qcon[src]).astype(np.int32)
    pk_rev = pk.reshape(-1, PK_CHUNK)[:, ::-1].reshape(-1).copy()
    return pk, pk_rev, chunk_base, nch.astype(np.int32), qb


def fuse_forward(fwd_tids: np.ndarray, fwd_wnorm: np.ndarray, width: int) -> np.ndarray:
    """Fuse the doc-major forward index into ONE i32 array [N, 2*L2].

    Lanes [0, L2) carry the tids (-1 pad), lanes [L2, 2*L2) the matching f32
    weights as raw bit patterns; L2 = the real width rounded up to 64 so the
    row stays a whole number of 128-lane vregs. The rescore's XLA row gather is
    per-ROW bound, so one fused gather costs half of two parallel ones
    (ops/bm25_rescore.py exact_rescore_fused)."""
    n = fwd_tids.shape[0]
    # stored pair width is >= 128 >= l2, so both slices below are full-width
    l2 = max(64, ((max(width, 1) + 63) // 64) * 64)
    fused = np.empty((n, 2 * l2), np.int32)
    fused[:, :l2] = fwd_tids[:, :l2]
    fused[:, l2:] = np.ascontiguousarray(fwd_wnorm[:, :l2].astype(np.float32)).view(np.int32)
    return fused


class LexIndexBuilder:
    """Host-side mutable postings builder producing `LexIndex` snapshots.

    Documents are analyzed on add; removal tombstones the row (postings stay but are
    masked by `active`, and are physically dropped on the next snapshot rebuild —
    the analogue of the reference's pending-op queue + stageForCommit flush
    (FTS5SearchEngine.swift:503-543)).
    """

    def __init__(self, postings_budget: int | str | None = None):
        # Optional per-term postings cap for the device scoring budget W (= max_df).
        # When a term's list exceeds it, the snapshot keeps the postings with the
        # HIGHEST exact BM25 contribution (impact ordering — the idf factor is a
        # per-term constant, so ordering by the tf/length normalization alone is
        # equivalent), i.e. the standard impact-ordered early-termination trade:
        # candidate GENERATION is limited to each term's impact head; returned
        # scores stay unbudgeted-exact via the forward-index rescore
        # (ops/bm25_rescore.py). None (default) keeps every posting — scoring is
        # exhaustive with no rescore pass. "auto" resolves per snapshot from the
        # row count (see resolve_postings_budget): exact below 256K rows, then
        # max(4096, n//256) — at 1M that budget holds recall@10 0.978 vs the
        # unbudgeted oracle through the rescore window (scripts/budget_recall.py).
        self.postings_budget = postings_budget
        self._vocab: dict[str, int] = {}
        self._postings: list[dict[int, int]] = []  # tid -> {row: tf}
        self._doc_terms: list[list[str]] = []  # kept for vocab gc on rebuild
        self._doc_len: list[int] = []
        self._frame_ids: list[int] = []
        self._active: list[bool] = []
        self._row_of: dict[int, int] = {}
        self._generation = 0
        # Frozen-CSR mode: a builder loaded from a v2 segment keeps numpy arrays
        # (token sequences + postings CSR) instead of per-term dicts; snapshot() is
        # then pure vectorized padding (the cold-open hot path), and the dicts are
        # materialized lazily on the first add()/compact() (_thaw). remove() works
        # directly on the frozen arrays (tombstoning touches only active/frame_ids).
        self._frozen: dict | None = None

    def __len__(self) -> int:
        return len(self._row_of)

    def __contains__(self, frame_id: int) -> bool:
        return int(frame_id) in self._row_of

    @property
    def generation(self) -> int:
        return self._generation

    def _tid(self, term: str) -> int:
        tid = self._vocab.get(term)
        if tid is None:
            tid = len(self._vocab)
            self._vocab[term] = tid
            self._postings.append({})
        return tid

    def add(self, frame_id: int, text: str) -> None:
        self._thaw()
        fid = int(frame_id)
        if fid in self._row_of:
            self.remove(fid)
        terms = analyze(text)
        row = len(self._doc_len)
        self._doc_terms.append(terms)
        self._doc_len.append(len(terms))
        self._frame_ids.append(fid)
        self._active.append(True)
        self._row_of[fid] = row
        for term, tf in Counter(terms).items():
            self._postings[self._tid(term)][row] = tf
        self._generation += 1

    def add_batch(self, items: list[tuple[int, str]]) -> None:
        for fid, text in items:
            self.add(fid, text)

    def remove(self, frame_id: int) -> bool:
        row = self._row_of.pop(int(frame_id), None)
        if row is None:
            return False
        if self._frozen is not None:
            self._frozen["active"][row] = False
            self._frozen["frame_ids"][row] = -1
        else:
            self._active[row] = False
            self._frame_ids[row] = -1
        self._generation += 1
        return True

    def term_ids(self, terms: list[str]) -> list[int]:
        """Map analyzed terms to term ids, dropping unknown terms."""
        out = []
        for t in terms:
            tid = self._vocab.get(t)
            if tid is not None:
                out.append(tid)
        return out

    def query_term_ids(self, query: str) -> list[int]:
        return self.term_ids(analyze(query))

    def row_space(self) -> int:
        """Padded row-space size a snapshot of the current state will use (without
        building one) — n_cap in LexIndex terms."""
        n = len(self._frozen["frame_ids"]) if self._frozen is not None else len(self._doc_len)
        return max(128, _round_up(max(n, 1), 128))

    def df(self, tid: int) -> int:
        """Document frequency of a term id (for idf-head selection of very long
        queries — ops/bm25.py pad_term_ids)."""
        if self._frozen is not None:
            po = self._frozen["post_offsets"]
            return int(po[tid + 1] - po[tid]) if 0 <= tid < len(po) - 1 else 0
        return len(self._postings[tid]) if 0 <= tid < len(self._postings) else 0

    # -- frozen-CSR fast path ---------------------------------------------------------
    @classmethod
    def from_frozen_arrays(
        cls, vocab_list: list[str], arrays: dict, postings_budget: int | str | None = None
    ) -> "LexIndexBuilder":
        """Build a frozen builder from v2-segment arrays (no per-term dicts).

        arrays: doc_tids i32 [total_tokens] + doc_offsets i64 [N+1] (token-id
        sequence per doc, order-preserving), frame_ids i64 [N], active bool [N],
        doc_rows i32 [P] + tfs i32 [P] + post_offsets i64 [T+1] (postings CSR,
        rows ascending within each term).
        """
        b = cls(postings_budget=postings_budget)
        b._vocab = {t: i for i, t in enumerate(vocab_list)}
        fr = {k: np.array(v) for k, v in arrays.items()}  # writable copies
        b._frozen = fr
        live = np.nonzero(fr["active"] & (fr["frame_ids"] >= 0))[0]
        b._row_of = dict(zip(fr["frame_ids"][live].tolist(), live.tolist()))
        return b

    def _thaw(self) -> None:
        """Materialize the dict/list state from frozen arrays (first mutation)."""
        fr = self._frozen
        if fr is None:
            return
        self._frozen = None
        inv = list(self._vocab.keys())
        do = fr["doc_offsets"]
        dt = fr["doc_tids"].tolist()
        n = len(fr["frame_ids"])
        self._doc_terms = [[inv[t] for t in dt[do[i] : do[i + 1]]] for i in range(n)]
        self._doc_len = np.diff(do).astype(np.int64).tolist()
        self._frame_ids = fr["frame_ids"].astype(np.int64).tolist()
        self._active = fr["active"].tolist()
        po = fr["post_offsets"]
        dr = fr["doc_rows"].tolist()
        tf = fr["tfs"].astype(np.int64).tolist()
        self._postings = [
            dict(zip(dr[po[t] : po[t + 1]], tf[po[t] : po[t + 1]]))
            for t in range(len(po) - 1)
        ]

    def frozen_or_built_arrays(self) -> tuple[list[str], dict]:
        """(vocab_list, v2 arrays) — from the frozen state when untouched, else
        built from the dict state (serialization path)."""
        vocab_list = list(self._vocab.keys())
        if self._frozen is not None:
            return vocab_list, self._frozen
        tid_of = self._vocab
        doc_tids = np.fromiter(
            (tid_of[t] for terms in self._doc_terms for t in terms),
            np.int32,
            count=sum(len(t) for t in self._doc_terms),
        )
        doc_offsets = np.zeros(len(self._doc_terms) + 1, np.int64)
        np.cumsum([len(t) for t in self._doc_terms], out=doc_offsets[1:])
        sizes = [len(p) for p in self._postings]
        post_offsets = np.zeros(len(self._postings) + 1, np.int64)
        np.cumsum(sizes, out=post_offsets[1:])
        doc_rows = np.zeros(int(post_offsets[-1]), np.int32)
        tfs = np.zeros(int(post_offsets[-1]), np.int32)
        for t, plist in enumerate(self._postings):
            off = int(post_offsets[t])
            rows = sorted(plist)
            doc_rows[off : off + len(rows)] = rows
            tfs[off : off + len(rows)] = [plist[r] for r in rows]
        return vocab_list, {
            "doc_tids": doc_tids,
            "doc_offsets": doc_offsets,
            "frame_ids": np.asarray(self._frame_ids, np.int64),
            "active": np.asarray(self._active, bool),
            "doc_rows": doc_rows,
            "tfs": tfs,
            "post_offsets": post_offsets,
        }

    def _snapshot_frozen(self) -> LexIndex:
        fr = self._frozen
        frame_ids_a = fr["frame_ids"]
        active_a = fr["active"]
        n = len(frame_ids_a)
        n_cap = max(128, _round_up(max(n, 1), 128))
        active = np.zeros(n_cap, bool)
        active[:n] = active_a
        doc_len_src = np.diff(fr["doc_offsets"]).astype(np.float32)
        doc_len = np.zeros(n_cap, np.float32)
        doc_len[:n] = doc_len_src
        frame_ids = np.full(n_cap, -1, np.int32)
        frame_ids[:n] = frame_ids_a
        live = max(1, int(active_a.sum()))
        avgdl = max(float(doc_len_src[active_a].sum() / live) if n else 1.0, 1e-6)
        po = fr["post_offsets"]
        t = len(po) - 1
        p_total = int(po[-1])
        sizes0 = np.diff(po)
        w2 = dma_window(int(sizes0.max()) if t and len(sizes0) else 1)
        # pad past the last posting by the candidate kernel's pow2 DMA window so a
        # window anchored at the final term never reads out of bounds; 1024-align
        # the total for the kernel's [P/1024, 8, 128] HBM layout
        p_cap = max(1024, _round_up(max(p_total, 1) + w2, 1024))
        doc_rows = np.zeros(p_cap, np.int32)
        doc_rows[:p_total] = fr["doc_rows"]
        tfs = np.zeros(p_cap, np.float32)
        tfs[:p_total] = fr["tfs"]
        # df over active rows only — vectorized segment sum over the CSR
        if p_total:
            act_post = active_a[fr["doc_rows"]].astype(np.int64)
            cs = np.concatenate([[0], np.cumsum(act_post)])
            df = cs[po[1:]] - cs[po[:-1]]
        else:
            df = np.zeros(max(t, 0), np.int64)
        # SQLite FTS5's exact idf: ln((N - df + 0.5)/(df + 0.5)) clamped to 1e-6
        # when non-positive (fts5_aux.c bm25; rank-order parity is enforced
        # differentially against a real FTS5 table in tests/test_fts5_parity.py)
        idf = np.log((live - df + 0.5) / (df + 0.5)).astype(np.float32)
        idf = np.where(idf > 0.0, idf, np.float32(1e-6))
        if t == 0:
            idf = np.zeros(1, np.float32)
        sizes = np.diff(po)
        max_df = int(sizes.max()) if t and len(sizes) else 0
        wnorm = np.zeros(p_cap, np.float32)
        if p_total:
            pr = fr["doc_rows"][:p_total]
            ptf = fr["tfs"][:p_total].astype(np.float32)
            pdl = doc_len[pr]
            wn = ptf * (BM25_K1 + 1.0) / (ptf + BM25_K1 * (1.0 - BM25_B + BM25_B * pdl / avgdl))
            wnorm[:p_total] = np.where(active[pr], wn, 0.0).astype(np.float32)
        off_np = po.astype(np.int32) if t else np.zeros(2, np.int32)
        rev_r, rev_w = reverse_postings_copies(doc_rows, wnorm, off_np)
        return LexIndex(
            doc_rows=jnp.asarray(doc_rows),
            tfs=jnp.asarray(tfs),
            offsets=jnp.asarray(off_np),
            idf=jnp.asarray(idf),
            doc_len=jnp.asarray(doc_len),
            frame_ids=jnp.asarray(frame_ids),
            active=jnp.asarray(active),
            count=jnp.asarray(n, dtype=jnp.int32),
            avgdl=jnp.asarray(avgdl, dtype=jnp.float32),
            wnorm=jnp.asarray(wnorm),
            doc_rows_rev=jnp.asarray(rev_r),
            wnorm_rev=jnp.asarray(rev_w),
            max_df=_round_up(max(max_df, 1), 128),
        )

    def resolve_postings_budget(self, n_rows: int) -> int | None:
        """Concrete per-term cap for an n_rows corpus. "auto" = exact below 256K
        rows, then max(4096, n//256): at 1M that keeps each Zipf term's ~top-0.4%
        impact head, which holds recall@10 0.978 vs the unbudgeted oracle through
        the rescore window (scripts/budget_recall.py; docs/benchmarks.md)."""
        b = self.postings_budget
        if b == "auto":
            return auto_postings_floor(n_rows)
        return b

    def max_term_df(self) -> int:
        """Largest per-term document frequency in the current state (0 if empty) —
        a manual postings budget below this actually truncates at snapshot time."""
        if self._frozen is not None:
            sizes = np.diff(self._frozen["post_offsets"])
            return int(sizes.max()) if len(sizes) else 0
        return max((len(p) for p in self._postings), default=0)

    # -- snapshot -------------------------------------------------------------------
    def snapshot(self) -> LexIndex:
        if self._frozen is not None:
            budget = self.resolve_postings_budget(len(self._frozen["frame_ids"]))
            sizes = np.diff(self._frozen["post_offsets"])
            if budget is None or not len(sizes) or int(sizes.max()) <= budget:
                return self._snapshot_frozen()
            self._thaw()  # budget truncation needs the impact-ordered slow path
        n = len(self._doc_len)
        n_cap = max(128, _round_up(max(n, 1), 128))
        t = len(self._vocab)
        active = np.zeros(n_cap, bool)
        active[:n] = self._active
        doc_len = np.zeros(n_cap, np.float32)
        doc_len[:n] = self._doc_len
        frame_ids = np.full(n_cap, -1, np.int32)
        frame_ids[:n] = self._frame_ids
        live = max(1, int(active.sum()))
        avgdl = float(doc_len[:n][np.asarray(self._active, bool)].sum() / live) if n else 1.0
        avgdl = max(avgdl, 1e-6)

        budget = self.resolve_postings_budget(n)
        kept: list[list[int]] = []
        truncated = False
        for plist in self._postings:
            rows = sorted(plist.keys())
            if budget is not None and len(rows) > budget:
                truncated = True
                # impact-ordered truncation: keep the postings whose exact BM25
                # contribution is largest (tombstoned rows are dropped first);
                # ties break by row index for determinism
                def _impact(r: int, pl=plist) -> float:
                    if not self._active[r]:
                        return -1.0
                    tf = pl[r]
                    return tf * (BM25_K1 + 1.0) / (
                        tf + BM25_K1 * (1.0 - BM25_B + BM25_B * self._doc_len[r] / avgdl)
                    )

                rows = sorted(rows, key=lambda r: (-_impact(r), r))[:budget]
                rows.sort()
            kept.append(rows)

        offsets = np.zeros(t + 1, np.int32)
        sizes = [len(rows) for rows in kept]
        offsets[1:] = np.cumsum(sizes, dtype=np.int64).astype(np.int32)
        p_total = int(offsets[-1])
        w2 = dma_window(max(sizes) if sizes else 1)
        p_cap = max(1024, _round_up(max(p_total, 1) + w2, 1024))
        doc_rows = np.zeros(p_cap, np.int32)
        tfs = np.zeros(p_cap, np.float32)
        idf = np.zeros(max(t, 1), np.float32)
        n_live = live
        for tid, rows in enumerate(kept):
            off = offsets[tid]
            plist = self._postings[tid]
            for i, r in enumerate(rows):
                doc_rows[off + i] = r
                tfs[off + i] = plist[r]
            # idf from the FULL document frequency (truncation changes which postings
            # are scored, never the statistics they are scored with)
            df = sum(1 for r in plist if self._active[r])
            # SQLite FTS5's exact idf (fts5_aux.c bm25): ln((N-df+0.5)/(df+0.5)),
            # clamped to 1e-6 when non-positive
            v = np.log((n_live - df + 0.5) / (df + 0.5))
            idf[tid] = v if v > 0.0 else 1e-6
        max_df = int(max(sizes)) if sizes else 0
        wnorm = np.zeros(p_cap, np.float32)
        if p_total:
            pr = doc_rows[:p_total]
            ptf = tfs[:p_total]
            pdl = doc_len[pr]
            wn = ptf * (BM25_K1 + 1.0) / (ptf + BM25_K1 * (1.0 - BM25_B + BM25_B * pdl / avgdl))
            wnorm[:p_total] = np.where(active[pr], wn, 0.0).astype(np.float32)

        off_np = offsets if t else np.zeros(2, np.int32)
        rev_r, rev_w = reverse_postings_copies(doc_rows, wnorm, off_np)
        fwd_tids = fwd_wnorm = fwd_fused = None
        pk = pk_rev = cbase = ccounts = None
        pk_qb = pk_maxc = fwd_width = 0
        if truncated:
            fwd_tids, fwd_wnorm = self._build_forward(n_cap, doc_len, active, avgdl, idf)
            fwd_width = int((fwd_tids >= 0).sum(axis=1).max()) if fwd_tids.size else 0
            fwd_fused = fuse_forward(fwd_tids, fwd_wnorm, fwd_width)
            pk, pk_rev, cbase, ccounts, pk_qb = build_impact_chunks(
                doc_rows, wnorm, off_np, idf.astype(np.float64), n_cap
            )
            pk_maxc = int(ccounts.max()) if len(ccounts) else 0
        return LexIndex(
            doc_rows=jnp.asarray(doc_rows),
            tfs=jnp.asarray(tfs),
            offsets=jnp.asarray(off_np),
            idf=jnp.asarray(idf),
            doc_len=jnp.asarray(doc_len),
            frame_ids=jnp.asarray(frame_ids),
            active=jnp.asarray(active),
            count=jnp.asarray(n, dtype=jnp.int32),
            avgdl=jnp.asarray(avgdl, dtype=jnp.float32),
            wnorm=jnp.asarray(wnorm),
            doc_rows_rev=jnp.asarray(rev_r),
            wnorm_rev=jnp.asarray(rev_w),
            fwd_tids=None if fwd_tids is None else jnp.asarray(fwd_tids),
            fwd_wnorm=None if fwd_wnorm is None else jnp.asarray(fwd_wnorm),
            fwd_fused=None if fwd_fused is None else jnp.asarray(fwd_fused),
            pk_chunks=None if pk is None else jnp.asarray(pk),
            pk_chunks_rev=None if pk_rev is None else jnp.asarray(pk_rev),
            chunk_base=None if cbase is None else jnp.asarray(cbase),
            chunk_counts=None if ccounts is None else jnp.asarray(ccounts),
            max_df=_round_up(max(max_df, 1), 128),
            pk_qb=pk_qb,
            pk_max_chunks=pk_maxc,
            fwd_width=fwd_width,
        )

    def _build_forward(self, n_cap, doc_len, active, avgdl, idf):
        """Doc-major forward index (fwd_tids/fwd_wnorm) from the UNBUDGETED per-doc
        term lists — the postings budget never truncates a doc's own terms, so an
        exact candidate rescore (ops/bm25_rescore.py) sees full scores. Docs with
        more than FWD_WIDTH_CAP unique terms keep their highest-impact terms
        (lowest-tid ties) — only such outlier docs can still be underestimated."""
        n = len(self._doc_len)
        widths = []
        per_doc: list[list[tuple[int, float]]] = []
        for row, terms in enumerate(self._doc_terms):
            if not self._active[row]:
                per_doc.append([])
                widths.append(0)
                continue
            cnt = Counter(terms)
            dl = self._doc_len[row]
            items = []
            for term, tf in cnt.items():
                tid = self._vocab[term]
                wn = tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
                )
                items.append((tid, float(wn)))
            if len(items) > FWD_WIDTH_CAP:
                items.sort(key=lambda it: (-it[1] * float(idf[it[0]]), it[0]))
                items = items[:FWD_WIDTH_CAP]
            items.sort()  # tid-ascending within the row (deterministic layout)
            per_doc.append(items)
            widths.append(len(items))
        l_pad = max(128, _round_up(max(widths, default=1), 128))
        fwd_tids = np.full((n_cap, l_pad), -1, np.int32)
        fwd_wnorm = np.zeros((n_cap, l_pad), np.float32)
        for row in range(n):
            items = per_doc[row]
            if items:
                fwd_tids[row, : len(items)] = [it[0] for it in items]
                fwd_wnorm[row, : len(items)] = [it[1] for it in items]
        return fwd_tids, fwd_wnorm

    def compact(self) -> None:
        """Physically drop tombstoned rows and unreferenced vocab, renumbering rows.
        The analogue of the reference's index compaction commit
        (MemoryOrchestrator+Maintenance.swift:160-171)."""
        self._thaw()
        items = [
            (fid, terms)
            for fid, terms, alive in zip(self._frame_ids, self._doc_terms, self._active)
            if alive and fid >= 0
        ]
        fresh = LexIndexBuilder(postings_budget=self.postings_budget)
        for fid, terms in items:
            # re-add from stored analysis (no re-analyze cost)
            row = len(fresh._doc_len)
            fresh._doc_terms.append(terms)
            fresh._doc_len.append(len(terms))
            fresh._frame_ids.append(fid)
            fresh._active.append(True)
            fresh._row_of[fid] = row
            for term, tf in Counter(terms).items():
                fresh._postings[fresh._tid(term)][row] = tf
        self.__dict__.update(fresh.__dict__)
        self._generation += 1

    # -- (de)serialization hooks ------------------------------------------------------
    def state(self) -> dict:
        self._thaw()
        return {
            "vocab": self._vocab,
            "doc_terms": self._doc_terms,
            "doc_len": self._doc_len,
            "frame_ids": self._frame_ids,
            "active": self._active,
        }

    @classmethod
    def from_docs(cls, items: list[tuple[int, str]]) -> "LexIndexBuilder":
        b = cls()
        b.add_batch(items)
        return b
