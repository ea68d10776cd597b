"""FTS5 MATCH evaluation engine — phrase / prefix / NEAR / boolean retrieval.

The reference gets this whole surface for free by passing the raw query to SQLite
FTS5 (reference: Sources/WaxTextSearch/FTS5SearchEngine.swift:143 MATCH + :129-161
bm25() ranking). wax-tpu's device BM25 lane (ops/bm25.py) covers bag-of-terms AND/OR;
this module adds the positional subset on the host: it parses the MATCH grammar
(text/match_query.py), evaluates phrases against per-document token sequences kept by
the LexIndexBuilder, and scores with SQLite's exact bm25 formula — idf clamped at
1e-6, per-phrase tf, rank = -score — so result sets AND rank order are differentially
testable against a real FTS5 table (tests/test_fts5_parity.py).

Work model: candidate docs come from postings intersections (host dict/CSR lookups),
then only candidates are position-verified — the same work FTS5's doclist+position
merge does. This lane is host-side by design: phrase queries narrow to small
candidate sets, and round-tripping variable-length position lists through the TPU
would cost more than it saves (the dense/BM25 bulk lanes stay on device).
"""
from __future__ import annotations

import bisect
import math
from dataclasses import dataclass

import numpy as np

from wax_tpu.index.lex import BM25_B, BM25_K1, LexIndexBuilder
from wax_tpu.text.match_query import (
    BoolNode,
    MatchSyntaxError,
    Near,
    Phrase,
    parse_match_query,
)

__all__ = ["match_search", "MatchHit", "MatchSyntaxError", "phrase_instances_in"]


@dataclass(frozen=True)
class MatchHit:
    frame_id: int
    score: float  # -rank: SQLite bm25() negated (reference scoreFromBM25Rank :966)
    row: int
    # instance (start, end) token spans of every query phrase in this doc, parse
    # order — feeds snippet highlighting (FTS5 snippet() parity, unified.py)
    instances: tuple[tuple[tuple[int, int], ...], ...]


# ---------------------------------------------------------------------------------
# Builder access helpers (work on both thawed dict state and frozen CSR arrays)
# ---------------------------------------------------------------------------------


def _sorted_vocab(builder: LexIndexBuilder) -> list[str]:
    """Sorted vocab list for prefix expansion, cached per builder generation."""
    cache = getattr(builder, "_match_vocab_cache", None)
    if cache is not None and cache[0] == builder.generation:
        return cache[1]
    terms = sorted(builder._vocab.keys())
    builder._match_vocab_cache = (builder.generation, terms)
    return terms


def _expand_prefix(builder: LexIndexBuilder, prefix: str) -> list[int]:
    """Term ids of every vocab term starting with `prefix` (FTS5 `tok*`)."""
    terms = _sorted_vocab(builder)
    lo = bisect.bisect_left(terms, prefix)
    hi = bisect.bisect_left(terms, prefix + "￿")
    return [builder._vocab[t] for t in terms[lo:hi]]


def _postings_rows(builder: LexIndexBuilder, tid: int) -> np.ndarray:
    """Rows containing term id `tid` (includes tombstoned rows; caller filters)."""
    fr = builder._frozen
    if fr is not None:
        po = fr["post_offsets"]
        return np.asarray(fr["doc_rows"][po[tid] : po[tid + 1]])
    return np.fromiter(builder._postings[tid].keys(), np.int64, len(builder._postings[tid]))


def _doc_tids(builder: LexIndexBuilder, row: int) -> np.ndarray:
    """Token-id sequence of a document row (order-preserving)."""
    fr = builder._frozen
    if fr is not None:
        do = fr["doc_offsets"]
        return np.asarray(fr["doc_tids"][do[row] : do[row + 1]], np.int64)
    vocab = builder._vocab
    return np.fromiter(
        (vocab[t] for t in builder._doc_terms[row]), np.int64, len(builder._doc_terms[row])
    )


def _live_rows(builder: LexIndexBuilder) -> tuple[np.ndarray, np.ndarray, float, int]:
    """(active bool array, frame_ids, avgdl, n_live)."""
    fr = builder._frozen
    if fr is not None:
        active = np.asarray(fr["active"], bool)
        fids = np.asarray(fr["frame_ids"], np.int64)
        dls = np.diff(fr["doc_offsets"]).astype(np.float64)
    else:
        active = np.asarray(builder._active, bool)
        fids = np.asarray(builder._frame_ids, np.int64) if builder._frame_ids else np.zeros(0, np.int64)
        dls = np.asarray(builder._doc_len, np.float64) if builder._doc_len else np.zeros(0)
    n_live = max(1, int(active.sum()))
    avgdl = float(dls[active].sum() / n_live) if len(dls) else 1.0
    return active, fids, max(avgdl, 1e-9), n_live


# ---------------------------------------------------------------------------------
# Phrase instance computation
# ---------------------------------------------------------------------------------


def phrase_instances_in(seq: np.ndarray, tids: list[object], first: bool) -> list[tuple[int, int]]:
    """Instances of a phrase in one token-id sequence.

    `tids` entries are either an int term id or a frozenset of ids (prefix slot).
    Returns (start, end) spans, leftmost first.
    """
    m = len(tids)
    n = len(seq)
    if m == 0 or n < m:
        return []
    t0 = tids[0]
    if isinstance(t0, frozenset):
        starts = np.nonzero(np.isin(seq[: n - m + 1], list(t0)))[0]
    else:
        starts = np.nonzero(seq[: n - m + 1] == t0)[0]
    if first:
        starts = starts[starts == 0]
    for i in range(1, m):
        if len(starts) == 0:
            return []
        ti = tids[i]
        nxt = seq[starts + i]
        if isinstance(ti, frozenset):
            starts = starts[np.isin(nxt, list(ti))]
        else:
            starts = starts[nxt == ti]
    return [(int(s), int(s) + m - 1) for s in starts]


class _PhraseEval:
    """Per-phrase match data: candidate rows -> instance spans."""

    def __init__(self, builder: LexIndexBuilder, phrase: Phrase, active: np.ndarray):
        self.phrase = phrase
        vocab = builder._vocab
        tids: list[object] = []
        self.empty = False
        for i, term in enumerate(phrase.terms):
            if phrase.prefix and i == len(phrase.terms) - 1:
                exp = _expand_prefix(builder, term)
                if not exp:
                    self.empty = True
                    break
                tids.append(frozenset(exp) if len(exp) > 1 else exp[0])
            else:
                tid = vocab.get(term)
                if tid is None:
                    self.empty = True
                    break
                tids.append(tid)
        if not phrase.terms:
            self.empty = True
        self.tids = tids
        self.instances: dict[int, list[tuple[int, int]]] = {}
        if self.empty:
            return
        # candidate rows: intersect postings of all slots (prefix slot = union)
        cand: np.ndarray | None = None
        for t in tids:
            if isinstance(t, frozenset):
                rows = np.unique(np.concatenate([_postings_rows(builder, x) for x in t]))
            else:
                rows = _postings_rows(builder, t)
            cand = rows if cand is None else np.intersect1d(cand, rows, assume_unique=False)
            if len(cand) == 0:
                break
        cand = cand if cand is not None else np.zeros(0, np.int64)
        live_mask = active[cand] if len(cand) else np.zeros(0, bool)
        for row in cand[live_mask]:
            inst = phrase_instances_in(_doc_tids(builder, int(row)), tids, phrase.first)
            if inst:
                self.instances[int(row)] = inst

    @property
    def rows(self) -> set[int]:
        return set(self.instances.keys())

    @property
    def n_hit(self) -> int:
        return len(self.instances)


def _near_filtered(evals: list[_PhraseEval], distance: int) -> list[dict[int, list[tuple[int, int]]]]:
    """NEAR(p1..pn, N) instance filtering with FTS5 semantics.

    A row matches iff one instance per phrase can be chosen with every pairwise gap
    <= N intervening tokens — equivalently (1-D Helly, verified against FTS5):
    exists a token point t with start <= t <= end + N + 1 for every phrase. FTS5
    additionally PRUNES each phrase's position list to the instances that
    participate in some valid configuration, and bm25's per-row tf counts only the
    survivors — so this returns, per phrase, {row: kept instances}.
    """
    common: set[int] | None = None
    for e in evals:
        common = e.rows if common is None else (common & e.rows)
    out: list[dict[int, list[tuple[int, int]]]] = [{} for _ in evals]
    for row in common or ():
        spans = [evals[i].instances[row] for i in range(len(evals))]
        ts = sorted({s for sp in spans for s, _ in sp})
        # valid points: every phrase has an instance whose window covers t
        valid_ts = [
            t
            for t in ts
            if all(any(s <= t <= e + distance + 1 for s, e in sp) for sp in spans)
        ]
        if not valid_ts:
            continue
        for i, sp in enumerate(spans):
            kept = [
                (s, e) for s, e in sp if any(s <= t <= e + distance + 1 for t in valid_ts)
            ]
            out[i][row] = kept
    return out


# ---------------------------------------------------------------------------------
# Query evaluation + FTS5-exact bm25
# ---------------------------------------------------------------------------------


def match_search(builder: LexIndexBuilder, query: str, top_k: int) -> list[MatchHit]:
    """Evaluate an FTS5 MATCH query with exact SQLite semantics.

    Raises MatchSyntaxError on queries FTS5 would reject. Ordering mirrors the
    reference's SQL: rank ASC (= score DESC), frame_id ASC
    (FTS5SearchEngine.swift:146-149).
    """
    node = parse_match_query(query)
    active, fids, avgdl, n_live = _live_rows(builder)

    # raw per-phrase instances, shared across parse slots with equal phrase value
    eval_cache: dict[Phrase, _PhraseEval] = {}

    def get_eval(ph: Phrase) -> _PhraseEval:
        ev = eval_cache.get(ph)
        if ev is None:
            ev = eval_cache[ph] = _PhraseEval(builder, ph, active)
        return ev

    # One scoring slot per phrase in parse order. NEAR slots carry the
    # constraint-filtered instance maps. A slot reports instances in a row ONLY
    # when its branch of the expression actually matched that row (verified
    # differentially: in `apple OR banana cherry`, a row with apple+banana but no
    # cherry scores apple alone; NOT right operands never report).
    slots: list[tuple[Phrase, dict[int, list[tuple[int, int]]]]] = []
    node_matched: dict[int, set[int]] = {}
    slot_node: list[int] = []  # slots[i] belongs to AST node id slot_node[i]

    def walk(n) -> set[int]:
        if isinstance(n, Phrase):
            ev = get_eval(n)
            slots.append((n, ev.instances))
            slot_node.append(id(n))
            rows = ev.rows
        elif isinstance(n, Near):
            evals = [get_eval(p) for p in n.phrases]
            filtered = _near_filtered(evals, n.distance)
            rows = None
            for p, f in zip(n.phrases, filtered):
                slots.append((p, f))
                slot_node.append(id(n))
                nonempty = {r for r, inst in f.items() if inst}
                rows = nonempty if rows is None else (rows & nonempty)
            rows = rows or set()
        elif isinstance(n, BoolNode):
            left = walk(n.left)
            right = walk(n.right)
            if n.op == "and":
                rows = left & right
            elif n.op == "or":
                rows = left | right
            else:
                rows = left - right
        else:
            raise AssertionError(f"unknown node {n!r}")
        node_matched[id(n)] = rows
        return rows

    matched = walk(node)
    if not matched:
        return []

    # top-down: rows where each node is on a matching path of the expression
    node_active: dict[int, set[int]] = {id(node): matched}

    def assign(n, active: set[int]) -> None:
        node_active[id(n)] = active
        if isinstance(n, BoolNode):
            if n.op == "or":
                assign(n.left, active & node_matched[id(n.left)])
                assign(n.right, active & node_matched[id(n.right)])
            elif n.op == "and":
                assign(n.left, active)
                assign(n.right, active)
            else:  # NOT: right operand phrases never report instances
                assign(n.left, active)
                assign(n.right, set())
        # Phrase/Near: leaves — active set already recorded

    assign(node, matched)

    # FTS5 bm25: idf = ln((N - nHit + 0.5)/(nHit + 0.5)) clamped to 1e-6 when <= 0,
    # nHit = rows matching the phrase alone (UNfiltered by NEAR); tf = surviving
    # instances in the row; dl = row token count (fts5_aux.c, verified
    # differentially in tests/test_fts5_parity.py)
    idfs = []
    for ph, _inst in slots:
        n_hit = eval_cache[ph].n_hit
        idf = math.log((n_live - n_hit + 0.5) / (n_hit + 0.5))
        idfs.append(idf if idf > 0.0 else 1e-6)

    fr = builder._frozen
    if fr is not None:
        dls = np.diff(fr["doc_offsets"]).astype(np.float64)
    else:
        dls = np.asarray(builder._doc_len, np.float64)

    hits: list[MatchHit] = []
    for row in matched:
        dl = float(dls[row])
        score = 0.0
        inst_all = []
        for (ph, inst_map), nid, idf in zip(slots, slot_node, idfs):
            inst = inst_map.get(row, []) if row in node_active.get(nid, ()) else []
            tf = float(len(inst))
            if tf:
                score += idf * (tf * (BM25_K1 + 1.0)) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
                )
            inst_all.append(tuple(inst))
        hits.append(MatchHit(int(fids[row]), score, row, tuple(inst_all)))

    hits.sort(key=lambda h: (-h.score, h.frame_id))
    return hits[: max(1, top_k)]
