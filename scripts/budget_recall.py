"""Measure the postings-budget recall trade at 1M docs (verdict item: a documented
trade with no number is a guess).

Builds a Zipf synthetic 1M-doc corpus with variable doc lengths, impact-orders each
term's postings (exact per-posting BM25 contribution, like LexIndexBuilder's
postings_budget truncation — index/lex.py), then measures top-10 agreement of the
budgeted device BM25 lane against the UNBUDGETED exact oracle (host scatter over the
full postings), for budgets {unbounded-oracle, 16384, 4096, 1024} x {OR, AND} on
multi-term queries.

    python scripts/budget_recall.py [N] [N_QUERIES]

Prints a markdown table row per (budget, mode) for docs/benchmarks.md.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wax_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_048_576
NQ = int(sys.argv[2]) if len(sys.argv) > 2 else 64
T = 16384
QT = 8  # terms per query
K = 10
K1, B_ = 1.2, 0.75
BUDGETS = [16384, 4096, 1024]
CHUNKED_BUDGETS = [4096, 3072]  # water-filled chunked-kernel model rows


def build_corpus(rng):
    """Returns per-term postings (rows, tfs) impact-ordered, plus doc lengths."""
    raw = (1.0 / np.arange(1, T + 1)) ** 0.7
    df = np.minimum((raw / raw.sum() * 48 * N).astype(np.int64) + 1, N)
    doc_len = rng.integers(16, 129, N).astype(np.float32)
    avgdl = float(doc_len.mean())
    idf_full = np.log((N - df + 0.5) / (df + 0.5))
    idf_full = np.where(idf_full > 0, idf_full, 1e-6).astype(np.float32)
    postings = []
    print(f"building {df.sum() / 1e6:.1f}M postings ...", flush=True)
    for t in range(T):
        rows = rng.choice(N, size=df[t], replace=False) if df[t] < N // 2 else rng.permutation(N)[: df[t]]
        tfs = rng.integers(1, 6, df[t]).astype(np.float32)
        # exact per-posting contribution -> impact order (descending)
        dl = doc_len[rows]
        contrib = idf_full[t] * (tfs * (K1 + 1.0)) / (tfs + K1 * (1 - B_ + B_ * dl / avgdl))
        order = np.argsort(-contrib, kind="stable")
        postings.append((rows[order].astype(np.int32), tfs[order]))
    return postings, doc_len, avgdl, idf_full, df


def oracle_scores(postings, doc_len, avgdl, idf, tids, mode):
    """Exact unbudgeted scores for ONE query (host scatter over full postings)."""
    score = np.zeros(N, np.float32)
    hits = np.zeros(N, np.int16)
    for t in tids:
        rows, tfs = postings[t]
        dl = doc_len[rows]
        contrib = idf[t] * (tfs * (K1 + 1.0)) / (tfs + K1 * (1 - B_ + B_ * dl / avgdl))
        score[rows] += contrib
        hits[rows] += 1
    if mode == "all":
        score = np.where(hits == len(tids), score, 0.0)
    return score


def budget_scores(postings, doc_len, avgdl, idf, tids, mode, budget):
    score = np.zeros(N, np.float32)
    hits = np.zeros(N, np.int16)
    for t in tids:
        rows, tfs = postings[t]
        rows, tfs = rows[:budget], tfs[:budget]
        dl = doc_len[rows]
        contrib = idf[t] * (tfs * (K1 + 1.0)) / (tfs + K1 * (1 - B_ + B_ * dl / avgdl))
        score[rows] += contrib
        hits[rows] += 1
    if mode == "all":
        # production semantics: AND masks on FULL df membership (idf/df stats keep
        # full statistics; only scoring postings are truncated) — a doc matching
        # all terms but truncated out of one term's head scores the partial sum.
        # Mirror ops/bm25.py: hit count comes from the BUDGETED lists (the device
        # kernel sees only those), so truncation can DROP an AND match.
        score = np.where(hits == len(tids), score, 0.0)
    elif mode == "count":
        # AND-rescore candidate ranking (bm25_candidates "count" generation mode):
        # budgeted match count dominates, budgeted score tie-breaks
        score = score + 4096.0 * hits.astype(np.float32)
    return score


def topk_ids(score, k):
    """Top-k doc ids, lowest-index tie-break (the engine's determinism contract)."""
    idx = np.argpartition(-score, k)[:k]
    return set(idx[np.lexsort((idx, -score[idx]))][:k].tolist())


def chunked_scores(postings, doc_len, avgdl, idf, tids, mode, budget,
                   slots=32, chunk=1024, qb=10):
    """Host model of the chunked packed kernel (ops/bm25_chunked_pallas.py):
    water-filled chunk assignment (all chunk-0s, then chunk-1s, ...) capped at
    `slots`, quantized (qb-bit) contribution sums — candidate RANKING only."""
    # global quantization scale: max contribution over the query's kept postings
    # approximates the snapshot-global max (conservative for ranking error)
    scale = 0.0
    per_term = []
    for t in tids:
        rows, tfs = postings[t]
        rows, tfs = rows[:budget], tfs[:budget]
        dl = doc_len[rows]
        contrib = idf[t] * (tfs * (K1 + 1.0)) / (tfs + K1 * (1 - B_ + B_ * dl / avgdl))
        per_term.append((rows, contrib))
        if len(contrib):
            scale = max(scale, float(contrib.max()))
    scale = scale or 1.0
    qmax = (1 << qb) - 1
    score = np.zeros(N, np.int64)
    hits = np.zeros(N, np.int16)
    q = len(tids)
    # water-fill: chunk (term i, level j) has rank j*q+i; keep the `slots` smallest
    order = sorted(
        (j * q + i, i, j)
        for i, (rows, _) in enumerate(per_term)
        for j in range(-(-len(rows) // chunk))
    )[:slots]
    for _, i, j in order:
        rows, contrib = per_term[i]
        seg = slice(j * chunk, (j + 1) * chunk)
        qc = np.clip(np.rint(contrib[seg] / scale * qmax), 1, qmax).astype(np.int64)
        score[rows[seg]] += qc
        hits[rows[seg]] += 1
    if mode == "count":
        # kernel saturation: rank = count*65536 + min(sum, 65535)
        return np.minimum(score, 65535).astype(np.float64) + 65536.0 * hits
    return score.astype(np.float64)


FETCHES = [64, 256, 1024]  # rescore-ceiling fetch depths


def main():
    rng = np.random.default_rng(11)
    postings, doc_len, avgdl, idf, df = build_corpus(rng)
    # query terms: mixture of head/torso/tail terms, weighted toward the torso.
    # AND queries use 2-3 terms (8-term conjunctions simply have no matches at 1M).
    zipf_w = (1.0 / np.arange(1, T + 1)) ** 0.5
    zipf_w /= zipf_w.sum()
    q_any = [rng.choice(T, size=QT, replace=False, p=zipf_w) for _ in range(NQ)]
    q_all = [rng.choice(256, size=rng.integers(2, 4), replace=False) for _ in range(NQ)]

    fcols = " | ".join(f"in-top-{f} (rescore ceiling)" for f in FETCHES)
    print(f"| budget | mode | recall@{K} vs unbudgeted | {fcols} | mean kept/term |")
    print("|---|---|---|" + "---|" * len(FETCHES) + "---|")
    for mode, queries in (("any", q_any), ("all", q_all)):
        oracles = []
        for q in queries:
            s = oracle_scores(postings, doc_len, avgdl, idf, q, mode)
            oracles.append(topk_ids(s, K) if s.max() > 0 else set())
        for budget in BUDGETS:
            rec, denom = 0.0, 0
            # rescore ceiling: fraction of oracle top-K inside the budgeted top-F —
            # an exact forward-index rescore of the top-F candidates recovers
            # exactly these (candidate GENERATION is budgeted; rescore is not).
            ceil_rec = {f: 0.0 for f in FETCHES}
            for q, orc in zip(queries, oracles):
                if not orc:
                    continue
                s = budget_scores(postings, doc_len, avgdl, idf, q, mode, budget)
                got = topk_ids(s, K) if s.max() > 0 else set()
                rec += len(got & orc) / len(orc)
                # rescore candidates come from count-ranked OR scoring for AND
                # queries (the device kernels' "count" generation mode) — the
                # exact rescore recomputes hit counts, so budgeted AND zeroing
                # must not pre-filter the candidate pool
                s_cand = (
                    s if mode == "any"
                    else budget_scores(postings, doc_len, avgdl, idf, q, "count", budget)
                )
                for f in FETCHES:
                    cand = topk_ids(s_cand, f) if s_cand.max() > 0 else set()
                    ceil_rec[f] += len(cand & orc) / len(orc)
                denom += 1
            kept = np.minimum(df, budget).mean()
            ceils = " | ".join(f"{ceil_rec[f] / max(denom, 1):.4f}" for f in FETCHES)
            print(
                f"| {budget} | {mode.upper()} | {rec / max(denom, 1):.4f} | {ceils} | {kept:.0f} |",
                flush=True,
            )
        # chunked packed kernel model (water-fill slots=32, 10-bit quantized
        # ranking — ops/bm25_chunked_pallas.py) at the bench budget
        for budget in CHUNKED_BUDGETS:
            ceil_rec = {f: 0.0 for f in FETCHES}
            denom = 0
            for q, orc in zip(queries, oracles):
                if not orc:
                    continue
                s_cand = chunked_scores(
                    postings, doc_len, avgdl, idf, q,
                    "count" if mode == "all" else "any", budget,
                )
                for f in FETCHES:
                    cand = topk_ids(s_cand, f) if s_cand.max() > 0 else set()
                    ceil_rec[f] += len(cand & orc) / len(orc)
                denom += 1
            ceils = " | ".join(f"{ceil_rec[f] / max(denom, 1):.4f}" for f in FETCHES)
            print(
                f"| {budget} chunked-32 | {mode.upper()} | (rescore-only lane) | {ceils} | — |",
                flush=True,
            )


if __name__ == "__main__":
    main()
