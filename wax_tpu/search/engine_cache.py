"""Process-wide engine cache: skip index deserialization on warm re-open.

The analogue of the reference's UnifiedSearchEngineCache (reference:
Sources/Wax/UnifiedSearch/UnifiedSearchEngineCache.swift:53-123 — process-wide cache
of deserialized engines keyed by store identity + committed-index checksum + engine
kind, with incremental catch-up). Ownership differs to fit our model: the store is
single-writer (flock lease), so live engines can never be SHARED across orchestrators;
instead a closing orchestrator PARKS its builders here keyed by (path, lex sha,
vec sha), and a later open RECLAIMS them — removing the entry — iff the committed
segment checksums still match. On a hit, open skips json/npz deserialization entirely;
WAL catch-up still runs, so the reclaimed engines converge to exactly the state a cold
load would build.
"""
from __future__ import annotations

import threading
from collections import OrderedDict
from pathlib import Path

__all__ = ["park", "reclaim", "cache_stats", "clear"]

_MAX_ENTRIES = 4
_lock = threading.Lock()
_entries: OrderedDict[tuple, tuple] = OrderedDict()
_stats = {"parks": 0, "hits": 0, "misses": 0}


def _key(path, lex_sha: bytes | None, vec_sha: bytes | None) -> tuple:
    return (str(Path(path).resolve()), lex_sha, vec_sha)


def park(path, lex_sha, vec_sha, lex_builder, vector_engine) -> None:
    """Store a closing orchestrator's engines for possible reclaim.

    A session with no committed index segments is never parked: its key would be
    (path, None, None), which a brand-new store created later at the same path would
    wrongly match (WAL catch-up rebuilds such small states cheaply anyway).
    """
    if lex_sha is None and vec_sha is None:
        return
    with _lock:
        key = _key(path, lex_sha, vec_sha)
        _entries.pop(key, None)
        _entries[key] = (lex_builder, vector_engine)
        _stats["parks"] += 1
        while len(_entries) > _MAX_ENTRIES:
            _entries.popitem(last=False)


def reclaim(path, lex_sha, vec_sha):
    """Take (and remove) parked engines when the committed checksums still match.

    Returns (lex_builder, vector_engine) or None. Removal guarantees exclusive
    ownership — two concurrent opens can never share one mutable builder.
    """
    if lex_sha is None and vec_sha is None:
        return None
    with _lock:
        entry = _entries.pop(_key(path, lex_sha, vec_sha), None)
        if entry is None:
            _stats["misses"] += 1
        else:
            _stats["hits"] += 1
        return entry


def cache_stats() -> dict:
    with _lock:
        return dict(_stats, entries=len(_entries))


def clear() -> None:
    with _lock:
        _entries.clear()
        for k in _stats:
            _stats[k] = 0
