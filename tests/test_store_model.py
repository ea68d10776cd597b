"""Model-based store fuzz: random op walks vs a reference dict model.

The write-side complement to the decode-side corruption fuzzers: random sequences
of put/put_batch/delete/supersede/commit/reopen must keep the store byte-exactly
consistent with a trivial in-memory model — across commits, WAL-recovered reopens,
and the columnar v2 TOC writer introduced in round 3 (reference: the spirit of
DurabilityRegressionTests' operation matrices).
"""
import random

import pytest

from wax_tpu.storage.store import StoreOptions, WaxStore

OPTS = StoreOptions(wal_size=256 * 1024)


class Model:
    """Reference semantics: frame id -> (content, status, superseded_by)."""

    def __init__(self):
        self.frames: dict[int, dict] = {}
        self.next_id = 0

    def put(self, content: bytes) -> int:
        fid = self.next_id
        self.frames[fid] = {"content": content, "status": "active", "superseded_by": None}
        self.next_id += 1
        return fid

    def delete(self, fid: int) -> bool:
        f = self.frames.get(fid)
        if f is None or f["status"] == "deleted":
            return False
        f["status"] = "deleted"
        return True

    def supersede(self, old: int, content: bytes) -> int:
        new = self.put(content)
        self.frames[old]["superseded_by"] = new
        return new

    def live_ids(self):
        return [
            fid
            for fid, f in self.frames.items()
            if f["status"] == "active" and f["superseded_by"] is None
        ]


def _check(store: WaxStore, model: Model, deep: bool = False) -> None:
    assert store.frame_count() == model.next_id
    for fid, f in model.frames.items():
        m = store.frame_meta(fid)
        assert m is not None, fid
        assert m.status == f["status"], (fid, m.status, f["status"])
        assert m.superseded_by == f["superseded_by"], fid
        if f["status"] == "active":
            assert store.frame_content(fid) == f["content"], fid
    if deep:
        assert store.verify(deep=True)["ok"]


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_random_walk_matches_model(tmp_path, seed):
    run_walk(tmp_path / f"walk{seed}.wxs", seed)


def run_walk(path, seed: int, steps: int = 120) -> None:
    """One model-checked random op walk (also driven at scale by
    scripts/store_fuzz.py — keep it importable and fixture-free)."""
    rng = random.Random(seed)
    store = WaxStore.create(path, OPTS)
    model = Model()
    ops = 0
    try:
        for step in range(steps):
            roll = rng.random()
            if roll < 0.45 or not model.frames:
                content = f"doc s{seed} step {step} ".encode() + bytes(
                    rng.getrandbits(8) for _ in range(rng.randrange(0, 200))
                )
                a = store.put(content)
                b = model.put(content)
                assert a == b
            elif roll < 0.55:
                batch = [
                    (f"batch {step}.{j}".encode(), {})
                    for j in range(rng.randrange(1, 5))
                ]
                fids = store.put_batch([(c, dict(meta)) for c, meta in batch])
                mids = [model.put(c) for c, _ in batch]
                assert fids == mids
            elif roll < 0.70:
                candidates = model.live_ids()
                if candidates:
                    fid = rng.choice(candidates)
                    assert store.delete(fid) == model.delete(fid)
            elif roll < 0.85:
                candidates = model.live_ids()
                if candidates:
                    fid = rng.choice(candidates)
                    content = f"superseding {fid} at {step}".encode()
                    assert store.supersede(fid, content) == model.supersede(fid, content)
            elif roll < 0.95:
                store.commit()
                _check(store, model)
            else:
                # reopen WITHOUT committing: pending state must replay from the WAL
                store.close()
                store = WaxStore.open(path, OPTS)
                _check(store, model)
            ops += 1
        store.commit()
        _check(store, model, deep=True)
        store.close()
        store = WaxStore.open(path, OPTS)
        _check(store, model, deep=True)
    finally:
        store.close()


def test_delete_then_reopen_uncommitted(tmp_path):
    """Tombstones journaled in the WAL must survive a no-commit reopen."""
    p = tmp_path / "tomb.wxs"
    s = WaxStore.create(p, OPTS)
    a = s.put(b"keep me")
    b = s.put(b"delete me")
    s.commit()
    assert s.delete(b)
    s.close()
    s2 = WaxStore.open(p, OPTS)
    try:
        assert s2.frame_meta(b).status == "deleted"
        assert s2.frame_content(a) == b"keep me"
    finally:
        s2.close()


def test_supersede_chain_survives_mixed_commits(tmp_path):
    p = tmp_path / "chain.wxs"
    s = WaxStore.create(p, OPTS)
    f1 = s.put(b"v1")
    s.commit()
    f2 = s.supersede(f1, b"v2")
    s.close()  # f2 + link only in the WAL
    s2 = WaxStore.open(p, OPTS)
    try:
        assert s2.frame_meta(f1).superseded_by == f2
        f3 = s2.supersede(f2, b"v3")
        s2.commit()
        assert s2.frame_meta(f2).superseded_by == f3
        assert s2.frame_content(f3) == b"v3"
        assert s2.verify(deep=True)["ok"]
    finally:
        s2.close()
