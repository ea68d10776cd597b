"""Dense vector index: an immutable device-resident snapshot + a host-side builder.

TPU-first redesign of the reference's MetalVectorEngine (reference:
Sources/WaxVectorSearch/MetalVectorEngine.swift:8-118 — unified-memory MTLBuffer of raw
f32 vectors with incremental append): instead of a mutable actor owning a GPU buffer, the
TPU build keeps a *functional snapshot* (`DenseIndex`, a registered pytree of device
arrays) produced by a host-side `DenseIndexBuilder`. Queries are pure jitted functions
over the snapshot; mutation = build a new snapshot (cheap: capacity-padded arrays are
reused and only the tail is refreshed).

Padding/masking conventions:
  * `emb` has capacity rows; rows >= `count` are zero and masked out of every scan.
  * removed rows stay in place with `active=False` (tombstone), mirroring the
    reference's remove-then-add upsert (USearchVectorEngine.swift:82-100).
  * row -> external id mapping lives in `frame_ids`; padded rows carry -1.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DenseIndex", "DenseIndexBuilder", "Similarity"]


class Similarity:
    COSINE = "cosine"
    DOT = "dot"
    EUCLIDEAN = "euclidean"


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class DenseIndex:
    """Device-resident dense index snapshot (pytree).

    Attributes:
      emb:       [capacity, dim] embedding matrix. For cosine similarity rows are
                 L2-normalized at build time so query scoring is a plain dot product.
      frame_ids: [capacity] int32 external ids; -1 for padding/tombstones.
      active:    [capacity] bool; False for padding and removed rows.
      count:     scalar int32 — number of occupied rows (active or tombstoned).
    """

    emb: jax.Array
    frame_ids: jax.Array
    active: jax.Array
    count: jax.Array
    similarity: str = dataclasses.field(metadata=dict(static=True), default=Similarity.COSINE)
    # True when live rows form a dense prefix (no in-place tombstones) — enables the
    # chunk-max scan path whose rescore masks by per-chunk prefix counts
    contiguous: bool = dataclasses.field(metadata=dict(static=True), default=False)

    @property
    def capacity(self) -> int:
        return self.emb.shape[0]

    @property
    def dim(self) -> int:
        return self.emb.shape[1]

    def live_count(self) -> int:
        return int(jnp.sum(self.active))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class DenseIndexBuilder:
    """Host-side mutable builder producing `DenseIndex` snapshots.

    Capacity grows by doubling (min 1024 rows, always a multiple of the TPU lane tile
    so the Pallas scan never sees a ragged tail). add() of an existing id is an upsert
    (tombstone + append), matching the reference engines' semantics
    (MetalVectorEngine.swift:~add / USearchVectorEngine.swift:82-100).
    """

    MIN_CAPACITY = 1024
    ROW_ALIGN = 512  # keep capacity a multiple of the Pallas scan tile (_TN)

    def __init__(
        self,
        dim: int,
        similarity: str = Similarity.COSINE,
        dtype: np.dtype = np.float32,
        capacity: int = 0,
    ):
        self.dim = int(dim)
        self.similarity = similarity
        self.dtype = np.dtype(dtype)
        cap = max(self.MIN_CAPACITY, _round_up(max(capacity, 1), self.ROW_ALIGN))
        self._emb = np.zeros((cap, self.dim), dtype=self.dtype)
        self._frame_ids = np.full((cap,), -1, dtype=np.int32)
        self._active = np.zeros((cap,), dtype=bool)
        self._count = 0
        self._row_of: dict[int, int] = {}
        self._generation = 0

    # -- introspection ------------------------------------------------------------
    def __len__(self) -> int:
        return len(self._row_of)

    @property
    def count(self) -> int:
        return self._count

    @property
    def generation(self) -> int:
        return self._generation

    def __contains__(self, frame_id: int) -> bool:
        return int(frame_id) in self._row_of

    def vector(self, frame_id: int) -> np.ndarray | None:
        row = self._row_of.get(int(frame_id))
        return None if row is None else self._emb[row].copy()

    # -- mutation -----------------------------------------------------------------
    def _ensure_capacity(self, extra: int) -> None:
        need = self._count + extra
        cap = self._emb.shape[0]
        if need <= cap:
            return
        while cap < need:
            cap *= 2
        cap = _round_up(cap, self.ROW_ALIGN)
        self._emb = np.vstack([self._emb, np.zeros((cap - self._emb.shape[0], self.dim), self.dtype)])
        self._frame_ids = np.concatenate([self._frame_ids, np.full((cap - self._frame_ids.shape[0],), -1, np.int32)])
        self._active = np.concatenate([self._active, np.zeros((cap - self._active.shape[0],), bool)])

    def _prep(self, vecs: np.ndarray) -> np.ndarray:
        vecs = np.asarray(vecs, dtype=np.float32)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        if vecs.shape[1] != self.dim:
            raise ValueError(f"dimension mismatch: got {vecs.shape[1]}, index dim {self.dim}")
        if self.similarity == Similarity.COSINE:
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            vecs = np.where(norms > 0, vecs / np.maximum(norms, 1e-30), vecs)
        return vecs.astype(self.dtype)

    def add(self, frame_id: int, vec: np.ndarray) -> None:
        self.add_batch(np.asarray([frame_id], dtype=np.int64), self._prep(vec))

    def _thaw(self) -> None:
        """Copy adopted read-only arrays (zero-copy segment loads) before the first
        in-place mutation; no-op on ordinary writable state."""
        if not self._emb.flags.writeable:
            self._emb = self._emb.copy()
        if not self._frame_ids.flags.writeable:
            self._frame_ids = self._frame_ids.copy()
        if not self._active.flags.writeable:
            self._active = self._active.copy()

    def add_batch(self, frame_ids: np.ndarray, vecs: np.ndarray) -> None:
        vecs = self._prep(vecs)
        frame_ids = np.asarray(frame_ids, dtype=np.int64)
        if frame_ids.shape[0] != vecs.shape[0]:
            raise ValueError("frame_ids and vectors length mismatch")
        self._thaw()
        self._ensure_capacity(vecs.shape[0])
        for fid, v in zip(frame_ids.tolist(), vecs):
            old = self._row_of.pop(fid, None)
            if old is not None:
                self._active[old] = False
                self._frame_ids[old] = -1
            row = self._count
            self._emb[row] = v
            self._frame_ids[row] = fid
            self._active[row] = True
            self._row_of[fid] = row
            self._count += 1
        self._generation += 1

    def remove(self, frame_id: int) -> bool:
        row = self._row_of.pop(int(frame_id), None)
        if row is None:
            return False
        self._thaw()
        self._active[row] = False
        self._frame_ids[row] = -1
        self._emb[row] = 0
        self._generation += 1
        return True

    # -- snapshot -----------------------------------------------------------------
    def snapshot(self, device_dtype: jnp.dtype | None = None) -> DenseIndex:
        """Materialize an immutable device snapshot of the current state."""
        emb = self._emb
        if device_dtype is not None and np.dtype(device_dtype) != emb.dtype:
            emb = emb.astype(device_dtype)
        return DenseIndex(
            emb=jnp.asarray(emb),
            frame_ids=jnp.asarray(self._frame_ids),
            active=jnp.asarray(self._active),
            count=jnp.asarray(self._count, dtype=jnp.int32),
            similarity=self.similarity,
            contiguous=bool(self._active[: self._count].all()) if self._count else True,
        )

    # -- (de)serialization hooks used by the snapshot store ------------------------
    def state_arrays(self, *, aligned: bool = False) -> dict[str, np.ndarray]:
        """Live-prefix views. `aligned=True` pads the row count up to ROW_ALIGN
        (bounded by capacity, whose allocation is always aligned) so a serialized
        segment can be ADOPTED zero-copy on load without re-padding."""
        n = self._count
        if aligned:
            n = min(self._emb.shape[0], _round_up(max(n, 1), self.ROW_ALIGN))
        return {
            "emb": self._emb[:n],
            "frame_ids": self._frame_ids[:n],
            "active": self._active[:n],
        }

    @classmethod
    def from_state_arrays(
        cls,
        arrays: dict[str, np.ndarray],
        dim: int,
        similarity: str = Similarity.COSINE,
        count: int | None = None,
    ) -> "DenseIndexBuilder":
        """Rebuild from serialized arrays. When the stored row count is already
        ROW_ALIGN-aligned (segments written with state_arrays(aligned=True)), the
        arrays are ADOPTED as-is — zero copies on the cold-open path; the first
        mutation copies them (_thaw). Unaligned (legacy) inputs copy into a fresh
        aligned allocation as before. `count` gives the live-prefix length when the
        arrays carry alignment padding."""
        rows = arrays["emb"].shape[0]
        n = rows if count is None else min(int(count), rows)
        emb = np.asarray(arrays["emb"])
        fids = np.asarray(arrays["frame_ids"], np.int32)
        active = np.asarray(arrays["active"], bool)
        # bypass __init__: it would allocate MIN_CAPACITY arrays that both branches
        # below immediately replace (wasted MBs on the cold-open path)
        b = cls.__new__(cls)
        b.dim = int(dim)
        b.similarity = similarity
        b.dtype = np.dtype(np.float32)
        b._generation = 0
        if rows >= cls.MIN_CAPACITY and rows % cls.ROW_ALIGN == 0 and emb.dtype == b.dtype:
            b._emb, b._frame_ids, b._active = emb, fids, active
        else:
            cap = max(cls.MIN_CAPACITY, _round_up(max(rows, 1), cls.ROW_ALIGN))
            b._emb = np.zeros((cap, int(dim)), b.dtype)
            b._frame_ids = np.full((cap,), -1, np.int32)
            b._active = np.zeros((cap,), bool)
            b._emb[:rows] = emb
            b._frame_ids[:rows] = fids
            b._active[:rows] = active
        b._count = n
        b._row_of = {
            int(fid): i
            for i, fid in enumerate(np.asarray(arrays["frame_ids"])[:n])
            if fid >= 0 and arrays["active"][i]
        }
        return b
