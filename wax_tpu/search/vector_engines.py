"""Vector engine abstraction: flat MXU scan vs HNSW beam search.

Mirrors the reference's engine pair behind one protocol (reference:
Sources/WaxVectorSearch/VectorSearchEngine.swift:4-18 — `search/add/addBatch/remove/
stageForCommit` + VectorEnginePreference {auto, metalPreferred, cpuOnly}; engines
MetalVectorEngine (brute force) and USearchVectorEngine (HNSW)). Here the pair is
FlatVectorEngine (fused Pallas scan — exact) and HNSWVectorEngine (graph beam search —
approximate, for corpora where even the fused scan is too slow per query batch).

Top-k clamp: the reference clamps topK <= 10,000 (MetalVectorEngine.swift:18).
"""
from __future__ import annotations

import threading

from typing import Protocol, runtime_checkable

import jax
import jax.numpy as jnp
import numpy as np

from wax_tpu.index.dense import DenseIndexBuilder, Similarity
from wax_tpu.utils.concurrency import FreshLockOnCopyMixin
from wax_tpu.ops.beam_search import hnsw_search
from wax_tpu.ops.flat_scan import flat_scan_topk

__all__ = [
    "VectorEngine",
    "AutoVectorEngine",
    "FlatVectorEngine",
    "HNSWVectorEngine",
    "IVFVectorEngine",
    "make_vector_engine",
    "MAX_TOP_K",
]

MAX_TOP_K = 10_000

# device_dtype="auto" switches the HBM-resident embedding matrix to bfloat16 once the
# corpus crosses this row count: at 1M x 768 the matrix drops from 3.1 GB to 1.5 GB
# (10M x 768 fits one v5e chip at ~15 GB) and the scan is HBM-bandwidth-bound, so
# bf16 measured ~1.5x faster at 1M (docs/benchmarks.md). Scores still accumulate in
# f32 on the MXU; below the threshold storage stays f32 and results are bit-exact.
BF16_AUTO_ROWS = 1_000_000


@runtime_checkable
class VectorEngine(Protocol):
    kind: str

    def add(self, frame_id: int, vec: np.ndarray) -> None: ...
    def add_batch(self, frame_ids, vecs: np.ndarray) -> None: ...
    def remove(self, frame_id: int) -> bool: ...
    def search(self, queries: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]: ...
    def __len__(self) -> int: ...
    def __contains__(self, frame_id: int) -> bool: ...


class FlatVectorEngine(FreshLockOnCopyMixin):
    """Exact brute-force engine over the fused Pallas scan (snapshot cached per
    builder generation — the analogue of UnifiedSearchEngineCache catch-up)."""

    kind = "flat"

    def __init__(self, dim: int, similarity: str = Similarity.COSINE, device_dtype="auto"):
        """`device_dtype`: None keeps f32; `jnp.bfloat16` halves HBM residency (the
        10M x 768 configs); "auto" (default) is f32 until BF16_AUTO_ROWS rows, then
        bf16. Scores always accumulate in f32 on the MXU."""
        # read-triggered snapshot builds can race under the orchestrator RW lock
        self._snap_lock = threading.Lock()
        self.builder = DenseIndexBuilder(dim=dim, similarity=similarity)
        self.device_dtype = device_dtype
        self._snap = None
        self._snap_gen = -1
        self._snap_dtype = None
        self.snapshot_count = 0

    def _resolve_dtype(self):
        if isinstance(self.device_dtype, str) and self.device_dtype == "auto":
            return jnp.bfloat16 if len(self.builder) >= BF16_AUTO_ROWS else None
        return self.device_dtype

    @property
    def dim(self) -> int:
        return self.builder.dim

    def add(self, frame_id, vec):
        self.builder.add(frame_id, vec)

    def add_batch(self, frame_ids, vecs):
        self.builder.add_batch(np.asarray(frame_ids), vecs)

    def remove(self, frame_id) -> bool:
        return self.builder.remove(frame_id)

    def snapshot(self):
        dtype = self._resolve_dtype()
        if self._snap is None or self._snap_gen != self.builder.generation or self._snap_dtype != dtype:
            with self._snap_lock:
                if (
                    self._snap is None
                    or self._snap_gen != self.builder.generation
                    or self._snap_dtype != dtype
                ):
                    from wax_tpu.utils.profiling import span

                    with span("engine.dense_snapshot"):
                        self._snap = self.builder.snapshot(device_dtype=dtype)
                    self._snap_gen = self.builder.generation
                    self._snap_dtype = dtype
                    self.snapshot_count += 1
        return self._snap

    def trace(self, snap) -> None:
        """Run the search kernel once on a GIVEN snapshot (jit pre-trace).

        Orchestrator warmup calls snapshot() under its reader lock (builders must
        not race writers) and this OUTSIDE it, so a multi-minute remote compile
        never blocks writers."""
        q = jnp.zeros((1, self.dim), jnp.float32)
        flat_scan_topk(q, snap, 1)

    def search(self, queries: np.ndarray, k: int):
        k = min(k, MAX_TOP_K)
        if len(self.builder) == 0:
            b = np.atleast_2d(queries).shape[0]
            return np.full((b, k), -np.inf, np.float32), np.full((b, k), -1, np.int32)
        snap = self.snapshot()
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        kk = min(k, snap.capacity)
        # AOT-persisted executable: a fresh process skips the ~0.5 s lane trace
        # on any (shape, k) it has served before (utils/aot_cache.py)
        from wax_tpu.utils.aot_cache import aot_call

        vals, _, fids = aot_call(
            "flat_scan", f"k={kk}", lambda qq, s: flat_scan_topk(qq, s, kk), q, snap
        )
        vals, fids = np.asarray(vals), np.asarray(fids)
        if vals.shape[1] < k:
            pad = k - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=-np.inf)
            fids = np.pad(fids, ((0, 0), (0, pad)), constant_values=-1)
        return vals, fids

    def __len__(self):
        return len(self.builder)

    def __contains__(self, fid):
        return fid in self.builder


class HNSWVectorEngine(FreshLockOnCopyMixin):
    """Approximate graph engine (M=16 default, matching USearchVectorEngine.swift:7).
    Uses the native C++ builder when the toolchain is available (6x+ faster host-side
    construction), falling back to the pure-Python builder transparently."""

    kind = "hnsw"

    def __init__(self, dim: int, m: int = 16, ef_construction: int = 100, ef_search: int = 64):
        self._snap_lock = threading.Lock()
        from wax_tpu.index.graph_cpp import best_hnsw_builder

        self.builder = best_hnsw_builder(dim, m=m, ef_construction=ef_construction)
        self.ef_search = ef_search
        self._snap = None
        self._snap_gen = -1
        self.snapshot_count = 0

    @property
    def dim(self) -> int:
        return self.builder.dim

    def add(self, frame_id, vec):
        self.builder.add(frame_id, vec)

    def add_batch(self, frame_ids, vecs):
        self.builder.add_batch(frame_ids, vecs)

    def remove(self, frame_id) -> bool:
        return self.builder.remove(frame_id)

    def snapshot(self):
        if self._snap is None or self._snap_gen != self.builder.generation:
            with self._snap_lock:
                if self._snap is None or self._snap_gen != self.builder.generation:
                    self._snap = self.builder.snapshot()
                    self._snap_gen = self.builder.generation
                    self.snapshot_count += 1
        return self._snap

    def trace(self, snap) -> None:
        """jit pre-trace on a GIVEN snapshot (see FlatVectorEngine.trace)."""
        q = jnp.zeros((1, self.builder.dim), jnp.float32)
        hnsw_search(q, snap, k=1, ef=max(self.ef_search, 1))

    def search(self, queries: np.ndarray, k: int):
        k = min(k, MAX_TOP_K)
        if len(self.builder) == 0:
            b = np.atleast_2d(queries).shape[0]
            return np.full((b, k), -np.inf, np.float32), np.full((b, k), -1, np.int32)
        graph = self.snapshot()
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        ef = max(self.ef_search, k)
        vals, fids = hnsw_search(q, graph, k=min(k, ef), ef=ef)
        vals, fids = np.asarray(vals), np.asarray(fids)
        if vals.shape[1] < k:
            pad = k - vals.shape[1]
            vals = np.pad(vals, ((0, 0), (0, pad)), constant_values=-np.inf)
            fids = np.pad(fids, ((0, 0), (0, pad)), constant_values=-1)
        return vals, fids

    def __len__(self):
        return len(self.builder)

    def __contains__(self, fid):
        return fid in self.builder


class IVFVectorEngine(FreshLockOnCopyMixin):
    """Approximate bucketed engine — the TPU-idiomatic ANN (see index/ivf.py).

    Incremental adds accumulate in a dense builder; the IVF snapshot re-packs lazily.
    K-means re-trains only when the corpus grew markedly since the last training
    (>25%), otherwise new vectors are assigned to the existing centroids — the usual
    IVF maintenance policy."""

    kind = "ivf"

    def __init__(
        self,
        dim: int,
        n_clusters: int | None = None,
        nprobe: int = 8,
        seed: int = 0,
        bucket_dtype=None,
        spill: float | str = 0.0,
    ):
        """`spill` enables boundary replication at FULL rebuilds (build_ivf(spill=...)
        — the recall lever at serving scale). It consumes the bucket slack that
        incremental adds would otherwise use, so a spilled engine always re-packs on
        new adds instead of slotting them in place."""
        self._snap_lock = threading.Lock()
        self.builder = DenseIndexBuilder(dim=dim, similarity=Similarity.COSINE)
        self.n_clusters = n_clusters
        self.nprobe = nprobe
        self.seed = seed
        self.bucket_dtype = bucket_dtype
        self.spill = spill
        self._snap = None
        self._snap_gen = -1
        self._trained_count = 0
        self._centroids = None
        self.snapshot_count = 0
        # incremental-add state: new vectors since the last snapshot slot into the
        # EXISTING buckets (classic IVF insert, the analogue of USearch's add) so
        # interactive ingest does not re-run k-means per mutation. Removals, upserts,
        # or >2x growth since training force a full retrain.
        self._pending_adds: list[tuple[int, np.ndarray]] = []
        self._needs_full = False
        self.incremental_count = 0

    @property
    def dim(self) -> int:
        return self.builder.dim

    def add(self, frame_id, vec):
        if int(frame_id) in self.builder._row_of:
            self._needs_full = True  # upsert: stale copy must leave the buckets
        else:
            self._pending_adds.append((int(frame_id), self.builder._prep(vec)[0]))
        self.builder.add(frame_id, vec)

    def add_batch(self, frame_ids, vecs):
        frame_ids = np.asarray(frame_ids)
        fid_list = frame_ids.tolist()
        if len(set(fid_list)) != len(fid_list) or any(
            int(f) in self.builder._row_of for f in fid_list
        ):
            # upsert (vs the index or within the batch): the stale copy must leave
            # the buckets, which only a full rebuild does
            self._needs_full = True
        else:
            prepped = self.builder._prep(vecs)
            self._pending_adds.extend((int(f), v) for f, v in zip(fid_list, prepped))
        self.builder.add_batch(frame_ids, vecs)

    def remove(self, frame_id) -> bool:
        ok = self.builder.remove(frame_id)
        if ok:
            self._needs_full = True
        return ok

    def _try_incremental(self):
        """Slot pending adds into the existing buckets (top-8 preferred centroids,
        first with free capacity; densest-prefix invariant preserved). Returns the
        new snapshot, or None when a full rebuild is required (no capacity)."""
        snap = self._snap
        c, s = snap.n_clusters, snap.bucket_size
        fids = np.asarray([f for f, _ in self._pending_adds], np.int64)
        vecs = np.stack([v for _, v in self._pending_adds]).astype(np.float32)
        scores = jax.lax.dot_general(
            jnp.asarray(vecs), snap.centroids, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        prefs = np.asarray(jax.lax.top_k(scores, min(8, c))[1])
        fills = np.array(jnp.sum(snap.ids >= 0, axis=1))  # writable host copy
        b_idx = np.empty(len(fids), np.int32)
        s_idx = np.empty(len(fids), np.int32)
        for i in range(len(fids)):
            for cand in prefs[i]:
                if fills[cand] < s:
                    b = int(cand)
                    break
            else:
                b = int(np.argmin(fills))
                if fills[b] >= s:
                    return None  # every bucket full
            b_idx[i] = b
            s_idx[i] = fills[b]
            fills[b] += 1
        bi, si = jnp.asarray(b_idx), jnp.asarray(s_idx)
        from wax_tpu.index.ivf import IVFIndex

        return IVFIndex(
            centroids=snap.centroids,
            emb=snap.emb.at[bi, si].set(jnp.asarray(vecs).astype(snap.emb.dtype)),
            ids=snap.ids.at[bi, si].set(jnp.asarray(fids, jnp.int32)),
            bias=snap.bias.at[bi, si].set(0.0),
            spilled=snap.spilled,
        )

    def snapshot(self):
        from wax_tpu.index.ivf import build_ivf

        if self._snap is None or self._snap_gen != self.builder.generation:
            with self._snap_lock:
                return self._snapshot_locked(build_ivf)
        return self._snap

    def _snapshot_locked(self, build_ivf):
        # IVF snapshot MUTATES engine state (consumes _pending_adds) — unlike the
        # flat/HNSW cache fills it must be exclusive under concurrent readers
        if self._snap is None or self._snap_gen != self.builder.generation:
            incremental = None
            if (
                self._snap is not None
                and not self._needs_full
                and not self.spill  # spill consumed the slack incremental adds need
                and self._pending_adds
                and len(self.builder) <= 2 * max(self._trained_count, 1)
            ):
                incremental = self._try_incremental()
            if incremental is not None:
                self._snap = incremental
                self.incremental_count += 1
            else:
                state = self.builder.state_arrays()
                live = state["active"]
                vecs = state["emb"][live]
                fids = state["frame_ids"][live]
                self._snap = build_ivf(
                    vecs, fids, n_clusters=self.n_clusters, seed=self.seed,
                    bucket_dtype=self.bucket_dtype, spill=self.spill,
                )
                self._trained_count = len(vecs)
                self._needs_full = False
            self._pending_adds.clear()
            self._snap_gen = self.builder.generation
            self.snapshot_count += 1
        return self._snap

    def trace(self, snap) -> None:
        """jit pre-trace on a GIVEN snapshot (see FlatVectorEngine.trace)."""
        from wax_tpu.index.ivf import ivf_search_topk
        from wax_tpu.ops.ivf_kernel import ivf_search_topk_pallas

        q = jnp.zeros((1, self.builder.dim), jnp.float32)
        if snap.bucket_size % 128 == 0:
            ivf_search_topk_pallas(q, snap, k=1, nprobe=self.nprobe)
        else:
            ivf_search_topk(q, snap, k=1, nprobe=self.nprobe)

    def search(self, queries: np.ndarray, k: int):
        from wax_tpu.index.ivf import ivf_search_topk
        from wax_tpu.ops.ivf_kernel import ivf_search_topk_pallas

        k = min(k, MAX_TOP_K)
        if len(self.builder) == 0:
            b = np.atleast_2d(queries).shape[0]
            return np.full((b, k), -np.inf, np.float32), np.full((b, k), -1, np.int32)
        snap = self.snapshot()
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        if snap.bucket_size % 128 == 0:
            # DMA-gather kernel: measured 45x over the XLA gather path at 1M x 768
            vals, fids = ivf_search_topk_pallas(q, snap, k=k, nprobe=self.nprobe)
        else:
            vals, fids = ivf_search_topk(q, snap, k=k, nprobe=self.nprobe)
        return np.asarray(vals), np.asarray(fids)

    def __len__(self):
        return len(self.builder)

    def __contains__(self, fid):
        return fid in self.builder


class ShardedFlatVectorEngine(FlatVectorEngine):
    """Exact scan with the corpus sharded over all local devices (data mesh).

    Queries replicate; each shard scans its rows and candidates merge over ICI
    (parallel/sharded_scan.py). Single-device meshes degrade gracefully to the
    single-chip layout."""

    kind = "sharded"

    def __init__(self, dim: int, similarity: str = Similarity.COSINE, device_dtype="auto", mesh=None):
        super().__init__(dim=dim, similarity=similarity, device_dtype=device_dtype)
        from wax_tpu.parallel.mesh import data_mesh

        self.mesh = mesh if mesh is not None else data_mesh()
        self._sharded = None

    def snapshot(self):
        from wax_tpu.parallel.sharded_scan import shard_dense_index

        dtype = self._resolve_dtype()
        if self._snap is None or self._snap_gen != self.builder.generation or self._snap_dtype != dtype:
            with self._snap_lock:  # concurrent readers must not double-build/shard
                if (
                    self._snap is None
                    or self._snap_gen != self.builder.generation
                    or self._snap_dtype != dtype
                ):
                    self._snap = self.builder.snapshot(device_dtype=dtype)
                    self._sharded = shard_dense_index(self._snap, self.mesh)
                    self._snap_gen = self.builder.generation
                    self._snap_dtype = dtype
                    self.snapshot_count += 1
        return self._sharded

    def trace(self, snap) -> None:
        """jit pre-trace on a GIVEN sharded snapshot (see FlatVectorEngine.trace)."""
        from wax_tpu.parallel.sharded_scan import sharded_flat_scan_topk

        q = jnp.zeros((1, self.dim), jnp.float32)
        sharded_flat_scan_topk(q, snap, 1, self.mesh)

    def search(self, queries: np.ndarray, k: int):
        from wax_tpu.parallel.sharded_scan import sharded_flat_scan_topk

        k = min(k, MAX_TOP_K)
        if len(self.builder) == 0:
            b = np.atleast_2d(queries).shape[0]
            return np.full((b, k), -np.inf, np.float32), np.full((b, k), -1, np.int32)
        sharded = self.snapshot()
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        vals, fids = sharded_flat_scan_topk(q, sharded, k, self.mesh)
        return np.asarray(vals), np.asarray(fids)


AUTO_ANN_ROWS = 2_097_152  # exact bf16 fused scan serves to here (~1.4 ms/batch256)
AUTO_RECALL_TARGET = 0.95
_AUTO_NPROBE_LADDER = (8, 16, 32, 64)
_AUTO_SAMPLE_Q = 64
_AUTO_SAMPLE_K = 10


class AutoVectorEngine(FreshLockOnCopyMixin):
    """Recall-aware automatic engine selection (round-5 verdict item).

    Below `ann_rows` the corpus serves from the exact fused flat scan (recall 1.0
    by construction — on TPU the MXU scan beats graph traversal outright at these
    sizes). At or above it, the engine MEASURES sampled recall@10 of the IVF ANN
    against the exact scan on perturbed held-out corpus rows, escalating nprobe
    through a ladder and then boundary spill until the measured recall clears
    `recall_target`; if no ANN configuration does (pathological geometry), it
    falls back to the exact scan rather than silently serving low recall. HNSW
    stays an explicit opt-in: graph ANN is structurally DMA-latency-bound on TPU
    (docs/benchmarks.md), and its measured ceiling on hard geometries is below
    IVF's, so the auto router never selects it. The decision, the measured
    recall, and the reason are exposed via `stats()` and re-evaluated per
    builder generation.

    (reference: USearchVectorEngine.swift:7 — the reference's always-on ANN has
    no recall instrumentation; this router only serves an approximate engine it
    has just measured above target on the live corpus.)
    """

    kind = "auto"

    def __init__(self, dim: int, similarity: str = Similarity.COSINE, device_dtype="auto",
                 ann_rows: int = AUTO_ANN_ROWS, recall_target: float = AUTO_RECALL_TARGET,
                 seed: int = 0):
        self._flat = FlatVectorEngine(dim=dim, similarity=similarity, device_dtype=device_dtype)
        self.ann_rows = int(ann_rows)
        self.recall_target = float(recall_target)
        self.seed = int(seed)
        self._ann = None
        self._route_gen = -1
        self.selection = {"engine": "flat", "reason": "empty corpus", "measured_recall": None}

    # -- builder delegation (serialization + maintenance touch engine.builder) ----
    @property
    def builder(self):
        return self._flat.builder

    @builder.setter
    def builder(self, b):
        self._flat.builder = b
        self._flat._snap = None
        self._flat._snap_gen = -1
        self._ann = None
        self._route_gen = -1

    @property
    def dim(self) -> int:
        return self._flat.dim

    @property
    def device_dtype(self):
        return self._flat.device_dtype

    def add(self, frame_id, vec):
        self._flat.add(frame_id, vec)

    def add_batch(self, frame_ids, vecs):
        self._flat.add_batch(frame_ids, vecs)

    def remove(self, frame_id) -> bool:
        return self._flat.remove(frame_id)

    def __len__(self):
        return len(self._flat)

    def __contains__(self, fid):
        return fid in self._flat

    def stats(self) -> dict:
        """The current routing decision: engine, measured sampled recall, reason."""
        return dict(self.selection)

    # -- routing ------------------------------------------------------------------
    def _sample_queries(self, rng):
        state = self.builder.state_arrays()
        live_rows = np.nonzero(state["active"])[0]
        rows = rng.choice(live_rows, size=min(_AUTO_SAMPLE_Q, len(live_rows)), replace=False)
        q = state["emb"][rows].astype(np.float32)
        q = q + rng.normal(0.0, 0.05, q.shape).astype(np.float32)  # held-out-ish
        n = np.linalg.norm(q, axis=1, keepdims=True)
        return q / np.maximum(n, 1e-9)

    @staticmethod
    def _recall(exact_f, got_f):
        hits = 0
        total = 0
        for e_row, g_row in zip(exact_f, got_f):
            ref = {int(f) for f in e_row if f >= 0}
            if not ref:
                continue
            hits += len(ref & {int(f) for f in g_row if f >= 0})
            total += len(ref)
        return hits / max(total, 1)

    def _decide(self):
        gen = self.builder.generation
        if self._route_gen == gen:
            return
        n = len(self.builder)
        if n == 0:
            self._ann = None
            self.selection = {"engine": "flat", "reason": "empty corpus", "measured_recall": None}
            self._route_gen = gen
            return
        if n < self.ann_rows:
            self._ann = None
            self.selection = {
                "engine": "flat",
                "reason": f"{n} rows < ann_rows={self.ann_rows}: exact fused scan",
                "measured_recall": 1.0,
            }
            self._route_gen = gen
            return
        rng = np.random.default_rng(self.seed ^ (gen & 0x7FFFFFFF))
        q = self._sample_queries(rng)
        _, exact_f = self._flat.search(q, _AUTO_SAMPLE_K)
        candidates = [(IVFVectorEngine(dim=self.dim, seed=self.seed), _AUTO_NPROBE_LADDER)]
        spilled = IVFVectorEngine(dim=self.dim, seed=self.seed, spill="auto")
        candidates.append((spilled, (_AUTO_NPROBE_LADDER[-1],)))
        best = (None, -1.0, None)
        for eng, ladder in candidates:
            eng.builder = self.builder
            for nprobe in ladder:
                eng.nprobe = int(nprobe)
                _, got_f = eng.search(q, _AUTO_SAMPLE_K)
                rec = self._recall(exact_f, got_f)
                if rec > best[1]:
                    best = (eng, rec, nprobe)
                if rec >= self.recall_target:
                    self._ann = eng
                    self.selection = {
                        "engine": "ivf",
                        "reason": (
                            f"measured recall@{_AUTO_SAMPLE_K} {rec:.3f} >= "
                            f"{self.recall_target} at nprobe={nprobe}"
                            + (", spill=auto" if eng is spilled else "")
                        ),
                        "measured_recall": round(rec, 4),
                        "nprobe": int(nprobe),
                    }
                    self._route_gen = gen
                    return
        self._ann = None
        self.selection = {
            "engine": "flat",
            "reason": (
                f"no ANN config reached recall {self.recall_target} on this geometry "
                f"(best {best[1]:.3f} at nprobe={best[2]}): serving the exact scan"
            ),
            "measured_recall": 1.0,
        }
        self._route_gen = gen

    def _route(self):
        self._decide()
        return self._ann if self._ann is not None else self._flat

    def snapshot(self):
        return self._route().snapshot()

    def trace(self, snap) -> None:
        self._route().trace(snap)

    def search(self, queries: np.ndarray, k: int):
        return self._route().search(queries, k)


def make_vector_engine(preference: str, dim: int, **kw) -> VectorEngine:
    """preference: "auto" | "flat" | "hnsw" | "ivf" | "sharded". "auto" is the
    recall-aware router (AutoVectorEngine): exact fused scan below AUTO_ANN_ROWS,
    then measured-recall IVF escalation with an exact-scan fallback; "ivf"/"hnsw"
    opt into the approximate engines explicitly."""
    if preference == "auto":
        return AutoVectorEngine(dim=dim, **kw)
    if preference == "flat":
        return FlatVectorEngine(dim=dim, **kw)
    if preference == "sharded":
        return ShardedFlatVectorEngine(dim=dim, **kw)
    if preference == "hnsw":
        return HNSWVectorEngine(dim=dim, **kw)
    if preference == "ivf":
        return IVFVectorEngine(dim=dim, **kw)
    raise ValueError(f"unknown vector engine preference {preference!r}")
