"""IVF (inverted-file) vector index: device-built k-means buckets, MXU-probed search.

The TPU-idiomatic approximate engine. Graph ANN (HNSW) is pointer-chasing — its
irregular gathers fight the hardware, and on uniform high-dim data its recall collapses
(see tests). IVF is the shape TPUs want (the ScaNN-family recipe): cluster the corpus
with k-means (itself a pure MXU workload here), store each cluster as one contiguous
fixed-size bucket, and answer queries with two dense matmuls — q x centroids to pick
nprobe buckets, then q x (gathered bucket block) for exact scoring inside them. Every
gather is a whole contiguous bucket, every shape static.

Build runs ON DEVICE: assignment is a flat scan over centroids, centroid update is a
segment-sum — k-means at MXU speed. Host code only packs bucket layouts.
"""
from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from wax_tpu.ops.topk import NEG_INF

__all__ = ["IVFIndex", "build_ivf", "dedup_topk", "ivf_search_topk", "kmeans"]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class IVFIndex:
    """Device-resident IVF snapshot (pytree).

    centroids: [C, d] cluster centers (L2-normalized for cosine).
    emb:       [C, S, d] bucketed vectors (bucket-contiguous in HBM).
    ids:       [C, S] int32 external frame ids, -1 padding.
    bias:      [C, S] f32 additive mask (0 live / NEG_INF padding).
    spilled:   True when boundary rows were replicated into their 2nd-best bucket
               (build_ivf(spill=...)); search then fetches a 2k window and dedupes
               by frame id, since the same row can reach the merge via two buckets.
    """

    centroids: jax.Array
    emb: jax.Array
    ids: jax.Array
    bias: jax.Array
    spilled: bool = field(metadata=dict(static=True), default=False)

    @property
    def n_clusters(self) -> int:
        return self.centroids.shape[0]

    @property
    def bucket_size(self) -> int:
        return self.emb.shape[1]

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_ASSIGN_BLOCK = 65536
_ASSIGN_SCORE_BYTES = 1 << 30  # cap the [block, C] f32 score temp at ~1 GiB


@jax.jit
def _assign_block(vecs, centroids):
    scores = jax.lax.dot_general(
        vecs, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return jnp.argmax(scores, axis=1)


def _assign_rows(n_clusters: int) -> int:
    """Rows per assignment block, sized so the [block, C] f32 score temp stays under
    ~1 GiB — at C=16K a 64K-row block's 4.3 GiB temp arena fragments HBM next to a
    multi-GB corpus + bucket tensor (the 10M-scale OOM mode)."""
    return max(8192, min(_ASSIGN_BLOCK, _ASSIGN_SCORE_BYTES // (4 * max(n_clusters, 1))))


def _assign(vecs, centroids):
    """Blocked assignment: the full [N, C] score matrix would not fit in HBM at the
    10M-scale configs, so rows are processed in fixed blocks."""
    n = vecs.shape[0]
    rows = _assign_rows(centroids.shape[0])
    if n <= rows:
        return _assign_block(vecs, centroids)
    out = []
    for s in range(0, n, rows):
        block = jax.lax.dynamic_slice_in_dim(vecs, s, min(rows, n - s), 0)
        out.append(_assign_block(block, centroids))
    return jnp.concatenate(out)


@jax.jit
def _update_centroids(vecs, assign, n_clusters_arr):
    c = n_clusters_arr.shape[0]
    sums = jnp.zeros((c, vecs.shape[1]), jnp.float32).at[assign].add(vecs.astype(jnp.float32))
    counts = jnp.zeros((c,), jnp.float32).at[assign].add(1.0)
    cent = sums / jnp.maximum(counts[:, None], 1.0)
    norms = jnp.linalg.norm(cent, axis=1, keepdims=True)
    return jnp.where(norms > 0, cent / jnp.maximum(norms, 1e-12), cent), counts


def kmeans(vecs: jax.Array, n_clusters: int, iters: int = 8, seed: int = 0):
    """Spherical k-means on device. Returns (centroids [C,d], assignments [N])."""
    n = vecs.shape[0]
    key = jax.random.PRNGKey(seed)
    init_rows = jax.random.choice(key, n, (n_clusters,), replace=n < n_clusters)
    centroids = jnp.asarray(vecs)[init_rows].astype(jnp.float32)
    marker = jnp.zeros((n_clusters,), jnp.float32)
    assign = None
    for it in range(iters):
        assign = _assign(vecs, centroids)
        new_cent, counts = _update_centroids(vecs, assign, marker)
        # keep old centroid for empty clusters
        centroids = jnp.where((counts > 0)[:, None], new_cent, centroids)
    assign = _assign(vecs, centroids)
    return centroids, assign


def build_ivf(
    vecs,
    frame_ids: np.ndarray,
    n_clusters: int | None = None,
    bucket_size: int | None = None,
    iters: int = 8,
    seed: int = 0,
    normalize: bool = True,
    bucket_dtype=None,
    train_rows: int | str | None = "auto",
    spill: float | str = 0.0,
) -> IVFIndex:
    """Cluster + pack into fixed-size buckets (overflow spills to next-best center).

    `spill` enables BOUNDARY REPLICATION (classic IVF multi-assignment, the recall
    lever at fixed nprobe): after primary packing, rows closest to a cluster
    boundary (smallest top1-top2 centroid-score margin) are COPIED into their
    2nd-best cluster's remaining empty slots. Buckets are already padded to a fixed
    size, so this costs zero extra HBM — it fills slack that would otherwise be
    NEG_INF padding. A float caps the number of copies at `spill * n`; "auto" fills
    every free slot. Search on a spilled index fetches a 2k candidate window and
    dedupes by frame id (see ivf_search_topk).

    Accepts host or device vectors; the vector matrix never round-trips to the host —
    only cluster assignments (4 bytes/row) do, and bucket packing is a device
    permutation scatter. Matters on tunneled TPU setups where pulling a multi-GB
    corpus is minutes of wall clock.

    `train_rows` bounds the k-means TRAINING set (a uniform sample; the final
    assignment still covers every row). At multi-million scale the centroid-update
    scatter-add materializes an f32 copy of its training rows, so training on the
    full corpus would transiently need 2x corpus bytes of HBM; ~2M training rows
    estimate 16K centroids just as well (standard k-means subsampling practice).
    "auto" (default) trains on max(2M, 128 rows/centroid), capped at n; None trains
    on the full corpus.
    """
    vecs_dev = jnp.asarray(vecs)
    n, d = vecs_dev.shape
    if normalize:
        vecs_dev = jax.jit(
            lambda v: v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12)
        )(vecs_dev.astype(jnp.float32))
    frame_ids = np.asarray(frame_ids, np.int64)

    if n_clusters is None:
        n_clusters = max(1, min(n, int(2 * math.sqrt(max(n, 1)))))
    if bucket_size is None:
        # 128-aligned so the Pallas probe kernel's bucket stride is lane-aligned
        bucket_size = _round_up(max(128, int(1.5 * n / n_clusters)), 128)
    while n_clusters * bucket_size < n:
        bucket_size = _round_up(bucket_size + max(128, bucket_size // 4), 128)

    if train_rows == "auto":
        train_rows = max(2_097_152, 128 * n_clusters)
    if train_rows is not None and train_rows < n:
        sample = jax.random.choice(
            jax.random.PRNGKey(seed ^ 0x5EED), n, (train_rows,), replace=False
        )
        centroids, _ = kmeans(jnp.take(vecs_dev, sample, axis=0), n_clusters, iters, seed)
        assign_dev = _assign(vecs_dev, centroids)
    else:
        centroids, assign_dev = kmeans(vecs_dev, n_clusters, iters, seed)
    assign = np.asarray(assign_dev)  # [N] int32 — the only per-row host transfer

    # pack on host over assignments only — vectorized (a per-row Python loop is
    # minutes of wall clock at 10M rows on a throttled host). Semantics identical to
    # the sequential fill: rows sorted stably by cluster (so ascending original index
    # within a cluster), the first `bucket_size` of each cluster take slots 0.., the
    # rest overflow in the same traversal order.
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order].astype(np.int64)
    counts = np.bincount(sorted_assign, minlength=n_clusters)
    group_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank_in_group = np.arange(n, dtype=np.int64) - group_start[sorted_assign]
    fits = rank_in_group < bucket_size
    slot_cluster = np.full(n, -1, np.int64)
    slot_pos = np.full(n, -1, np.int64)
    slot_cluster[order[fits]] = sorted_assign[fits]
    slot_pos[order[fits]] = rank_in_group[fits]
    bucket_fill = np.minimum(counts, bucket_size)
    overflow: list[int] = order[~fits].tolist()
    if overflow:
        ov = np.asarray(overflow)
        # blocked ([O, C] f32 in one shot is GBs when many clusters overflow at
        # scale), and only the top-8 preferred clusters leave the device — pulling
        # raw [O, C] scores through a tunneled backend is GBs of host transfer
        ov_rows = _assign_rows(n_clusters)
        n_pref = min(8, n_clusters)
        pref = np.concatenate(
            [
                np.asarray(
                    jax.lax.top_k(
                        _assign_scores(
                            jnp.take(vecs_dev, jnp.asarray(ov[s : s + ov_rows]), axis=0),
                            centroids,
                        ),
                        n_pref,
                    )[1]
                )
                for s in range(0, len(ov), ov_rows)
            ]
        )  # [O, n_pref] — preferred clusters per overflow row
        for i, row in enumerate(ov.tolist()):
            placed = False
            for c in pref[i].tolist():
                if bucket_fill[c] < bucket_size:
                    slot_cluster[row] = c
                    slot_pos[row] = bucket_fill[c]
                    bucket_fill[c] += 1
                    placed = True
                    break
            if not placed:
                c = int(np.argmin(bucket_fill))
                slot_cluster[row] = c
                slot_pos[row] = bucket_fill[c]
                bucket_fill[c] += 1

    slot_index = slot_cluster * bucket_size + slot_pos  # [N] flat bucket slot per row
    if bucket_dtype is not None:
        vecs_dev = vecs_dev.astype(bucket_dtype)
    emb = _scatter_buckets(vecs_dev, jnp.asarray(slot_index), n_clusters * bucket_size)
    ids = np.full((n_clusters * bucket_size,), -1, np.int32)
    ids[slot_index] = frame_ids.astype(np.int32)

    spilled = False
    spill_rows = spill_slots = None
    if spill and n_clusters > 1:
        spill_rows, spill_slots = _plan_spill(
            vecs_dev, centroids, slot_cluster, bucket_fill, bucket_size, spill
        )
        if len(spill_rows):
            ids[spill_slots] = frame_ids[spill_rows].astype(np.int32)
            spilled = True

    # upload the small long-lived arrays BEFORE the multi-GB spill scatter: at the
    # 5.9M configs corpus + buckets leave only tens of MB of HBM headroom, and a
    # fragmented arena after the scatter loop can fail even a 31 MB put
    ids = ids.reshape(n_clusters, bucket_size)
    ids_dev = jnp.asarray(ids)
    bias_dev = jnp.asarray(np.where(ids >= 0, 0.0, NEG_INF).astype(np.float32))

    if spilled:
        emb = _scatter_spill(emb, vecs_dev, jnp.asarray(spill_rows), jnp.asarray(spill_slots))

    return IVFIndex(
        centroids=centroids,
        emb=emb.reshape(n_clusters, bucket_size, d),
        ids=ids_dev,
        bias=bias_dev,
        spilled=spilled,
    )


def _plan_spill(vecs_dev, centroids, placed_cluster, bucket_fill, bucket_size: int, spill):
    """Pick boundary rows + target slots for 2nd-best-cluster replication.

    Device computes per-row (2nd-best cluster, top1-top2 margin) in blocks; the host
    then selects, per target cluster, its free-slot count of candidates in ascending
    margin order (closest to the boundary first — those are the rows whose true
    nearest neighbors most often live across the boundary). Rows whose PLACED bucket
    already equals their 2nd-best cluster (overflow placements) are excluded — a
    copy into the same bucket would burn a slot on a duplicate. Returns (rows, flat
    slots) as int64 arrays.
    """
    n = vecs_dev.shape[0]
    n_clusters = centroids.shape[0]
    rows_per = _assign_rows(n_clusters)
    sec = np.empty(n, np.int64)
    margin = np.empty(n, np.float32)
    for s in range(0, n, rows_per):
        block = jax.lax.dynamic_slice_in_dim(vecs_dev, s, min(rows_per, n - s), 0)
        v2, i2 = _top2_clusters(block, centroids)
        e = s + block.shape[0]
        sec[s:e] = np.asarray(i2[:, 1])
        margin[s:e] = np.asarray(v2[:, 0] - v2[:, 1])

    budget = n if spill == "auto" else int(float(spill) * n)
    if budget <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    eligible = np.nonzero(sec != placed_cluster)[0]
    # global cap first: only the `budget` most-boundary eligible rows are candidates
    cand = eligible[np.argsort(margin[eligible], kind="stable")[:budget]]
    # per-cluster packing: rank candidates within their target cluster by margin,
    # keep those that fit in the free slots
    order = np.lexsort((margin[cand], sec[cand]))
    cand = cand[order]
    tgt = sec[cand]
    counts = np.bincount(tgt, minlength=n_clusters)
    group_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(cand), dtype=np.int64) - group_start[tgt]
    free = (bucket_size - bucket_fill).astype(np.int64)
    take = rank < free[tgt]
    rows = cand[take]
    slots = tgt[take] * bucket_size + bucket_fill[tgt[take]] + rank[take]
    return rows.astype(np.int64), slots.astype(np.int64)


@jax.jit
def _top2_clusters(block, centroids):
    return jax.lax.top_k(_assign_scores(block, centroids), 2)


@functools.partial(jax.jit, donate_argnums=0)
def _scatter_spill_jit(e, v, r, sl):
    # e is DONATED: at multi-GB bucket sizes an un-aliased scatter would hold two
    # full copies of the bucket tensor (the 5.9M-scale OOM)
    return e.at[sl].set(v[r].astype(e.dtype))


_SPILL_CHUNK = 262_144


def _scatter_spill(emb_flat, vecs_dev, rows, slots):
    """Chunked spill scatter: each step's row-gather temp stays ~200 MB — at the
    5.9M configs corpus + buckets already fill most of HBM, and a single-shot
    multi-GB gather tips it over (with a value-fetch sync per chunk so the async
    queue cannot stack the temporaries; see CLAUDE.md)."""
    for s in range(0, len(rows), _SPILL_CHUNK):
        emb_flat = _scatter_spill_jit(
            emb_flat, vecs_dev, rows[s : s + _SPILL_CHUNK], slots[s : s + _SPILL_CHUNK]
        )
        float(emb_flat[0, 0])  # value-fetch sync (block_until_ready can return early)
    return emb_flat


@jax.jit
def _assign_scores(vecs, centroids):
    return jax.lax.dot_general(
        vecs, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _scatter_buckets(vecs, slot_index, total_slots: int):
    @functools.partial(jax.jit, static_argnames=("total",))
    def scatter(v, idx, total):
        out = jnp.zeros((total, v.shape[1]), v.dtype)
        return out.at[idx].set(v)

    return scatter(vecs, slot_index, total_slots)



def dedup_topk(vals, fids, k: int):
    """Collapse duplicate frame ids in a candidate window, keep the best score each,
    return the top k by (score desc, frame id asc).

    Needed for spilled indexes: a replicated row can reach the merge through two
    probed buckets. Sort by (fid asc, score desc), kill non-first group members,
    then re-rank.
    """
    order = jnp.lexsort((-vals, fids), axis=-1)
    fid_s = jnp.take_along_axis(fids, order, axis=-1)
    val_s = jnp.take_along_axis(vals, order, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(fid_s[:, :1], bool), (fid_s[:, 1:] == fid_s[:, :-1]) & (fid_s[:, 1:] >= 0)],
        axis=1,
    )
    val_s = jnp.where(dup, NEG_INF, val_s)
    fid_s = jnp.where(dup, -1, fid_s)
    tie = jnp.where(fid_s >= 0, fid_s, jnp.int32(2**31 - 1))
    final = jnp.lexsort((tie, -val_s), axis=-1)[:, :k]
    return jnp.take_along_axis(val_s, final, axis=-1), jnp.take_along_axis(fid_s, final, axis=-1)


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_search_topk(queries: jax.Array, index: IVFIndex, k: int = 10, nprobe: int = 8):
    """Probe the nprobe best buckets per query, score exactly inside them.

    Buckets are visited with a lax.scan (one [B, S, d] block-gather + MXU score +
    running top-k merge per step) so memory stays bounded at any nprobe/corpus size —
    materializing all probed buckets at once would need nprobe x S x d floats per
    query (tens of GB at the 1M x 768 configs).

    On a spilled index the merge carries a 2k window and duplicates (one row via two
    buckets) are collapsed at the end, keeping the best-scored copy.

    Returns (scores [B, k] f32, frame_ids [B, k] int32); -1 padded.
    """
    b, d = queries.shape
    nprobe = min(nprobe, index.n_clusters)
    s_bucket = index.bucket_size
    q = queries.astype(jnp.float32)
    cscores = jax.lax.dot_general(
        q, index.centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    _, probes = jax.lax.top_k(cscores, nprobe)  # [B, P]
    kfetch = 2 * k if index.spilled else k
    kk = min(kfetch, s_bucket * nprobe)

    def step(carry, probe_col):  # probe_col: [B] bucket ids for this probe rank
        best_v, best_f = carry
        cand = jnp.take(index.emb, probe_col, axis=0)  # [B, S, d] contiguous DMA
        cand_ids = jnp.take(index.ids, probe_col, axis=0)  # [B, S]
        cand_bias = jnp.take(index.bias, probe_col, axis=0)
        scores = jnp.einsum("bd,bsd->bs", q, cand.astype(jnp.float32)) + cand_bias
        step_k = min(kk, s_bucket)
        v, pos = jax.lax.top_k(scores, step_k)
        f = jnp.take_along_axis(cand_ids, pos, axis=-1)
        mv, mpos = jax.lax.top_k(jnp.concatenate([best_v, v], axis=1), kk)
        mf = jnp.take_along_axis(jnp.concatenate([best_f, f], axis=1), mpos, axis=1)
        return (mv, mf), None

    init = (
        jnp.full((b, kk), NEG_INF, jnp.float32),
        jnp.full((b, kk), -1, jnp.int32),
    )
    (vals, fids), _ = jax.lax.scan(step, init, jnp.transpose(probes))
    fids = jnp.where(vals > NEG_INF * 0.5, fids, -1)
    if index.spilled:
        vals, fids = dedup_topk(vals, fids.astype(jnp.int32), min(k, kk))
    else:
        vals, fids = vals[:, :k], fids[:, :k]
    if vals.shape[1] < k:
        pad = k - vals.shape[1]
        vals = jnp.pad(vals, ((0, 0), (0, pad)), constant_values=NEG_INF)
        fids = jnp.pad(fids, ((0, 0), (0, pad)), constant_values=-1)
    return vals, fids.astype(jnp.int32)
