"""HNSW construction-parity harness (VERDICT round 1, item 3).

Builds TWO graphs on identical data — wax_tpu's C++ builder (native/hnsw.cpp) and an
independent hnswlib-faithful comparator (scripts/ref_hnsw.cpp) — then evaluates BOTH
with the same classic CPU best-first search (paper alg. 5) at matched ef, against
exact brute-force ground truth. Any recall difference is then attributable to graph
CONSTRUCTION, not to the search algorithm.

Host-only (no TPU). Usage:
    python scripts/hnsw_parity.py [--n 100000] [--dataset uniform|hard|loose|all]
        [--efc 200] [--extend]
"""
import argparse
import ctypes
import pathlib
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from wax_tpu.index.graph_cpp import CppHNSWBuilder  # noqa: E402

HERE = pathlib.Path(__file__).resolve().parent
B, D, K = 256, 384, 10


def load_ref():
    src = HERE / "ref_hnsw.cpp"
    # Key the build artifact on a source hash, not mtime: git does not preserve
    # mtimes, so a fresh clone could otherwise silently run a stale comparator.
    # The .so is never committed (see .gitignore) and uses -march=native, so it is
    # only valid on the host that built it.
    import hashlib

    src_hash = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    so = HERE / f"_build_librefhnsw_{src_hash}.so"
    if not so.exists():
        for stale in HERE.glob("_build_librefhnsw*.so"):
            stale.unlink(missing_ok=True)
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", str(so), str(src)],
            check=True,
        )
    lib = ctypes.CDLL(str(so))
    lib.ref_hnsw_create.restype = ctypes.c_void_p
    lib.ref_hnsw_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
    lib.ref_hnsw_free.argtypes = [ctypes.c_void_p]
    lib.ref_hnsw_add_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)]
    lib.ref_hnsw_search_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int64)]
    return lib


def fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def make_dataset(kind: str, n: int, rng):
    if kind == "uniform":
        v = rng.standard_normal((n, D)).astype(np.float32)
    elif kind == "loose":  # 60 loose clusters (docs/benchmarks.md config)
        c = rng.standard_normal((60, D)).astype(np.float32)
        a = rng.integers(0, 60, n)
        v = c[a] + 0.7 * rng.standard_normal((n, D)).astype(np.float32)
    elif kind == "hard":  # 200 tight clusters
        c = rng.standard_normal((200, D)).astype(np.float32)
        a = rng.integers(0, 200, n)
        v = c[a] + 0.15 * rng.standard_normal((n, D)).astype(np.float32)
    else:
        raise ValueError(kind)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def ground_truth(vecs, queries):
    gt = np.zeros((len(queries), K), np.int64)
    step = 64
    for i in range(0, len(queries), step):
        s = queries[i : i + step] @ vecs.T
        gt[i : i + step] = np.argsort(-s, axis=1)[:, :K]
    return gt


def recall(got, gt):
    return float(np.mean([len(set(got[i]) & set(gt[i])) / K for i in range(len(gt))]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dataset", default="all")
    ap.add_argument("--efc", type=int, default=200)
    ap.add_argument("--no-extend", action="store_true", help="disable extendCandidates (default on)")
    args = ap.parse_args()

    ref = load_ref()
    kinds = ["uniform", "hard", "loose"] if args.dataset == "all" else [args.dataset]
    for kind in kinds:
        rng = np.random.default_rng(0)
        vecs = make_dataset(kind, args.n, rng)
        queries = rng.standard_normal((B, D)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        t0 = time.perf_counter()
        gt = ground_truth(vecs, queries)
        print(f"[{kind} n={args.n}] ground truth: {time.perf_counter()-t0:.0f}s", flush=True)

        t0 = time.perf_counter()
        ours = CppHNSWBuilder(
            D, m=16, ef_construction=args.efc, seed=0, extend_candidates=not args.no_extend
        )
        ours.add_batch(np.arange(args.n), vecs)
        t_ours = time.perf_counter() - t0
        print(f"  ours built in {t_ours:.0f}s (efc={args.efc}, extend={not args.no_extend})", flush=True)

        t0 = time.perf_counter()
        h = ref.ref_hnsw_create(D, 16, args.efc, 0)
        ref.ref_hnsw_add_batch(h, args.n, fp(np.ascontiguousarray(vecs)))
        t_ref = time.perf_counter() - t0
        print(f"  ref  built in {t_ref:.0f}s", flush=True)

        print(f"  {'ef':>5}  {'ours(alg5)':>11}  {'ref(alg5)':>10}")
        for ef in (16, 32, 64, 128, 256):
            got_ours = ours.cpu_search_batch(queries, K, ef)
            out = np.full((B, K), -1, np.int64)
            ref.ref_hnsw_search_batch(h, B, fp(np.ascontiguousarray(queries)), K, ef, ip(out))
            print(
                f"  {ef:>5}  {recall(got_ours, gt):>11.4f}  {recall(out, gt):>10.4f}",
                flush=True,
            )
        ref.ref_hnsw_free(h)


if __name__ == "__main__":
    main()
