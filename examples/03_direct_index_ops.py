"""Direct index/op usage: build a dense index, run the fused top-k kernels, IVF.

For users who want the compute layer without the memory store (the analogue of using
WaxVectorSearch directly). Run: python examples/03_direct_index_ops.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("WAX_EXAMPLES_FORCE_CPU"):  # tests run the examples on CPU
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from wax_tpu import DenseIndexBuilder, flat_scan_topk, normalize_rows
from wax_tpu.index.ivf import build_ivf, ivf_search_topk


def main() -> None:
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((10_000, 128)).astype(np.float32)

    # exact fused scan (auto-selects the right kernel for the corpus size)
    builder = DenseIndexBuilder(dim=128)
    builder.add_batch(np.arange(len(vecs)), vecs)
    index = builder.snapshot()

    queries = normalize_rows(np.asarray(vecs[:4] + 0.01, np.float32))
    scores, rows, frame_ids = flat_scan_topk(queries, index, k=5)
    print("exact top-5 frame ids:", np.asarray(frame_ids)[0].tolist())

    # IVF: device k-means buckets + DMA probe kernel (serving-scale ANN)
    ivf = build_ivf(vecs, np.arange(len(vecs)), n_clusters=64)
    vals, fids = ivf_search_topk(queries, ivf, k=5, nprobe=8)
    print("ivf   top-5 frame ids:", np.asarray(fids)[0].tolist())


if __name__ == "__main__":
    main()
