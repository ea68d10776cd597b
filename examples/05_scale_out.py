"""Scale-out: the corpus sharded over a device mesh, one-program hybrid search.

On real hardware the mesh spans TPU chips over ICI; here the same code runs on a
virtual 8-device CPU mesh so the example works anywhere.
Run: python examples/05_scale_out.py
"""
import os
import sys

# virtual 8-device CPU mesh BEFORE jax initializes (on a real pod, delete these)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.index.dense import DenseIndexBuilder
from wax_tpu.index.lex import LexIndexBuilder
from wax_tpu.ops.bm25 import pad_term_ids
from wax_tpu.ops.flat_scan import normalize_rows
from wax_tpu.parallel.mesh import data_mesh
from wax_tpu.parallel.sharded_hybrid import shard_lex_index, sharded_hybrid_topk
from wax_tpu.parallel.sharded_scan import shard_dense_index

import jax.numpy as jnp


def main() -> None:
    print("devices:", jax.device_count())
    emb = HashEmbedder(64)
    docs = [
        (i, f"document {i} about {t} and the {t} service")
        for i, t in enumerate(["billing", "search", "ingest", "auth"] * 64)
    ]
    dense = DenseIndexBuilder(dim=64)
    dense.add_batch(
        np.asarray([fid for fid, _ in docs]), emb.embed_batch([t for _, t in docs])
    )
    lex = LexIndexBuilder()
    lex.add_batch(docs)

    mesh = data_mesh(jax.device_count())
    dsnap = dense.snapshot()
    d_sh = shard_dense_index(dsnap, mesh)  # rows sharded over the "data" axis
    l_sh = shard_lex_index(lex, mesh, n_rows_global=dsnap.capacity)

    query = "billing service error"
    qv = normalize_rows(jnp.asarray(emb.embed(query)[None, :]))
    tids = jnp.asarray(pad_term_ids(lex.query_term_ids(query))[None, :])

    # dense scan + BM25 + RRF fusion run as ONE sharded XLA program; candidates
    # merge across shards with all-gathers (ICI collectives on real hardware)
    scores, frame_ids = sharded_hybrid_topk(qv, tids, d_sh, l_sh, k=5, mesh=mesh)
    print("fused top-5 frame ids:", np.asarray(frame_ids)[0].tolist())

    # ---- two-level (multi-pod) topology: same program, hierarchical merges ----
    # Candidate all-gathers stay inside a slice (ICI); only the merged [B, k]
    # lists cross the slice axis (DCN). Results are bit-identical to the flat
    # mesh. In the high-level API this is OrchestratorConfig(sharded_lanes=True,
    # mesh_slices=2) — or WAX_TPU_MESH_SLICES=2 for the MCP server.
    from wax_tpu.parallel.mesh import make_two_level_mesh

    mesh2 = make_two_level_mesh(2, jax.device_count() // 2)
    d_sh2 = shard_dense_index(dsnap, mesh2)
    l_sh2 = shard_lex_index(lex, mesh2, n_rows_global=dsnap.capacity)
    s2, f2 = sharded_hybrid_topk(qv, tids, d_sh2, l_sh2, k=5, mesh=mesh2)
    assert np.array_equal(np.asarray(f2), np.asarray(frame_ids))
    print("two-level 2-slice mesh: identical top-5", np.asarray(f2)[0].tolist())


if __name__ == "__main__":
    main()
