"""Device-mesh helpers, including the two-level ICI × DCN topology.

The reference has no multi-device code at all (SURVEY.md §2.7 — one CPU + one Metal
GPU); scale on TPU comes from SPMD over a named `jax.sharding.Mesh`: the corpus axis
("data") shards the embedding matrix / postings / graph adjacency across chips, and the
model axis ("tp") shards the embedder's attention/MLP weights.

Topology (SURVEY §5): collectives ride ICI within a pod slice and DCN across slices.
A two-level mesh ("slice", "data"[, "tp"]) makes that explicit — corpus rows shard over
the slice × data product, full candidate all-gathers stay INSIDE a slice (ICI), and
only thin [B, k] merged lists cross the slice axis (DCN). `corpus_axes(mesh)` lets the
sharded kernels treat flat and two-level meshes uniformly; the hierarchical merge lives
in wax_tpu/parallel/merge.py.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_mesh",
    "make_two_level_mesh",
    "corpus_axes",
    "corpus_shards",
    "shard_rows",
    "replicate",
]

DATA_AXIS = "data"
MODEL_AXIS = "tp"
SLICE_AXIS = "slice"


def make_mesh(n_devices: int | None = None, tp: int = 1) -> Mesh:
    """2-D (data, tp) mesh over the first n_devices. tp must divide n_devices."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if n % tp:
        raise ValueError(f"tp={tp} does not divide device count {n}")
    arr = np.asarray(devs).reshape(n // tp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_mesh(n_devices: int | None = None) -> Mesh:
    """1-D corpus-sharding mesh."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def make_two_level_mesh(n_slices: int, per_slice: int | None = None, tp: int = 1) -> Mesh:
    """("slice", "data"[, "tp"]) mesh: `n_slices` pod slices of `per_slice` devices.

    Device order follows jax.devices(); consecutive devices form a slice, mirroring
    how multi-slice jax exposes hardware (ICI-connected chips are contiguous, DCN
    connects the groups). tp>1 additionally splits each slice's devices into
    (data, tp) for tensor-parallel embedder serving.
    """
    devs = jax.devices()
    if per_slice is None:
        if len(devs) % n_slices:
            raise ValueError(f"n_slices={n_slices} does not divide {len(devs)} devices")
        per_slice = len(devs) // n_slices
    need = n_slices * per_slice
    if need > len(devs):
        raise ValueError(f"need {need} devices, have {len(devs)}")
    if per_slice % tp:
        raise ValueError(f"tp={tp} does not divide per_slice={per_slice}")
    arr = np.asarray(devs[:need]).reshape(n_slices, per_slice // tp, tp)
    if tp == 1:
        return Mesh(arr[..., 0], (SLICE_AXIS, DATA_AXIS))
    return Mesh(arr, (SLICE_AXIS, DATA_AXIS, MODEL_AXIS))


def corpus_axes(mesh: Mesh) -> tuple[str, ...]:
    """Mesh axes the corpus (row) dimension is sharded over, innermost last."""
    if SLICE_AXIS in mesh.axis_names:
        return (SLICE_AXIS, DATA_AXIS)
    return (DATA_AXIS,)


def corpus_shards(mesh: Mesh) -> int:
    """Total number of corpus row shards on this mesh."""
    n = 1
    for ax in corpus_axes(mesh):
        n *= mesh.shape[ax]
    return n


def shard_rows(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Place an array with its leading (row) axis sharded over the corpus axes."""
    return jax.device_put(x, NamedSharding(mesh, P(corpus_axes(mesh))))


def replicate(mesh: Mesh, x) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))
