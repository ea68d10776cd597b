"""Device-mesh helpers.

The reference has no multi-device code at all (SURVEY.md §2.7 — one CPU + one Metal
GPU); scale on TPU comes from SPMD over a named `jax.sharding.Mesh`: the corpus axis
("data") shards the embedding matrix / postings / graph adjacency across chips, and the
model axis ("tp") shards the embedder's attention/MLP weights. Collectives ride ICI
within a slice (query all-gather, candidate top-k merge) per the north-star configs
(BASELINE.md: 10M x 768 on a v5e-8 mesh).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_mesh", "shard_rows", "replicate"]

DATA_AXIS = "data"
MODEL_AXIS = "tp"


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


def shard_rows(mesh: Mesh, x: jax.Array) -> jax.Array:
    """Place an array with its leading (row) axis sharded over the data axis."""
    return jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS)))


def replicate(mesh: Mesh, x) -> jax.Array:
    return jax.device_put(x, NamedSharding(mesh, P()))
