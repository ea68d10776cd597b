"""Contrastive training of the bundled embedder, sharded over a (data, tp) mesh.

The reference ships a frozen CoreML model and never trains (SURVEY.md §2.4); a
TPU-native framework for production retrieval must be able to *fit* its embedder to the
corpus. This module provides a symmetric InfoNCE dual-encoder objective (query/doc
positive pairs, in-batch negatives — the standard sentence-transformers recipe MiniLM
itself was distilled with) and a sharded AdamW train step:

  * batch axis sharded over "data" (dp) — XLA inserts the gradient all-reduce;
  * attention/MLP weights sharded over "tp" per wax_tpu/embed/minilm.param_partition_spec;
  * the optimizer state inherits the param shardings through GSPMD propagation
    (we only place params and batch explicitly; jit infers the rest).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from wax_tpu.embed.minilm import MiniLMEncoder, mean_pool, param_partition_spec
from wax_tpu.parallel.mesh import corpus_axes

__all__ = ["TrainState", "Trainer", "contrastive_loss"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def contrastive_loss(params, model: MiniLMEncoder, batch, temperature: float = 0.05):
    """Symmetric InfoNCE over in-batch negatives (global batch across the mesh)."""
    q = mean_pool(model.apply({"params": params}, batch["q_ids"], batch["q_mask"]), batch["q_mask"])
    d = mean_pool(model.apply({"params": params}, batch["d_ids"], batch["d_mask"]), batch["d_mask"])
    logits = (q @ d.T) / temperature
    labels = jnp.arange(logits.shape[0])
    l_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    l_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return 0.5 * (l_qd.mean() + l_dq.mean())


class Trainer:
    """Mesh-sharded contrastive trainer for the MiniLM encoder."""

    def __init__(
        self,
        model: MiniLMEncoder,
        mesh: Mesh,
        learning_rate: float = 2e-5,
        temperature: float = 0.05,
    ):
        self.model = model
        self.mesh = mesh
        self.temperature = temperature
        self.tx = optax.adamw(learning_rate, weight_decay=0.01)
        self._step = jax.jit(self._step_impl, donate_argnums=(0,))

    def init_state(self, params) -> TrainState:
        """Place params per the tp partition spec and build optimizer state."""
        specs = param_partition_spec(params)
        # copy before placing: device_put can alias the caller's buffers (e.g. the
        # device-0 shard of a replicated leaf), and the donating train step would
        # then delete the caller's params out from under them
        placed = jax.tree_util.tree_map(
            lambda x, s: jax.device_put(jnp.array(x, copy=True), NamedSharding(self.mesh, s)),
            params,
            specs,
        )
        opt_state = jax.jit(self.tx.init)(placed)
        # normalize stragglers: param-shaped moments inherit param shardings through
        # GSPMD, but constant leaves (e.g. the adam step count) come out committed to
        # one device — replicate them over the mesh so every state leaf shares one
        # device set (mixed sets fail jit dispatch on sub-meshes)
        devset = set(self.mesh.devices.flat)
        replicated = NamedSharding(self.mesh, P())

        def _normalize(x):
            if isinstance(x, jax.Array) and set(x.sharding.device_set) != devset:
                return jax.device_put(x, replicated)
            return x

        opt_state = jax.tree_util.tree_map(_normalize, opt_state)
        step = jax.device_put(jnp.zeros((), jnp.int32), replicated)
        return TrainState(placed, opt_state, step)

    def shard_batch(self, batch: dict) -> dict:
        # dp over every corpus axis: (slice, data) on a two-level mesh
        sh = NamedSharding(self.mesh, P(corpus_axes(self.mesh), None))
        return {k: jax.device_put(jnp.asarray(v), sh) for k, v in batch.items()}

    def _step_impl(self, state: TrainState, batch):
        loss, grads = jax.value_and_grad(contrastive_loss)(
            state.params, self.model, batch, self.temperature
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    def step(self, state: TrainState, batch: dict):
        """One sharded training step; batch leaves are [B_global, L] host arrays."""
        return self._step(state, self.shard_batch(batch))

    # -------------------------------------------------------------- checkpointing ----
    def save_checkpoint(self, state: TrainState, path) -> None:
        """Durable checkpoint: params + optimizer state + step as one npz.

        Leaves are fetched to host and stored flat under tree-path keys; restore
        re-places them with the current mesh/partition specs, so a checkpoint written
        on one mesh shape resumes on another (the GSPMD way — layout is a property of
        the run, not of the checkpoint). Write is atomic (tmp + rename)."""
        import os

        import numpy as np

        flat, treedef = jax.tree_util.tree_flatten(state)
        arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
        tmp = str(path) + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **arrays)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def load_checkpoint(self, template: TrainState, path) -> TrainState:
        """Restore into the placement of `template` (from init_state on this mesh)."""
        import numpy as np

        flat_t, treedef = jax.tree_util.tree_flatten(template)
        with np.load(path) as data:
            flat = [data[f"leaf_{i}"] for i in range(len(flat_t))]
        placed = [
            jax.device_put(jnp.asarray(x), t.sharding) if hasattr(t, "sharding") else jnp.asarray(x)
            for x, t in zip(flat, flat_t)
        ]
        return jax.tree_util.tree_unflatten(treedef, placed)
