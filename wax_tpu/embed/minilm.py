"""MiniLM-architecture sentence encoder in Flax — the bundled neural embedder.

TPU-native counterpart of the reference's CoreML all-MiniLM-L6-v2 pipeline (reference:
Sources/WaxVectorSearchMiniLM/MiniLMEmbedder.swift:15-128 and
CoreML/MiniLMEmbeddings.swift:7-243 — tokenize -> 512-token inputs -> 6-layer BERT ->
mean-pool -> L2 normalize, batch 256). Here the encoder is a standard 6-layer/384-hidden
BERT in flax.linen, jitted with bf16 matmuls on the MXU; weights load from a HuggingFace
sentence-transformers checkpoint directory when available, otherwise deterministic
random init (the architecture, batching, sharding and training path are exercised
either way — the framework contract is the EmbeddingProvider interface, SURVEY.md §2.4).

Tensor-parallel sharding: `param_partition_spec` annotates attention/MLP weights over a
named "tp" mesh axis (heads/intermediate sharded, residual stream replicated) — used by
the multi-chip training/dryrun path (wax_tpu/parallel/).
"""
from __future__ import annotations

import functools
import os
from pathlib import Path
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from wax_tpu.embed.provider import ExecutionMode
from wax_tpu.text.wordpiece import WordPieceTokenizer

__all__ = ["MiniLMConfig", "MiniLMEncoder", "MiniLMEmbedder", "mean_pool"]


class MiniLMConfig:
    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    intermediate: int = 1536
    max_positions: int = 512
    type_vocab: int = 2
    layer_norm_eps: float = 1e-12

    def __init__(self, **kw):
        for k, v in kw.items():
            if not hasattr(type(self), k):
                raise TypeError(f"unknown config field {k}")
            setattr(self, k, v)


class _SelfAttention(nn.Module):
    cfg: MiniLMConfig
    dtype: Any

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        head_dim = cfg.hidden // cfg.heads
        dense = functools.partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32)
        q = dense(cfg.hidden, name="query")(x)
        k = dense(cfg.hidden, name="key")(x)
        v = dense(cfg.hidden, name="value")(x)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], cfg.heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim).astype(self.dtype)
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9).astype(scores.dtype)
        probs = jax.nn.softmax(scores + bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        ctx = ctx.reshape(ctx.shape[0], ctx.shape[1], cfg.hidden)
        return dense(cfg.hidden, name="out")(ctx)


class _Layer(nn.Module):
    cfg: MiniLMConfig
    dtype: Any

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        ln = functools.partial(nn.LayerNorm, epsilon=cfg.layer_norm_eps, dtype=self.dtype)
        attn = _SelfAttention(cfg, self.dtype, name="attention")(x, mask)
        x = ln(name="attention_ln")(x + attn)
        dense = functools.partial(nn.Dense, dtype=self.dtype, param_dtype=jnp.float32)
        h = dense(cfg.intermediate, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = dense(cfg.hidden, name="output")(h)
        return ln(name="output_ln")(x + h)


class MiniLMEncoder(nn.Module):
    """6-layer BERT encoder returning token-level hidden states."""

    cfg: MiniLMConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, ids, mask):
        cfg = self.cfg
        pos = jnp.arange(ids.shape[1])[None, :]
        emb = nn.Embed(cfg.vocab_size, cfg.hidden, name="tok_emb", param_dtype=jnp.float32)(ids)
        emb = emb + nn.Embed(cfg.max_positions, cfg.hidden, name="pos_emb", param_dtype=jnp.float32)(pos)
        emb = emb + nn.Embed(cfg.type_vocab, cfg.hidden, name="type_emb", param_dtype=jnp.float32)(
            jnp.zeros_like(ids)
        )
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="emb_ln")(
            emb.astype(self.dtype)
        )
        for i in range(cfg.layers):
            x = _Layer(cfg, self.dtype, name=f"layer_{i}")(x, mask)
        return x


def mean_pool(hidden, mask):
    """Mask-weighted mean pooling + L2 normalize (CoreML pipeline parity,
    MiniLMEmbeddings.swift — mean-pooled sentence embedding)."""
    m = mask[..., None].astype(hidden.dtype)
    summed = jnp.sum(hidden * m, axis=1)
    counts = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    pooled = (summed / counts).astype(jnp.float32)
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)


def param_partition_spec(params) -> Any:
    """PartitionSpec tree for tensor parallelism over a "tp" mesh axis.

    Attention q/k/v and MLP intermediate shard their output features; attention out
    and MLP output shard their input features; embeddings/layernorms replicate.
    """
    from jax.sharding import PartitionSpec as P

    def spec(path: tuple[str, ...], leaf) -> Any:
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(names)
        if leaf.ndim == 2:
            if any(s in joined for s in ("query", "key", "value", "intermediate")):
                return P(None, "tp")
            if joined.endswith("out/kernel") or "output/kernel" in joined:
                return P("tp", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


class MiniLMEmbedder:
    """EmbeddingProvider over the jitted encoder (batch-first, TPU-resident params)."""

    def __init__(
        self,
        checkpoint_dir: str | Path | None = None,
        vocab_path: str | Path | None = None,
        dtype=jnp.bfloat16,
        batch_size: int = 256,
        seed: int = 0,
    ):
        self.cfg = MiniLMConfig()
        self.model = MiniLMEncoder(self.cfg, dtype=dtype)
        if checkpoint_dir is None:
            # env override, then the scripts/fetch_minilm.py default location
            env = os.environ.get("WAX_TPU_MINILM_DIR")
            default = Path.home() / ".wax-tpu" / "models" / "all-MiniLM-L6-v2"
            if env and Path(env).exists():
                checkpoint_dir = env
            elif default.exists():
                checkpoint_dir = default
        if vocab_path is None and checkpoint_dir and (Path(checkpoint_dir) / "vocab.txt").exists():
            vocab_path = Path(checkpoint_dir) / "vocab.txt"
        self.tokenizer = WordPieceTokenizer(vocab_path, vocab_size=self.cfg.vocab_size)
        self._batch_size = batch_size
        self._loaded_from = None
        self._weights_tag = f"random-init-seed{seed}"
        if checkpoint_dir and Path(checkpoint_dir).exists():
            self.params = load_hf_checkpoint(Path(checkpoint_dir), self.cfg)
            self._loaded_from = str(checkpoint_dir)
            self._weights_tag = _weights_fingerprint(Path(checkpoint_dir))
        else:
            ids = jnp.zeros((1, 8), jnp.int32)
            self.params = self.model.init(jax.random.PRNGKey(seed), ids, jnp.ones_like(ids))[
                "params"
            ]
        self._forward = jax.jit(self._apply)

    def _apply(self, params, ids, mask):
        hidden = self.model.apply({"params": params}, ids, mask)
        return mean_pool(hidden, mask)

    # -- provider protocol -------------------------------------------------------------
    @property
    def dimensions(self) -> int:
        return self.cfg.hidden

    @property
    def identity(self) -> str:
        """Content-stable identity: a fingerprint of the WEIGHTS (not the checkpoint
        path — moving the directory must not trip the store's embedder-mismatch
        guard) plus a tokenizer-normalization version ('t2' = the round-3 HF-BERT
        accent/control normalization; bumping it correctly invalidates stores whose
        vectors were embedded under the old tokenization)."""
        return f"minilm-l6-jax-t2/{self._weights_tag}"

    @property
    def normalized(self) -> bool:
        return True

    @property
    def execution_mode(self) -> str:
        return ExecutionMode.ON_DEVICE_ONLY

    @property
    def batch_size(self) -> int:
        return self._batch_size

    def embed(self, text: str) -> np.ndarray:
        return self.embed_batch([text])[0]

    def embed_batch(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.cfg.hidden), np.float32)
        out = []
        for i in range(0, len(texts), self._batch_size):
            chunk = list(texts[i : i + self._batch_size])
            ids, mask = self.tokenizer.encode_batch(chunk)
            out.append(np.asarray(self._forward(self.params, jnp.asarray(ids), jnp.asarray(mask))))
        return np.concatenate(out, axis=0)


def _weights_fingerprint(path: Path) -> str:
    """Cheap content fingerprint of a checkpoint dir: sha256 over (name, size,
    first 1 MiB) of each weight file. Stable across moves/copies; changes when the
    weights themselves change."""
    import hashlib

    h = hashlib.sha256()
    for name in ("model.safetensors", "pytorch_model.bin"):
        f = path / name
        if f.exists():
            h.update(name.encode())
            h.update(str(f.stat().st_size).encode())
            with open(f, "rb") as fh:
                h.update(fh.read(1 << 20))
    return h.hexdigest()[:16]


def load_hf_checkpoint(path: Path, cfg: MiniLMConfig):
    """Load a HuggingFace sentence-transformers MiniLM checkpoint into our layout.

    Supports safetensors or pytorch_model.bin (torch is CPU-only in this image and used
    purely as a file reader).
    """
    state: dict[str, np.ndarray] = {}
    st = path / "model.safetensors"
    pt = path / "pytorch_model.bin"
    if st.exists():
        from safetensors.numpy import load_file

        state = load_file(str(st))
    elif pt.exists():
        import torch

        raw = torch.load(str(pt), map_location="cpu", weights_only=True)
        state = {k: v.numpy() for k, v in raw.items()}
    else:
        raise FileNotFoundError(f"no checkpoint found under {path}")

    def g(name):
        return np.asarray(state[name])

    p: dict[str, Any] = {
        "tok_emb": {"embedding": g("embeddings.word_embeddings.weight")},
        "pos_emb": {"embedding": g("embeddings.position_embeddings.weight")},
        "type_emb": {"embedding": g("embeddings.token_type_embeddings.weight")},
        "emb_ln": {"scale": g("embeddings.LayerNorm.weight"), "bias": g("embeddings.LayerNorm.bias")},
    }
    for i in range(cfg.layers):
        pre = f"encoder.layer.{i}."
        p[f"layer_{i}"] = {
            "attention": {
                "query": {
                    "kernel": g(pre + "attention.self.query.weight").T,
                    "bias": g(pre + "attention.self.query.bias"),
                },
                "key": {
                    "kernel": g(pre + "attention.self.key.weight").T,
                    "bias": g(pre + "attention.self.key.bias"),
                },
                "value": {
                    "kernel": g(pre + "attention.self.value.weight").T,
                    "bias": g(pre + "attention.self.value.bias"),
                },
                "out": {
                    "kernel": g(pre + "attention.output.dense.weight").T,
                    "bias": g(pre + "attention.output.dense.bias"),
                },
            },
            "attention_ln": {
                "scale": g(pre + "attention.output.LayerNorm.weight"),
                "bias": g(pre + "attention.output.LayerNorm.bias"),
            },
            "intermediate": {
                "kernel": g(pre + "intermediate.dense.weight").T,
                "bias": g(pre + "intermediate.dense.bias"),
            },
            "output": {
                "kernel": g(pre + "output.dense.weight").T,
                "bias": g(pre + "output.dense.bias"),
            },
            "output_ln": {
                "scale": g(pre + "output.LayerNorm.weight"),
                "bias": g(pre + "output.LayerNorm.bias"),
            },
        }
    return jax.tree_util.tree_map(jnp.asarray, p)
