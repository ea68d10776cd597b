"""Golden-embedding drift fixtures for the MiniLM encoder.

The analogue of the reference's Tests/WaxIntegrationTests/Fixtures/
minilm_baseline_embeddings.json: sentence embeddings pinned to committed fixtures so
any drift in the checkpoint loader, encoder architecture, pooling, tokenizer, or
numerics fails loudly.

Two tiers:
  * tiny-checkpoint golden (always runs): a committed 2-layer/64-d safetensors
    checkpoint (tests/fixtures/minilm_tiny_ckpt) run through the production loader +
    encoder + mean-pool + L2 — fully deterministic with zero egress.
  * real-weights golden (opt-in): when the all-MiniLM-L6-v2 checkpoint is present
    (scripts/fetch_minilm.py; WAX_TPU_MINILM_DIR), first run captures
    minilm_real_golden.json, later runs drift-check against it — mirroring the
    reference's WAX_TEST_MINILM=1 opt-in.
"""
import json
import os
from pathlib import Path

import numpy as np
import pytest

FIXTURES = Path(__file__).parent / "fixtures"
TINY_CKPT = FIXTURES / "minilm_tiny_ckpt"
GOLDEN = FIXTURES / "minilm_golden_embeddings.json"

SENTENCES = [
    "The quick brown fox jumps over the lazy dog.",
    "TPU kernels love large batched matmuls.",
    "número de teléfono: +34 612 345 678",
    "a",
    "",
    "Mixed CASE and punctuation!!! 123",
]


def _tiny_embed(sentences):
    import jax.numpy as jnp

    from wax_tpu.embed.minilm import MiniLMConfig, MiniLMEncoder, load_hf_checkpoint, mean_pool
    from wax_tpu.text.wordpiece import WordPieceTokenizer

    cfg = MiniLMConfig(
        vocab_size=500, hidden=64, layers=2, heads=4, intermediate=128, max_positions=64
    )
    params = load_hf_checkpoint(TINY_CKPT, cfg)
    model = MiniLMEncoder(cfg, dtype=jnp.float32)
    tok = WordPieceTokenizer(vocab_size=500)
    ids, mask = tok.encode_batch(sentences, 32)
    hidden = model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    emb = np.asarray(mean_pool(hidden, jnp.asarray(mask)))
    return emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)


class TestTinyGolden:
    def test_embeddings_match_committed_golden(self):
        golden = json.loads(GOLDEN.read_text())
        assert golden["sentences"] == SENTENCES, "fixture sentences changed — regenerate"
        got = _tiny_embed(SENTENCES)
        want = np.asarray(golden["embeddings"], np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    def test_batch_invariance(self):
        # per-sentence embedding must not depend on batch composition
        full = _tiny_embed(SENTENCES)
        solo = np.concatenate([_tiny_embed([s]) for s in SENTENCES])
        np.testing.assert_allclose(full, solo, rtol=1e-4, atol=1e-5)


REAL_DIR = os.environ.get(
    "WAX_TPU_MINILM_DIR", str(Path.home() / ".wax-tpu" / "models" / "all-MiniLM-L6-v2")
)
REAL_GOLDEN = FIXTURES / "minilm_real_golden.json"


@pytest.mark.skipif(
    not (Path(REAL_DIR) / "model.safetensors").exists()
    and not (Path(REAL_DIR) / "pytorch_model.bin").exists(),
    reason="real MiniLM checkpoint not present (scripts/fetch_minilm.py)",
)
class TestRealGolden:
    def test_real_weights_drift(self):
        from wax_tpu.embed.minilm import MiniLMEmbedder

        import jax.numpy as jnp

        emb = MiniLMEmbedder(checkpoint_dir=REAL_DIR, dtype=jnp.float32)
        got = emb.embed_batch(SENTENCES)
        if not REAL_GOLDEN.exists():
            REAL_GOLDEN.write_text(
                json.dumps(
                    {
                        "sentences": SENTENCES,
                        "embeddings": [[float(f"{x:.8e}") for x in r] for r in got],
                    }
                )
            )
            pytest.skip("captured real-weights golden fixture (first run)")
        want = np.asarray(json.loads(REAL_GOLDEN.read_text())["embeddings"], np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
