"""Embedders: determinism, normalization, batching, MiniLM encoder shape/pooling."""
import numpy as np
import pytest

from wax_tpu.embed.hash_embedder import HashEmbedder
from wax_tpu.embed.provider import ExecutionMode, validate_on_device
from wax_tpu.text.wordpiece import WordPieceTokenizer


class TestHashEmbedder:
    def test_deterministic(self):
        e1, e2 = HashEmbedder(64), HashEmbedder(64)
        a, b = e1.embed("hello world"), e2.embed("hello world")
        np.testing.assert_array_equal(a, b)

    def test_normalized(self):
        v = HashEmbedder(128).embed("some text")
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)

    def test_related_texts_closer(self):
        e = HashEmbedder(256)
        a = e.embed("the fox jumped over the fence")
        b = e.embed("a fox leaped over a fence")
        c = e.embed("quantum chromodynamics lattice simulation")
        assert float(a @ b) > float(a @ c)

    def test_batch_matches_single(self):
        e = HashEmbedder(64)
        batch = e.embed_batch(["alpha", "beta"])
        np.testing.assert_array_equal(batch[0], e.embed("alpha"))
        np.testing.assert_array_equal(batch[1], e.embed("beta"))

    def test_on_device_validation(self):
        e = HashEmbedder(16)
        validate_on_device(e, require_on_device=True)  # should not raise

        class NetworkEmbedder(HashEmbedder):
            @property
            def execution_mode(self):
                return ExecutionMode.MAY_USE_NETWORK

        with pytest.raises(ValueError):
            validate_on_device(NetworkEmbedder(16), require_on_device=True)


class TestWordPiece:
    def test_deterministic_ids(self):
        t = WordPieceTokenizer()
        assert t.encode("hello world") == t.encode("hello world")

    def test_cls_sep_framing(self):
        t = WordPieceTokenizer()
        ids = t.encode("hi")
        assert ids[0] == 101 and ids[-1] == 102

    def test_batch_padding_and_mask(self):
        t = WordPieceTokenizer()
        ids, mask = t.encode_batch(["short", "a much longer sentence with many words inside"])
        assert ids.shape == mask.shape
        assert mask[0].sum() < mask[1].sum()
        assert (ids[0][mask[0] == 0] == 0).all()

    def test_adaptive_bucket(self):
        t = WordPieceTokenizer()
        ids, _ = t.encode_batch(["one two"])
        assert ids.shape[1] == 16  # smallest bucket


class TestMiniLM:
    @pytest.fixture(scope="class")
    def embedder(self):
        import jax.numpy as jnp
        from wax_tpu.embed.minilm import MiniLMEmbedder

        # f32 on CPU for numerical sanity; bf16 is the TPU default
        return MiniLMEmbedder(dtype=jnp.float32)

    def test_output_shape_and_norm(self, embedder):
        out = embedder.embed_batch(["hello there", "general kenobi"])
        assert out.shape == (2, 384)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-4)

    def test_deterministic(self, embedder):
        a = embedder.embed("stable text")
        b = embedder.embed("stable text")
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_padding_invariance(self, embedder):
        """Mean pooling must ignore pad positions: same text alone vs in a batch with
        a longer neighbor (different padded length) gives the same embedding."""
        alone = embedder.embed_batch(["a short sentence"])[0]
        padded = embedder.embed_batch(
            ["a short sentence", " ".join(["filler"] * 60)]
        )[0]
        np.testing.assert_allclose(alone, padded, atol=2e-3)

    def test_tp_partition_spec_shapes(self, embedder):
        from jax.sharding import PartitionSpec as P
        from wax_tpu.embed.minilm import param_partition_spec

        specs = param_partition_spec(embedder.params)
        q = specs["layer_0"]["attention"]["query"]["kernel"]
        o = specs["layer_0"]["attention"]["out"]["kernel"]
        assert q == P(None, "tp") and o == P("tp", None)
