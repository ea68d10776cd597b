"""Numerical parity of the flax MiniLM encoder against torch BERT on shared weights.

Instantiates a small random-init HuggingFace BertModel (offline — from config, no
download), exports its state dict through our checkpoint loader, and compares token
hidden states — this pins the checkpoint-loader layout (kernel transposes, LN wiring)
and the architecture itself. The analogue of the reference's golden-embedding drift
fixture for the real model.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    import jax.numpy as jnp

    from wax_tpu.embed.minilm import MiniLMConfig, MiniLMEncoder, load_hf_checkpoint

    hf_cfg = transformers.BertConfig(
        vocab_size=500,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
        type_vocab_size=2,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf_model = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()

    ckpt_dir = tmp_path_factory.mktemp("ckpt")
    torch.save(hf_model.state_dict(), ckpt_dir / "pytorch_model.bin")

    cfg = MiniLMConfig(
        vocab_size=500, hidden=64, layers=2, heads=4, intermediate=128, max_positions=64
    )
    params = load_hf_checkpoint(ckpt_dir, cfg)
    model = MiniLMEncoder(cfg, dtype=jnp.float32)
    return hf_model, model, params


def test_hidden_states_match(pair):
    import jax.numpy as jnp

    hf_model, model, params = pair
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 500, (3, 16)).astype(np.int64)
    mask = np.ones_like(ids)
    mask[0, 12:] = 0
    ids[0, 12:] = 0

    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)))
    # compare only unmasked positions (masked positions diverge by construction)
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], ref[m], atol=2e-4, rtol=2e-3)


def test_mean_pool_matches_sentence_transformers_recipe(pair):
    import jax.numpy as jnp

    from wax_tpu.embed.minilm import mean_pool

    hf_model, model, params = pair
    ids = np.array([[5, 17, 240, 3, 0, 0]], dtype=np.int64)
    mask = np.array([[1, 1, 1, 1, 0, 0]], dtype=np.int64)
    with torch.no_grad():
        hidden = hf_model(torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state
        summed = (hidden * torch.tensor(mask)[..., None]).sum(1)
        ref = summed / torch.tensor(mask).sum(1, keepdim=True)
        ref = torch.nn.functional.normalize(ref, dim=-1).numpy()
    ours = np.asarray(
        mean_pool(model.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask)), jnp.asarray(mask))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)
