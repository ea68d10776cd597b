"""Mesh-sharded paths on the 8-virtual-device CPU mesh: distributed scan parity with the
single-chip oracle, and one sharded contrastive train step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.index.dense import DenseIndexBuilder
from wax_tpu.ops.flat_scan import flat_scan_topk, normalize_rows
from wax_tpu.parallel.mesh import data_mesh, make_mesh
from wax_tpu.parallel.sharded_scan import shard_dense_index, sharded_flat_scan_topk


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(1)
    b = DenseIndexBuilder(dim=64)
    vecs = rng.standard_normal((4096, 64)).astype(np.float32)
    b.add_batch(np.arange(4096), vecs)
    return b


class TestShardedScan:
    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_matches_single_chip(self, corpus, n_dev):
        mesh = data_mesh(n_dev)
        idx = corpus.snapshot()
        sharded = shard_dense_index(idx, mesh)
        rng = np.random.default_rng(2)
        q = normalize_rows(jnp.asarray(rng.standard_normal((16, 64)).astype(np.float32)))
        v_ref, _, f_ref = flat_scan_topk(q, idx, 10, backend="xla")
        v_sh, f_sh = sharded_flat_scan_topk(q, sharded, 10, mesh)
        np.testing.assert_allclose(np.asarray(v_ref), np.asarray(v_sh), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_sh))

    def test_tombstones_masked(self, corpus):
        mesh = data_mesh(4)
        corpus.remove(5)
        corpus.remove(4000)
        idx = corpus.snapshot()
        sharded = shard_dense_index(idx, mesh)
        q = normalize_rows(jnp.asarray(np.random.default_rng(3).standard_normal((4, 64)).astype(np.float32)))
        _, f_sh = sharded_flat_scan_topk(q, sharded, 20, mesh)
        got = set(np.asarray(f_sh).ravel().tolist())
        assert 5 not in got and 4000 not in got


class TestTrainStep:
    def test_one_step_runs_and_improves(self):
        from wax_tpu.embed.minilm import MiniLMConfig, MiniLMEncoder
        from wax_tpu.parallel.train import Trainer
        from wax_tpu.text.wordpiece import WordPieceTokenizer

        mesh = make_mesh(8, tp=2)
        cfg = MiniLMConfig(hidden=64, layers=2, heads=4, intermediate=128, vocab_size=1000, max_positions=64)
        model = MiniLMEncoder(cfg, dtype=jnp.float32)
        tok = WordPieceTokenizer(vocab_size=1000, max_len=32)
        ids = jnp.zeros((1, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"]

        texts = [f"document number {i} about topic {i % 4}" for i in range(16)]
        q_ids, q_mask = tok.encode_batch([f"topic {i % 4} question {i}" for i in range(16)], 32)
        d_ids, d_mask = tok.encode_batch(texts, 32)
        # pad both to same L for the dict batch
        L = max(q_ids.shape[1], d_ids.shape[1])
        pad = lambda a: np.pad(a, ((0, 0), (0, L - a.shape[1])))
        batch = {"q_ids": pad(q_ids), "q_mask": pad(q_mask), "d_ids": pad(d_ids), "d_mask": pad(d_mask)}

        trainer = Trainer(model, mesh, learning_rate=1e-3)
        state = trainer.init_state(params)
        losses = []
        for _ in range(3):
            state, loss = trainer.step(state, batch)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # optimizing the same batch must reduce loss
        assert int(state.step) == 3

    def test_checkpoint_resume_bitwise(self, tmp_path):
        """Save at step k, keep training; a resumed run from the checkpoint must
        reproduce the same losses (checkpoint/resume determinism), including across
        a different mesh shape."""
        from wax_tpu.embed.minilm import MiniLMConfig, MiniLMEncoder
        from wax_tpu.parallel.train import Trainer
        from wax_tpu.text.wordpiece import WordPieceTokenizer

        cfg = MiniLMConfig(hidden=64, layers=2, heads=4, intermediate=128, vocab_size=500, max_positions=64)
        model = MiniLMEncoder(cfg, dtype=jnp.float32)
        tok = WordPieceTokenizer(vocab_size=500, max_len=16)
        ids = jnp.zeros((1, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(1), ids, jnp.ones_like(ids))["params"]
        q_ids, q_mask = tok.encode_batch([f"q {i}" for i in range(8)], 16)
        d_ids, d_mask = tok.encode_batch([f"doc body {i}" for i in range(8)], 16)
        L = max(q_ids.shape[1], d_ids.shape[1])
        pad = lambda a: np.pad(a, ((0, 0), (0, L - a.shape[1])))
        batch = {"q_ids": pad(q_ids), "q_mask": pad(q_mask), "d_ids": pad(d_ids), "d_mask": pad(d_mask)}

        t1 = Trainer(model, make_mesh(8, tp=2), learning_rate=1e-3)
        state = t1.init_state(params)
        state, _ = t1.step(state, batch)
        t1.save_checkpoint(state, tmp_path / "ck.npz")
        cont_losses = []
        for _ in range(2):
            state, loss = t1.step(state, batch)
            cont_losses.append(float(loss))

        # resume on a DIFFERENT mesh shape (4 devices, tp=1)
        t2 = Trainer(model, make_mesh(4, tp=1), learning_rate=1e-3)
        template = t2.init_state(params)
        restored = t2.load_checkpoint(template, tmp_path / "ck.npz")
        assert int(restored.step) == 1
        resumed_losses = []
        for _ in range(2):
            restored, loss = t2.step(restored, batch)
            resumed_losses.append(float(loss))
        np.testing.assert_allclose(resumed_losses, cont_losses, rtol=1e-5)
