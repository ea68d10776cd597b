"""AOT-persisted lane executables (utils/aot_cache.py).

The cold-open trace killer: a fresh process deserializes compiled lane
executables (~12 ms) instead of re-tracing (~480 ms measured at 10K x 384).
These tests exercise the cache mechanics on CPU; the fresh-process win is
measured by scripts/profile_cold_open.py N REPS fresh.
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
import pytest

from wax_tpu.utils import aot_cache


@pytest.fixture(autouse=True)
def _clean_registry():
    aot_cache.clear_memory_registry()
    yield
    aot_cache.clear_memory_registry()


def _fn(a, b):
    return (a * 2 + b).sum(axis=-1)


class TestAotCall:
    def test_result_parity_and_persistence(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_AOT_DIR", str(tmp_path))
        a = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        b = jnp.asarray(np.ones((3, 4), np.float32))
        want = np.asarray(_fn(a, b))
        got = np.asarray(aot_cache.aot_call("t1", "s", _fn, a, b))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        files = list(tmp_path.glob("t1-*.aotx"))
        assert len(files) == 1
        # fresh registry (a "new process"): the persisted executable loads
        before = aot_cache.stats()["loads"]
        aot_cache.clear_memory_registry()
        got2 = np.asarray(aot_cache.aot_call("t1", "s", _fn, a, b))
        np.testing.assert_allclose(got2, want, rtol=1e-6)
        assert aot_cache.stats()["loads"] == before + 1

    def test_key_separates_shapes_and_static_sig(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_AOT_DIR", str(tmp_path))
        a = jnp.ones((2, 4), jnp.float32)
        b = jnp.ones((2, 4), jnp.float32)
        aot_cache.aot_call("t2", "k=1", _fn, a, b)
        aot_cache.aot_call("t2", "k=2", _fn, a, b)  # static sig differs
        aot_cache.aot_call("t2", "k=1", _fn, jnp.ones((3, 4), jnp.float32), b[:1] * 0 + 1)
        assert len(list(tmp_path.glob("t2-*.aotx"))) == 3

    def test_corrupted_file_rebuilds(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_AOT_DIR", str(tmp_path))
        a = jnp.ones((2, 2), jnp.float32)
        b = jnp.zeros((2, 2), jnp.float32)
        want = np.asarray(aot_cache.aot_call("t3", "s", _fn, a, b))
        f = next(tmp_path.glob("t3-*.aotx"))
        f.write_bytes(b"garbage not a pickle")
        aot_cache.clear_memory_registry()
        got = np.asarray(aot_cache.aot_call("t3", "s", _fn, a, b))
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # file was rebuilt (valid pickle again)
        import pickle

        pickle.loads(next(tmp_path.glob("t3-*.aotx")).read_bytes())

    def test_disable_env(self, tmp_path, monkeypatch):
        monkeypatch.setenv("WAX_TPU_AOT_DIR", str(tmp_path))
        monkeypatch.setenv("WAX_TPU_DISABLE_AOT", "1")
        a = jnp.ones((2, 2), jnp.float32)
        out = aot_cache.aot_call("t4", "s", _fn, a, a)
        assert out.shape == (2,)
        assert not list(tmp_path.glob("*.aotx"))

    def test_pytree_args(self, tmp_path, monkeypatch):
        # registered-dataclass pytrees (the real lane snapshots) work as args
        monkeypatch.setenv("WAX_TPU_AOT_DIR", str(tmp_path))
        from wax_tpu.index.dense import DenseIndexBuilder
        from wax_tpu.ops.flat_scan import flat_scan_topk

        b = DenseIndexBuilder(dim=16)
        rng = np.random.default_rng(0)
        b.add_batch(np.arange(64), rng.normal(size=(64, 16)).astype(np.float32))
        snap = b.snapshot()
        q = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
        want = flat_scan_topk(q, snap, 5)
        got = aot_cache.aot_call("t5", "k=5", lambda qq, s: flat_scan_topk(qq, s, 5), q, snap)
        for w, g in zip(want, got):
            assert (np.asarray(w) == np.asarray(g)).all()
        aot_cache.clear_memory_registry()
        got2 = aot_cache.aot_call("t5", "k=5", lambda qq, s: flat_scan_topk(qq, s, 5), q, snap)
        assert (np.asarray(got2[2]) == np.asarray(want[2])).all()
