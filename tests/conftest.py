"""Test configuration: force an 8-virtual-device CPU platform.

Real TPU hardware (one chip via the axon tunnel) is reserved for bench.py; tests run
on CPU with 8 virtual devices so mesh-sharded code paths are exercised without chips.
The axon sitecustomize force-selects the TPU platform, so we must both set XLA_FLAGS
before the CPU client initializes and override jax_platforms after import.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import tempfile as _tempfile

# isolate the AOT executable cache (utils/aot_cache.py) from the user's real
# ~/.wax-tpu/aot: tests build many one-off shapes
if "WAX_TPU_AOT_DIR" not in os.environ:
    os.environ["WAX_TPU_AOT_DIR"] = _tempfile.mkdtemp(prefix="wax-aot-tests-")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
    yield


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
