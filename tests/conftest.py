"""Test config: run on a virtual 8-device CPU mesh (the JAX-native analog of
multi-node simulation — SURVEY §4).

Note: this environment's sitecustomize imports jax and pins the axon/TPU
platform before conftest runs, so the JAX_PLATFORMS env var alone is not
enough — we must also flip jax.config. XLA_FLAGS still works because the CPU
backend initializes lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f32 matmuls must be exact f32 in numerics tests.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: the suite is compile-dominated and shapes
# repeat across runs (cache keys hash the HLO, so staleness is not a risk).
from chemeleon_tpu.utils.compilation_cache import (  # noqa: E402
    enable_persistent_compilation_cache)

enable_persistent_compilation_cache(
    os.path.join(os.path.dirname(__file__), os.pardir, ".cache",
                 "jax_compilation_tests"),
    min_compile_time_secs=0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return devices[:8]
