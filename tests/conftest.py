"""Test harness: force an 8-device virtual CPU platform before JAX init.

This is the TPU analog of a fake multi-node backend (SURVEY.md §4): sharding
and collective code paths compile and execute on 8 virtual CPU devices, while
numerics tests run on the same platform deterministically.
"""

import os

# The axon sitecustomize force-registers the tunneled-TPU backend and
# overrides JAX_PLATFORMS, so the env var alone is not enough: set the
# platform through jax.config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: metrics kernels compile once per machine,
# not once per pytest invocation.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pytest_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
