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

# Persistent compilation cache: kernels compile once, reruns are fast.
# Repo-local so it survives /tmp cleanup between sessions (gitignored),
# host-keyed because foreign-host XLA:CPU AOT entries can SIGILL/SIGSEGV
# (utils/hostcache.py).
from unigeo_tpu.utils.hostcache import host_cache_dir  # noqa: E402

from unigeo_tpu.utils.warmcache import configure as _configure_cache  # noqa: E402

_CACHE_DIR = host_cache_dir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_configure_cache(_CACHE_DIR)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def shared_tiny_pipeline():
    """One tiny diffusion pipeline shared by every adapter test (params are
    shape-independent, so one init serves all clip lengths/sizes)."""
    from unigeo_tpu.models.depthcrafter.pipeline import tiny_pipeline

    return tiny_pipeline(height=64, width=64, num_frames=2)
