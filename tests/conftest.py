"""Test configuration: force CPU backend with 8 virtual devices.

This is the TPU framework's answer to multi-device testing without a pod slice
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`). It must run before jax
is imported anywhere, hence it lives at conftest import time.
"""
import os

# hard-set: the environment pre-sets JAX_PLATFORMS=axon (real TPU via tunnel);
# tests must run on the host CPU with 8 virtual devices
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon bootstrap (sitecustomize) registers the tunneled TPU and pins
# jax_platforms via jax.config, which outranks the env var — override through
# the config as well so tests genuinely run on the virtual-8-device CPU.
jax.config.update("jax_platforms", "cpu")

# SAME backend-suffixed dir as utils/profiling.py::enable_persistent_compilation_cache
# (the backend is pinned to cpu two lines up): tools and the test suite share
# one CPU cache instead of compiling identical programs twice on this 1-core
# host. The suffix keeps TPU remote-compile entries out (mixing warns/SIGABRTs
# after toolchain changes, see CLAUDE.md).
jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache_cpu")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
# JAX 0.9 defaults matmuls/convs to reduced precision even on CPU; parity tests
# against torch fp32 need exact fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
