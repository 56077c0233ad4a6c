"""Test harness setup.

Forces JAX onto a virtual 8-device CPU platform BEFORE jax initializes, so
sharding/pjit code paths are exercised hermetically (SURVEY §4: "Distributed
without a cluster"). Benchmarks (`bench.py`) and the driver's graft entry do
NOT import this and run on the real TPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins axon (TPU); tests are hermetic CPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize registers the "axon" TPU backend and pins
# jax_platforms programmatically, which overrides the env var — force CPU here
# so tests are hermetic and fast (8 virtual devices for sharding tests).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_checks", False)

# CI numerics tripwire (SURVEY §5 "race detection/sanitizers"): set
# JRR_DEBUG_NANS=1 to fail fast on any NaN produced inside jitted code.
if os.environ.get("JRR_DEBUG_NANS") == "1":
    jax.config.update("jax_debug_nans", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np

    return np.random.default_rng(0)
