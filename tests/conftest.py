"""Test env: force JAX onto CPU with 8 virtual devices BEFORE jax initializes.

This simulates an 8-chip TPU slice for sharding tests (the reference never
fakes multi-device — see SURVEY.md §4.7 — we do better here).
"""

import os

# NOTE: in this environment the axon TPU plugin overrides the JAX_PLATFORMS
# env var — only the config API reliably selects the CPU backend.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache makes repeated test runs compile-free
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
