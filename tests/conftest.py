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

# persistent compilation cache makes repeated test runs compile-free.
# The dir is keyed by a host-CPU fingerprint: serialized XLA:CPU executables
# are machine-specific, and this environment's VMs migrate between machine
# types — reloading an executable cached on a different host SIGILLs/aborts
# inside deserialize (observed as fatal crashes in compilation_cache.py).
# The flags line alone is NOT enough: two hosts with identical cpuinfo flags
# produced executables differing in LLVM *tuning* features derived from the
# CPU model (+prefer-no-scatter/+prefer-no-gather), which still abort on
# load — so hash the model/stepping/microcode lines too.
import hashlib

try:
    with open("/proc/cpuinfo") as _f:
        _id_lines = sorted({l.strip() for l in _f if l.startswith(
            ("flags", "model", "stepping", "microcode", "cpu family", "vendor_id"))})
        _ident = "\n".join(_id_lines)
except OSError:
    _ident = ""
_fp = hashlib.md5(_ident.encode()).hexdigest()[:8]
# DEFAULT OFF: on some VMs the persistent XLA:CPU cache is unreliable —
# observed fatal crashes in BOTH directions (deserialize abort on entries
# whose LLVM tuning features (+prefer-no-scatter/+prefer-no-gather) fail
# the loader's host check, and a segfault inside put_executable_and_time
# while serializing a fresh entry mid-suite). Opt back in on a machine
# where it is known-good with F5E_TEST_CACHE=1 (cuts warm reruns to ~1/3).
if os.environ.get("F5E_TEST_CACHE", "0") == "1":
    jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_test_cache_{_fp}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
