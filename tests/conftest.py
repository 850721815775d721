"""Test configuration: force a virtual 8-device CPU platform.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``) so the suite runs anywhere; the
real-TPU path is exercised by bench.py / the driver.
"""

import os

# The driver environment routes jax to the real-TPU tunnel ("axon") via a
# sitecustomize hook that force-registers the backend and ignores the
# JAX_PLATFORMS env var — every test compile would go through the remote
# chip (~10-100x slower). The jax *config* override below still wins, as
# long as it runs before the first backend initialization.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Conservative CPU codegen: this container is a firecracker VM that can
# MIGRATE between physical hosts mid-session; XLA:CPU's LLVM JIT emitting
# host-feature-specific AVX512/AMX code has segfaulted full-suite runs
# three different ways (loading foreign cache entries, writing entries,
# and plain backend_compile_and_load with the cache disabled). Capping the
# ISA at AVX2 keeps every generated kernel valid on any plausible host.
if "xla_cpu_max_isa" not in _flags:
    _flags = (_flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not run on the TPU tunnel"
assert len(jax.devices()) == 8, "8-device virtual CPU mesh required for sharding tests"

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: DISABLED for the suite. XLA:CPU's AOT
# executable serialization is not stable in this environment in either
# direction — loading a result compiled on a different host crashes
# (SIGILL at exit in round 3, SIGSEGV inside backend_compile_and_load
# mid-run in round 4, both with the "machine type ... could lead to
# SIGILL" cpu_aot_loader error: LLVM derives tuning features like
# +prefer-no-gather from the CPU *model*, so no /proc/cpuinfo-derived
# cache key can safely partition migrating containers), and even a
# fresh same-host cache segfaulted mid-run WRITING an entry
# (put_executable_and_time -> serialize). Correctness beats the compile
# savings: every pytest run compiles cold. (The TPU path is unaffected —
# bench/selftest runs use the backend's own remote compile cache.)
if jax.config.jax_compilation_cache_dir:
    jax.config.update("jax_compilation_cache_dir", None)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
