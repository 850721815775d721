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
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not run on the TPU tunnel"
assert len(jax.devices()) == 8, "8-device virtual CPU mesh required for sharding tests"

jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the suite is compile-bound on CPU, so cache
# executables across pytest runs. The cache dir is keyed by the HOST CPU:
# the container migrates between machines, and XLA:CPU AOT results compiled
# on a different host load with a "could lead to SIGILL" warning and have
# crashed full-suite runs (SIGILL at exit in round 3; SIGSEGV inside
# backend_compile_and_load mid-run in round 4). Keying by the cpuinfo
# ``flags`` line alone proved insufficient: LLVM derives TUNING features
# (e.g. ``+prefer-no-gather``) from the CPU *model*, so two hosts with
# identical flags but different models shared a dir and still loaded
# foreign code. Key by vendor/family/model/stepping/model-name + flags.
import hashlib  # noqa: E402

_CPU_KEY_FIELDS = ("vendor_id", "cpu family", "model\t", "model name",
                   "stepping", "flags")
try:
    with open("/proc/cpuinfo") as _f:
        _lines = []
        for _l in _f:
            if _l.startswith(_CPU_KEY_FIELDS):
                _lines.append(_l.strip())
            if _l.strip() == "" and _lines:
                break  # first core's block is enough; cores are identical
        _feats = "\n".join(_lines)
except OSError:  # non-Linux fallback: platform string only
    import platform as _platform

    _feats = _platform.processor()
_host_key = hashlib.sha256(_feats.encode()).hexdigest()[:12]
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/scream_tpu_jax_cache_{_host_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
