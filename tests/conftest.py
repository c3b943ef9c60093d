"""Test configuration: force an 8-device virtual CPU mesh so sharding and
pjit paths are exercised without TPU hardware (SURVEY.md §4).

Note: the environment's sitecustomize imports jax and registers the real
TPU ('axon') backend before pytest starts, so env vars alone are too late —
the platform must be overridden through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()

# Persistent compilation cache: the suite's cost is dominated by XLA CPU
# compiles of the jitted decode/train loops; caching them makes re-runs and
# shared-shape tests dramatically faster.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# The XLA:CPU compiler segfaults deterministically around the ~258th
# collected item in a full-suite run (reproduced twice 2026-08-20 at the
# same POSITION while different tests held it — it moved when a test was
# inserted earlier; every victim passes in isolation). The crash is inside
# backend_compile_and_load after ~250 tests' worth of live executables, so
# bound the per-process accumulation: drop jit/executable caches at every
# module boundary. Re-JITs hit the persistent disk cache above, so the
# overhead is parse+load, not recompilation.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
