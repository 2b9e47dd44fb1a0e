"""Test configuration: run all tests on 8 virtual CPU devices.

Multi-chip sharding logic is validated without TPU hardware via XLA's
host-platform device simulation (SURVEY.md §4).  bench.py and production entry
points do NOT import this — they run on the real TPU.

Note: this image's sitecustomize registers the 'axon' TPU backend and pins
JAX_PLATFORMS=axon, so env vars alone don't switch backends; we must update
jax.config after import (before any backend is initialized).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from satmvs_tpu import cache as _cache  # noqa: E402

# No-op on the CPU backend (cache.enable refuses CPU: deserializing XLA:CPU
# AOT entries segfaulted — NOTES round-4); kept so any test that flips to a
# TPU backend still gets the persistent Mosaic-compile cache.
_cache.enable()

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Release jit-compiled executables at every test-module boundary.

    The full suite accumulates ~140 tests' worth of compiled XLA:CPU
    programs in one process and then segfaults inside
    `backend_compile_and_load` at test #138 (3/3 repro, NOTES round-5);
    every ~half-suite subset passes, so the crash is accumulation-dependent
    in the jaxlib CPU client, not a specific test interaction.  Dropping the
    executable caches between modules keeps the live-compiled-program count
    bounded; CPU compiles are cheap, so re-JIT cost is noise."""
    yield
    import jax

    jax.clear_caches()
