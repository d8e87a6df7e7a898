"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding is
exercised without TPU hardware (the reference's single-process gtest model,
tests/CMakeLists.txt:3-18, widened with the distributed axis SURVEY.md section 4
calls for). Must set env vars before the first jax import.
"""

import os

# ECSIMD_TPU_TESTS=1 keeps the real backend so the @skipif(TPU)-gated
# hardware KATs run on the actual chip:
#   ECSIMD_TPU_TESTS=1 python -m pytest tests/ -q -k tpu
# Default: force CPU — the ambient environment may point JAX at a tunneled
# TPU (JAX_PLATFORMS=axon), which serializes every unit-test compile through
# one remote chip. Unit tests are correctness tests; only bench.py and the
# explicit TPU KATs use the hardware.
_TPU_MODE = bool(os.environ.get("ECSIMD_TPU_TESTS"))
if not _TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# Config API, not env vars: sitecustomize imports jax at interpreter start
# (axon PJRT plugin), so env vars set here lose to the registered plugin /
# already-read config. The config updates below reliably win.
if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: DISABLED for the CPU suite since the r4
# jaxlib update — its cache serializer segfaults the whole process on large
# XLA:CPU executables, on write (put_executable_and_time: P-384 ladder,
# sharded P-256 mesh jit) AND on read (get_executable_and_time: the 23MB
# wei25519 ladder entry). Three full-suite runs died this way; d=16
# single-device entries (~6MB) were fine, but there is no max-entry-size
# knob to express that. Cold recompiles cost a few minutes per run; a
# segfaulted suite costs everything. bench.py (TPU path) keeps its own
# cache config — Mosaic executables round-trip fine.
# (Kept intentionally: jax.config.update("jax_compilation_cache_dir", ...))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xEC51)
