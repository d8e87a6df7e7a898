"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding is
exercised without TPU hardware (the reference's single-process gtest model,
tests/CMakeLists.txt:3-18, widened with the distributed axis SURVEY.md section 4
calls for). Must set env vars before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Persistent compilation cache: the suite compiles many mid-sized programs
# (ladders, pow chains); cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import random

import pytest


@pytest.fixture
def rng():
    return random.Random(0xEC51)
