"""Test configuration: run the suite on a virtual 8-device CPU mesh.

TPU compiles are slow (~20-40s per shape) and the CI box has a single chip;
the JAX computations here are platform-independent integer programs, so the
suite runs on CPU with 8 virtual devices to also exercise the multi-chip
sharding paths.  Benchmarks (bench.py) run on the real TPU.
"""

import os

# Force the CPU platform (virtual 8-device mesh).  NOTE: the environment's
# sitecustomize imports jax at interpreter start (axon PJRT plugin), so
# JAX_PLATFORMS in os.environ is captured before conftest runs — the
# platform must be overridden via jax.config, and the host-device-count
# XLA flag mutated before the first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import random

import numpy as np
import pytest

import jax

# MIDNIGHT_TEST_TPU=1 runs the suite on the real chip instead (enables the
# TPU-gated kernel bit-exactness tests; much slower per compile).
if os.environ.get("MIDNIGHT_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles many small integer
# programs; caching makes re-runs fast.  Reads only: XLA:CPU executable
# serialization (the cache WRITE path) segfaults intermittently on this
# box (executable.serialize() in put_executable_and_time — observed twice
# mid-suite), so new entries are not persisted from CI runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_bls12_381_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)


@pytest.fixture
def rng():
    return random.Random(0xB15)


@pytest.fixture
def nprng():
    return np.random.default_rng(0xB15)
