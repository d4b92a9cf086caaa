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

# NO persistent compilation cache for the CPU suite: XLA:CPU executable
# serialization segfaults intermittently on this box — observed four
# times mid-suite across every configuration tried (shared cache dir,
# fresh per-machine dir, write-only paths; stacks in
# put_executable_and_time/executable.serialize and
# backend_compile_and_load).  The suite is compile-bound either way
# (~45 min cold vs warm was never much faster); correctness > reruns.
jax.config.update("jax_enable_compilation_cache", False)


@pytest.fixture
def rng():
    return random.Random(0xB15)


@pytest.fixture
def nprng():
    return np.random.default_rng(0xB15)
