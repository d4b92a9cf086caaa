"""Weak-scaling efficiency harness for sharded MSM and NTT.

Runs the sharded pipelines over mesh sizes 1, 2, 4, ..., P (all
addressable devices) with the problem size scaled proportionally, and
reports throughput and weak-scaling efficiency per size — the harness
for the BASELINE.json >=80%-efficiency target on multi-chip slices.

On a single-chip host this degenerates to the 1-device row (the CI box);
run on a pod slice (after `jax.distributed.initialize` for multi-host)
to get the real curve.  Prints one JSON line per mesh size.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

# BENCH_FORCE_CPU=1: run on the virtual CPU mesh (JAX_PLATFORMS in the
# environment is pre-empted by the platform plugin's sitecustomize, so
# the override must go through jax.config after import).
if os.environ.get("BENCH_FORCE_CPU") == "1":
    jax.config.update("jax_platforms", "cpu")
    # XLA:CPU AOT executables embed host machine features; reusing a
    # cache written on a different host spams loader errors and risks
    # SIGILL (seen in round-3's scaling step, rc=124).  Keep the CPU
    # leg's cache separate and per-machine.
    import platform as _plat

    jax.config.update(
        "jax_compilation_cache_dir",
        f"/tmp/tpu_bls12_381_jax_cache_cpu_{_plat.node() or 'host'}")
else:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/tpu_bls12_381_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tpu_bls12_381.fields import FR
from tpu_bls12_381.parallel import default_mesh, msm_g1_sharded, ntt_sharded
from tpu_bls12_381.parallel.msm import shard_msm_inputs

import bench as bench_mod


def run(points_per_device_log2: int = 18, ntt_log_n_base: int = 20,
        reps: int = 2) -> None:
    all_devices = jax.devices()
    # Production MSM config: GLV split per chunk (the auto default at
    # prover sizes).  BENCH_SCALING_GLV=0 disables.
    glv = os.environ.get("BENCH_SCALING_GLV", "1") == "1"
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "artifacts", "SCALING.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    rows: list = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:  # incremental: survive timeouts
            json.dump(rows, f, indent=1)

    sizes = []
    p = 1
    while p <= len(all_devices):
        sizes.append(p)
        p *= 2
    base_rate_msm = base_rate_ntt = None
    for p in sizes:
        mesh = default_mesh(p)
        # --- MSM: n scales with p (weak scaling) -------------------------
        n = (1 << points_per_device_log2) * p
        scalars = bench_mod._random_fr_mont(n)
        A = bench_mod._random_g1_batch(n)
        sc_sh, A_sh = shard_msm_inputs(scalars, A, mesh)
        out = msm_g1_sharded(sc_sh, A_sh, mesh, glv=glv)
        jax.block_until_ready(out)
        best = min(_time(lambda: msm_g1_sharded(sc_sh, A_sh, mesh, glv=glv))
                   for _ in range(reps))
        rate = n / best
        base_rate_msm = base_rate_msm or rate
        emit({
            "metric": "g1_msm_weak_scaling", "devices": p, "n": n,
            "glv": glv, "value": round(rate, 1), "unit": "points/s",
            "efficiency": round(rate / (base_rate_msm * p), 4),
        })
        # --- NTT: n scales with p ----------------------------------------
        log_n = ntt_log_n_base + (p - 1).bit_length()
        x = jnp.asarray(np.random.default_rng(5).integers(
            0, 1 << 16, size=(FR.num_limbs, 1 << log_n), dtype=np.uint64)
        ).astype(jnp.uint32)
        ev = ntt_sharded(x, mesh, transposed_out=True)
        jax.block_until_ready(ev)
        best = min(_time(lambda: ntt_sharded(x, mesh, transposed_out=True))
                   for _ in range(reps))
        rate = (1 << log_n) / best
        base_rate_ntt = base_rate_ntt or rate
        emit({
            "metric": "ntt_weak_scaling", "devices": p, "log_n": log_n,
            "value": round(rate, 1), "unit": "elems/s",
            "efficiency": round(rate / (base_rate_ntt * p), 4),
        })


def _time(fn) -> float:
    from tpu_bls12_381.runtime.tracing import fence

    t0 = time.perf_counter()
    fence(fn())
    return time.perf_counter() - t0


if __name__ == "__main__":
    # On the virtual CPU mesh every "device" shares the host cores, so use
    # small sizes: the artifact validates the sharded ALGORITHM's rows and
    # the efficiency math, not silicon scaling (BENCH_SCALING_LOG_N /
    # BENCH_SCALING_NTT_LOG_N override).
    cpu_mesh = os.environ.get("BENCH_FORCE_CPU") == "1"
    run(
        points_per_device_log2=int(
            os.environ.get("BENCH_SCALING_LOG_N", "10" if cpu_mesh else "18")),
        ntt_log_n_base=int(
            os.environ.get("BENCH_SCALING_NTT_LOG_N",
                           "14" if cpu_mesh else "20")),
    )
