#!/usr/bin/env python3
"""Microbench: sort + gather strategies for the MSM sort_tile stage.

LOG_N=22 REPS=4 python tools/bench_gather.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_bls12_381_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

LOG_N = int(os.environ.get("LOG_N", "22"))
REPS = int(os.environ.get("REPS", "4"))
N = 1 << LOG_N
K = 48  # x+y limbs for G1


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:36s} {dt*1e3:9.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 15, size=N, dtype=np.uint32))
    coords_lf = jnp.asarray(rng.integers(0, 1 << 16, size=(K, N), dtype=np.uint32))
    coords_em = jnp.asarray(coords_lf.T.copy())  # (N, K) element-major
    gidx = jnp.asarray(rng.permutation(N).astype(np.uint32))

    timeit("sort_key_val(u32,u32)",
           jax.jit(lambda k: jax.lax.sort_key_val(
               k, jnp.arange(N, dtype=jnp.uint32))), key)

    timeit("gather limbs-first (K,N)[:,idx]",
           jax.jit(lambda c, i: c[:, i]), coords_lf, gidx)

    timeit("gather element-major (N,K)[idx]",
           jax.jit(lambda c, i: c[i]), coords_em, gidx)

    timeit("gather em + transpose to (K,N)",
           jax.jit(lambda c, i: c[i].T), coords_em, gidx)

    L = 1 << 15
    R = N // L
    timeit("gather em + tile (R,K,L)",
           jax.jit(lambda c, i: jnp.moveaxis(
               c[i].reshape(R, L, K), -1, 1)), coords_em, gidx)

    timeit("take_along_axis lf",
           jax.jit(lambda c, i: jnp.take_along_axis(
               c, i[None, :].astype(jnp.int32), axis=1)), coords_lf, gidx)

    # one-hot matmul gather on the MXU: (N,K) rows gathered in L-sized tiles
    # would need (L,N) one-hot x (N,K) — N too big; try per-tile with N cols
    timeit("transpose (N,K)->(K,N) dense",
           jax.jit(lambda c: c.T), coords_em)


if __name__ == "__main__":
    main()
