#!/usr/bin/env python3
"""Microbench: sort + gather strategies for the MSM sort_tile stage.

LOG_N=22 REPS=4 python tools/bench_gather.py

Measurement note (axon/tunnel platform): jax.block_until_ready is a NO-OP
here — it returns without waiting.  The only reliable timing is a
pipelined loop of REPS calls followed by a single np.asarray fetch of the
last output (TPU execution is in-order, so the fetch waits for the whole
chain); subtract nothing, divide by REPS.
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
K = 48   # x+y u32 limb planes for G1 (16-bit limbs)
KP = 24  # packed: two 16-bit limbs per u32


def fetch_leaf(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def timeit(name, fn, *args):
    out = fn(*args)
    fetch_leaf(out)
    t0 = time.perf_counter()
    out = None
    for _ in range(REPS):
        out = fn(*args)
    fetch_leaf(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 15, size=N, dtype=np.uint32))
    coords_lf = jnp.asarray(rng.integers(0, 1 << 16, size=(K, N), dtype=np.uint32))
    coords_em = jnp.asarray(coords_lf.T.copy())          # (N, K) element-major
    packed_lf = jnp.asarray(rng.integers(0, 1 << 32, size=(KP, N), dtype=np.uint32))
    packed_em = jnp.asarray(packed_lf.T.copy())          # (N, KP)
    gidx = jnp.asarray(rng.permutation(N).astype(np.uint32))

    L = 1 << 15
    R = N // L

    timeit("sort_key_val(u32,u32)",
           jax.jit(lambda k: jax.lax.sort_key_val(
               k, jnp.arange(N, dtype=jnp.uint32))), key)

    timeit("gather limbs-first (K,N)[:,idx]",
           jax.jit(lambda c, i: c[:, i]), coords_lf, gidx)

    timeit("gather packed lf (KP,N)[:,idx]",
           jax.jit(lambda c, i: c[:, i]), packed_lf, gidx)

    timeit("gather element-major (N,K)[idx]",
           jax.jit(lambda c, i: c[i]), coords_em, gidx)

    timeit("gather packed em (N,KP)[idx]",
           jax.jit(lambda c, i: c[i]), packed_em, gidx)

    timeit("gather em + transpose to (K,N)",
           jax.jit(lambda c, i: c[i].T), coords_em, gidx)

    timeit("gather packed em + tile (R,KP,L)",
           jax.jit(lambda c, i: jnp.moveaxis(
               c[i].reshape(R, L, KP), -1, 1)), packed_em, gidx)

    timeit("gather packed em + tile + unpack (R,K,L)",
           jax.jit(lambda c, i: (lambda t: jnp.stack(
               [t & 0xFFFF, t >> 16], axis=2).reshape(R, K, L))(
                   jnp.moveaxis(c[i].reshape(R, L, KP), -1, 1))),
           packed_em, gidx)

    timeit("transpose (N,K)->(K,N) dense",
           jax.jit(lambda c: c.T), coords_em)

    timeit("transpose packed (N,KP)->(KP,N)",
           jax.jit(lambda c: c.T), packed_em)

    # sort carrying packed payload through the sort network
    ops = [key] + [packed_lf[i] for i in range(4)]
    timeit("sort w/ 4 u32 payload operands",
           jax.jit(lambda *xs: jax.lax.sort(xs, num_keys=1)), *ops)


if __name__ == "__main__":
    main()
