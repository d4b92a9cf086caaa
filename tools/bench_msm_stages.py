#!/usr/bin/env python3
"""Per-stage MSM timing at a given size (TPU perf diagnosis).

Times each pipeline stage of msm/pippenger.py in a pipelined loop of REPS
calls.  Measurement note (axon/tunnel platform): jax.block_until_ready is
a NO-OP here — timings chain REPS dispatches and then fetch one element
of the last output (device execution is in-order, so the fetch waits for
the full chain).

Usage: LOG_N=22 REPS=8 python tools/bench_msm_stages.py
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_bls12_381_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from tpu_bls12_381.fields import FR, ops
from tpu_bls12_381.curves.field_adapters import FQ_ADAPTER
from tpu_bls12_381.msm import pippenger as pip

LOG_N = int(os.environ.get("LOG_N", "22"))
REPS = int(os.environ.get("REPS", "8"))
N = 1 << LOG_N
F = FQ_ADAPTER


def fetch_leaf(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf.ravel()[:1] if leaf.ndim else leaf)


def timeit(name, fn, *args):
    out = fn(*args)
    fetch_leaf(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    fetch_leaf(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt*1e3:9.2f} ms", flush=True)
    return out, dt


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench as benchmod

    scalars = benchmod._random_fr_mont(N)
    A = benchmod._random_g1_batch(N)
    x, y, inf = A
    fetch_leaf(A)

    w = pip.window_bits_for(N)
    nb = 1 << (w - 1)
    L = pip.lane_tile_for(N)
    R = -(-N // L)
    lb_bits = pip.triangle_lb(nb).bit_length() - 1
    print(f"n=2^{LOG_N} w={w} nb={nb} L={L} R={R} T={pip.num_windows(w)}")

    scal_std = ops.from_mont(FR, scalars)
    fetch_leaf(scal_std)
    keys, t_dec = timeit(
        "decompose+keys", lambda s: pip.decompose_window_keys(s, w), scal_std)

    em_rows, t_pack = timeit(
        "pack_rows (once/MSM)", lambda a, b: pip._stage_pack_rows(F, a, b), x, y)

    key0 = keys[0]
    fetch_leaf(key0)

    (st_out), t_sort = timeit(
        "sort_tile", lambda k: pip._stage_sort_tile(F, k, R, L, em_rows, inf),
        key0)
    key_sorted, x_rows, y_rows, sign_rows, inf_rows = st_out

    (sc_out), t_scan = timeit(
        "scan", lambda a, b, c, d: pip._stage_scan(F, a, b, c, d),
        x_rows, y_rows, sign_rows, inf_rows)
    col_total, prefix_rows = sc_out

    (col_carry), t_st = timeit(
        "stitch", lambda ct: pip._stage_stitch(F, ct), col_total)

    (buckets), t_bd = timeit(
        "boundary", lambda ks, cc, pr: pip._stage_boundary(F, ks, cc, nb, pr),
        key_sorted, col_carry, prefix_rows)

    (tri_out), t_tri = timeit(
        "triangle_scans", lambda b: pip._stage_triangle_scans(F, b, nb),
        buckets)
    w_rows, w_cols, total = tri_out

    (_), t_cb = timeit(
        "triangle_combine",
        lambda a, b, c: pip._stage_triangle_combine(F, a, b, c, lb_bits),
        w_rows, w_cols, total)

    T = pip.num_windows(w)
    per_win = t_sort + t_scan + t_st + t_bd + t_tri + t_cb
    print(f"{'per-window total':28s} {per_win*1e3:9.2f} ms")
    print(f"{'x T + decompose + pack':28s} "
          f"{(per_win*T + t_dec + t_pack)*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
