#!/usr/bin/env python3
"""Per-stage MSM timing at a given size (TPU perf diagnosis).

Times each pipeline stage of msm/pippenger.py in a pipelined loop of REPS
calls (per-call block_until_ready timings on this box carry a ~25 ms
dispatch-bubble floor; a pipelined loop amortizes it).

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


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for _ in range(REPS):
        outs.append(fn(*args))
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt*1e3:9.2f} ms")
    return out, dt


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/..")
    import bench as benchmod

    scalars = benchmod._random_fr_mont(N)
    A = benchmod._random_g1_batch(N)
    x, y, inf = A
    jax.block_until_ready(A)

    w = pip.window_bits_for(N)
    nb = 1 << (w - 1)
    L = pip.lane_tile_for(N)
    R = -(-N // L)
    lb_bits = pip.triangle_lb(nb).bit_length() - 1
    print(f"n=2^{LOG_N} w={w} nb={nb} L={L} R={R} T={pip.num_windows(w)}")

    scal_std = ops.from_mont(FR, scalars)
    jax.block_until_ready(scal_std)
    (abs_d, signs), t_dec = timeit(
        "decompose", lambda s: pip.decompose_signed_digits(s, w), scal_std)

    digit = abs_d[0]
    sign0 = signs[0]
    sent = jnp.uint32(nb + 1)
    key = jnp.where(digit == 0, sent, digit)
    jax.block_until_ready(key)

    (st_out), t_sort = timeit(
        "sort_tile", lambda k, sg: pip._stage_sort_tile(
            F, k, R, L, x, y, None, sg, inf), key, sign0)
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
    print(f"{'x T windows + decompose':28s} {(per_win*T + t_dec)*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
