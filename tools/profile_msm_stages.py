"""Per-stage MSM wall-clock breakdown on the current device.

Times each pipeline stage of one window (sort+gather tile, scan, stitch,
boundary, triangle, combine) plus the amortized decompose/pack stages, at
the given size — the data behind window/tile tuning decisions
(the living version of the reference's profiling notes in
msm_kernels.cu:37 / ntt_kernels.cu:55).

Usage: PROFILE_LOG_N=22 python tools/profile_msm_stages.py
       PROFILE_GLV=1 PROFILE_LOG_N=20 python tools/profile_msm_stages.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_bls12_381_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import _random_fr_mont, _random_g1_batch
from tpu_bls12_381.fields import FR, ops
from tpu_bls12_381.curves.field_adapters import FQ_ADAPTER
from tpu_bls12_381.msm import pippenger as pp
from tpu_bls12_381.runtime.tracing import fence, timed_reps

REPS = int(os.environ.get("PROFILE_REPS", "3"))


def main():
    log_n = int(os.environ.get("PROFILE_LOG_N", "20"))
    glv = os.environ.get("PROFILE_GLV", "0") == "1"
    F = FQ_ADAPTER
    n = 1 << log_n
    scalars = _random_fr_mont(n)
    A = _random_g1_batch(n)
    jax.block_until_ready(A)

    sc = ops.from_mont(FR, scalars)
    num_bits = pp.FR_BITS
    x, y, inf = A
    if glv:
        sc, num_bits = pp.glv_split_scalars(sc)
        x, y, inf = pp.glv_extend_bases(F, (x, y, inf))
    n_eff = inf.shape[-1]
    w = pp.window_bits_for(n_eff, F)
    nb = 1 << (w - 1)
    L = pp.lane_tile_for(n_eff, F)
    R = -(-n_eff // L)
    lb_bits = pp.triangle_lb(nb).bit_length() - 1
    print(f"# n=2^{log_n} glv={glv} n_eff={n_eff} w={w} T="
          f"{pp.num_windows(w, num_bits)} L={L} R={R} nb={nb}",
          file=sys.stderr)

    t = {}

    def bench(name, fn):
        fence(fn())
        t[name] = timed_reps(REPS, fn)
        print(f"# {name:12s} {t[name]*1e3:9.2f} ms", file=sys.stderr)

    bench("decompose", lambda: pp.decompose_window_keys(sc, w, num_bits))
    keys = pp.decompose_window_keys(sc, w, num_bits)
    T = int(keys.shape[0])
    bench("pack_rows", lambda: pp._stage_pack_rows(F, x, y))
    em_rows = pp._stage_pack_rows(F, x, y)

    k0 = keys[0]
    bench("sort_tile", lambda: pp._stage_sort_tile(F, k0, R, L, em_rows, inf))
    st = pp._stage_sort_tile(F, k0, R, L, em_rows, inf)
    key_sorted, x_rows, y_rows, sign_rows, inf_rows = st
    bench("scan", lambda: pp._stage_scan(F, x_rows, y_rows, sign_rows,
                                         inf_rows))
    col_total, prefix_rows = pp._stage_scan(F, x_rows, y_rows, sign_rows,
                                            inf_rows)
    bench("stitch", lambda: pp._stage_stitch(F, col_total))
    col_carry = pp._stage_stitch(F, col_total)
    bench("boundary", lambda: pp._stage_boundary(F, key_sorted, col_carry,
                                                 nb, prefix_rows))
    buckets = pp._stage_boundary(F, key_sorted, col_carry, nb, prefix_rows)
    bench("triangle", lambda: pp._stage_triangle_scans(F, buckets, nb))
    w_rows, w_cols, total = pp._stage_triangle_scans(F, buckets, nb)
    bench("tri_combine", lambda: pp._stage_triangle_combine(
        F, w_rows, w_cols, total, lb_bits))
    # the production pipeline issues TWO fused programs per window —
    # time those too (the fine-grained numbers above carry per-dispatch
    # overhead that the fused path amortizes)
    bench("sort_scan", lambda: pp._stage_sort_scan(F, k0, R, L, em_rows,
                                                   inf))
    ks2, ct2, pr2 = pp._stage_sort_scan(F, k0, R, L, em_rows, inf)
    bench("window_tail", lambda: pp._stage_window_tail(
        F, ks2, ct2, nb, lb_bits, pr2))

    per_window = sum(t[k] for k in ("sort_scan", "window_tail"))
    fixed = t["decompose"] + t["pack_rows"]
    est = fixed + T * per_window
    print(f"# per-window {per_window*1e3:.2f} ms x {T} + fixed "
          f"{fixed*1e3:.2f} ms = est {est*1e3:.2f} ms "
          f"({n/est/1e3:.0f}k pts/s)", file=sys.stderr)

    # whole-MSM reference number
    from tpu_bls12_381.msm import msm_g1

    fence(msm_g1(scalars, A, glv=glv))
    whole = timed_reps(REPS, lambda: msm_g1(scalars, A, glv=glv))
    print(f"# whole msm   {whole*1e3:9.2f} ms ({n/whole/1e3:.0f}k pts/s)",
          file=sys.stderr)
    out = {"log_n": log_n, "glv": glv, "w": w, "T": T, "L": L, "R": R,
           "stages_ms": {k: round(v * 1e3, 3) for k, v in t.items()},
           "whole_ms": round(whole * 1e3, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
