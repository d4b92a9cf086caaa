"""Pallas TPU kernels for the hot field ops.

The pure-jnp ops in ``ops.py`` are correct and fully fused only at XLA's
discretion; these kernels pin the whole limb pipeline (multiply ->
deferred-carry accumulate -> REDC -> conditional subtract) into VMEM so
no intermediate ever round-trips HBM.  Block shape: the natural (K, BN)
limbs-first tile — K (16/24) rides the sublane dimension, BN lanes
(multiple of 128) ride the vector lanes; one grid step processes BN
field elements.

Pallas kernels may not close over traced constants, so the field
constants (modulus column, Montgomery factor n0) are explicit kernel
inputs, broadcast once per call.  The limb algorithms are the same
unrolled schoolbook+REDC as ops.mont_mul_unrolled (self-contained here
with the constants as refs); tests assert bit-exactness against the
jnp ops.  On non-TPU backends the kernels run in Pallas interpret mode
(slow, for CI parity).

Reference analog: these play the role of field.cuh's device functions
(CIOS multiply field.cuh:509-576) as *standalone* bulk kernels — the
vecops entry points (vec_ops.cu:63-150).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .field import FieldSpec
from .limbs import LIMB_BITS, LIMB_MASK

MASK = LIMB_MASK  # python int: pallas kernels may not capture traced constants

_LANE_BLOCK: int | None = None


def lane_block() -> int:
    """Elements per grid step.  Swept on v5e: 2048 is best for Fr and Fq.

    On non-TPU backends the kernels run in interpret mode where per-lane
    cost is pure overhead — small blocks keep CI fast.  Resolved lazily
    (and exposed as the module attribute ``LANE_BLOCK`` via __getattr__):
    an import-time ``jax.default_backend()`` would initialize the XLA
    backend and break ``jax.distributed.initialize``.
    """
    global _LANE_BLOCK
    if _LANE_BLOCK is None:
        from ..tuning import chip_profile

        _LANE_BLOCK = chip_profile().lane_block
    return _LANE_BLOCK


def __getattr__(name: str):
    if name == "LANE_BLOCK":
        return lane_block()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# -----------------------------------------------------------------------------
# Kernel-level limb arithmetic (constants passed in, everything unrolled).
# -----------------------------------------------------------------------------


def _k_carry_normalize(cols):
    out = []
    carry = jnp.zeros_like(cols[0])
    for c in cols:
        v = c + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return out, carry


def _k_sub_rows(a_rows, b_rows):
    out = []
    borrow = jnp.zeros_like(a_rows[0])
    for ai, bi in zip(a_rows, b_rows):
        v = ai - bi - borrow
        out.append(v & MASK)
        borrow = (v >> LIMB_BITS) & 1
    return out, borrow


def _k_cond_sub_modulus(rows, top_carry, n_rows):
    d, borrow = _k_sub_rows(rows, n_rows)
    take_d = (top_carry | (1 - borrow)).astype(jnp.bool_)
    return [jnp.where(take_d, di, ri) for di, ri in zip(d, rows)]


def _k_redc(K, t, n_rows, n0):
    """Word-serial REDC over a carry-normalized 2K+1-column product."""
    for i in range(K):
        m = (t[i] * n0) & MASK
        for j in range(K):
            p = m * n_rows[j]
            t[i + j] = t[i + j] + (p & MASK)
            t[i + j + 1] = t[i + j + 1] + (p >> LIMB_BITS)
        t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)
    rows, carry = _k_carry_normalize(t[K : 2 * K])
    carry = carry + t[2 * K]
    return _k_cond_sub_modulus(rows, carry, n_rows)


def _k_mont_mul_unrolled(K, a_rows, b_rows, n_rows, n0):
    """Unrolled schoolbook + word-serial REDC on per-limb row values.

    Kept for A/B comparison (MIDNIGHT_PALLAS_UNROLL=1): same multiply
    count as the CIOS form below, but its trace is O(K^2) separate jnp
    calls — ~75 s of host-side trace+Mosaic-lowering PER kernel instance
    at K=24 on this box, which made the MSM first call ~350 s even with
    every XLA compile persistent-cache-hit (artifacts/COLDSTART_*.json).
    """
    t = [jnp.zeros_like(a_rows[0]) for _ in range(2 * K + 1)]
    for i in range(K):
        for j in range(K):
            p = a_rows[i] * b_rows[j]
            t[i + j] = t[i + j] + (p & MASK)
            t[i + j + 1] = t[i + j + 1] + (p >> LIMB_BITS)
    t, _ = _k_carry_normalize(t)
    return _k_redc(K, t, n_rows, n0)


def _k_mont_sqr_unrolled(K, a_rows, n_rows, n0):
    """Unrolled symmetric square (kept for A/B, see _k_mont_mul_unrolled)."""
    t = [jnp.zeros_like(a_rows[0]) for _ in range(2 * K + 1)]
    for i in range(K):
        p = a_rows[i] * a_rows[i]
        t[2 * i] = t[2 * i] + (p & MASK)
        t[2 * i + 1] = t[2 * i + 1] + (p >> LIMB_BITS)
        for j in range(i + 1, K):
            p = a_rows[i] * a_rows[j]
            t[i + j] = t[i + j] + ((p & MASK) << 1)
            t[i + j + 1] = t[i + j + 1] + ((p >> LIMB_BITS) << 1)
    t, _ = _k_carry_normalize(t)
    return _k_redc(K, t, n_rows, n0)


def _unroll_env() -> bool:
    """Kernel form selection: unrolled on compiled TPU, CIOS under
    interpret mode.

    Measured on v5e: the vectorized-CIOS forms below cut host trace +
    Mosaic lowering ~10x (3 s vs 75 s per kernel instance) but run the
    fused group-law kernels ~40% slower (g1_mixed_add 15.9 vs 27.5 M/s
    chained: the per-limb m-dependency chain and sublane concats beat
    the VPU's ILP out of the formula) and at 2048 lanes overflow the
    16 MB scoped-VMEM budget.  Runtime wins: unrolled is the compiled
    default; the cold-start cost is attacked by the AOT export cache
    (fields/aot.py) instead.  In Pallas INTERPRET mode (CPU CI) the op
    count IS the runtime, so the ~10x-smaller CIOS graphs run there —
    both forms are bit-exact against the jnp reference ops
    (tests/test_pallas_ops.py).  MIDNIGHT_PALLAS_CIOS=1/0 forces."""
    import os

    env = os.environ.get("MIDNIGHT_PALLAS_CIOS", "")
    if env == "1":
        return False
    if env == "0":
        return True
    return not _interpret()


def _k_mont_mul(K, a_rows, b_rows, n_rows, n0):
    """Montgomery multiply: vectorized CIOS (the field.cuh:509-576 role).

    Interleaved operand-scanning: one Python pass over a's K limbs; per
    iteration the partial product a_i * B and the REDC correction m * N
    are each ONE (K, L)-shaped vector multiply, and the one-limb shift
    of the accumulator is a static slice.  Identical limb-multiply count
    to schoolbook+REDC (2K^2 + K) but the trace is O(K) jnp calls, not
    O(K^2) — this is what keeps host-side trace + Mosaic lowering of
    every kernel instance ~1 s instead of ~75 s (the round-3 "567 s cold
    start" was almost entirely this, not XLA compile time; see
    artifacts/COLDSTART_*.json).

    Column bounds (16-bit limbs in u32 columns, carries deferred): each
    iteration adds 4 masked halves (< 2^18) per column and a column is
    live for <= K+1 iterations before it shifts out, so columns stay
    < 25 * 2^18 < 2^23.  m is computed from t[0] mod 2^16, and after
    adding m*N the low column is divisible by 2^16, so the shift-out
    carry is exact.  Result < 2N -> one conditional subtract.
    """
    if _unroll_env():
        return _k_mont_mul_unrolled(K, a_rows, b_rows, n_rows, n0)
    B = jnp.stack(b_rows)            # (K, L)
    N = jnp.stack(n_rows)            # (K, L)
    zero_row = jnp.zeros_like(B[:1])
    # No in-place updates: Mosaic has no scatter — offset accumulation is
    # expressed as static slice + concat (sublane shuffles, cheap), and
    # the partial-product and REDC halves are pre-summed so each
    # iteration does two K-row adds into the accumulator, the same add
    # count as the unrolled form.
    t = jnp.zeros((K + 2,) + B.shape[1:], dtype=B.dtype)
    for i in range(K):
        p = a_rows[i] * B            # (K, L) 16x16 -> 32-bit products
        plo = p & MASK
        # m from the updated low column only (t[0] + plo[0] mod 2^16)
        m = (((t[0] + plo[0]) & MASK) * n0) & MASK
        q = m * N
        lo = plo + (q & MASK)        # <= 2^17 per column: u32-safe
        hi = (p >> LIMB_BITS) + (q >> LIMB_BITS)
        t = t + jnp.concatenate([lo, zero_row, zero_row])
        t = t + jnp.concatenate([zero_row, hi, zero_row])
        carry = t[0] >> LIMB_BITS    # t[0] ≡ 0 mod 2^16 by choice of m
        t = jnp.concatenate([(t[1] + carry)[None], t[2:], zero_row])
    cols, _ = _k_carry_normalize([t[k] for k in range(K + 2)])
    # value < 2N < 2^(16K+1): everything above row K-1 is the 0/1 carry
    return _k_cond_sub_modulus(cols[:K], cols[K], n_rows)


def _k_mont_sqr(K, a_rows, n_rows, n0):
    """Montgomery square exploiting product symmetry: K(K+1)/2 limb muls
    in the product phase instead of K^2 (~23% fewer total with REDC) —
    the same trick as the reference's optimized squaring
    (field.cuh:586-685).  Vectorized like _k_mont_mul: per source limb
    one (K-i, L) multiply against the tail, doubled cross terms (< 2^17)
    accumulated into deferred-carry u32 columns at static offsets, then
    a vectorized word-serial REDC."""
    if _unroll_env():
        return _k_mont_sqr_unrolled(K, a_rows, n_rows, n0)
    A = jnp.stack(a_rows)            # (K, L)
    N = jnp.stack(n_rows)
    L_shape = A.shape[1:]

    def _z(r):
        return jnp.zeros((r,) + L_shape, dtype=A.dtype)

    def _cat(*parts):
        # Mosaic rejects zero-size vectors: drop empty segments
        return jnp.concatenate([p for p in parts if p.shape[0]])

    # product phase: one (K-i, L) multiply per source limb, doubled cross
    # terms; offset accumulation via zero-row concat (no Mosaic scatter)
    t = jnp.zeros((2 * K + 1,) + L_shape, dtype=A.dtype)
    for i in range(K):
        p = a_rows[i] * A[i:]        # (K - i, L); row 0 is the diagonal
        lo, hi = p & MASK, p >> LIMB_BITS
        if p.shape[0] > 1:
            lo = jnp.concatenate([lo[:1], lo[1:] << 1])
            hi = jnp.concatenate([hi[:1], hi[1:] << 1])
        t = t + _cat(_z(2 * i), lo, _z(K + 1 - i))
        t = t + _cat(_z(2 * i + 1), hi, _z(K - i))
    cols = [t[k] for k in range(2 * K + 1)]
    cols, _ = _k_carry_normalize(cols)
    # interleaved word-serial REDC on the normalized product: retire one
    # limb per pass over a sliding (K+2)-row window (same schedule as the
    # multiply above, without the a_i*B term)
    t = jnp.stack(cols[:K + 2])
    rest = cols[K + 2:]
    zero_row = _z(1)
    for i in range(K):
        m = ((t[0] & MASK) * n0) & MASK
        q = m * N
        t = t + jnp.concatenate([q & MASK, zero_row, zero_row])
        t = t + jnp.concatenate([zero_row, q >> LIMB_BITS, zero_row])
        carry = t[0] >> LIMB_BITS
        incoming = rest[0][None] if rest else zero_row
        rest = rest[1:]
        t = jnp.concatenate([(t[1] + carry)[None], t[2:], incoming])
    cols, _ = _k_carry_normalize([t[k] for k in range(K + 2)])
    return _k_cond_sub_modulus(cols[:K], cols[K], n_rows)


def _k_add(rows_a, rows_b, n_rows):
    cols = [ai + bi for ai, bi in zip(rows_a, rows_b)]
    rows, carry = _k_carry_normalize(cols)
    return _k_cond_sub_modulus(rows, carry, n_rows)


def _k_sub(rows_a, rows_b, n_rows):
    d, borrow = _k_sub_rows(rows_a, rows_b)
    mask = borrow.astype(jnp.bool_)
    cols = [di + jnp.where(mask, ni, 0) for di, ni in zip(d, n_rows)]
    rows, _ = _k_carry_normalize(cols)
    return rows


def _rows_of(ref, K):
    return [ref[i, :] for i in range(K)]


# -----------------------------------------------------------------------------
# pallas_call plumbing
# -----------------------------------------------------------------------------


def _consts(spec: FieldSpec):
    """Modulus rows (K, LANE_BLOCK) + n0 (1, 1) as kernel inputs."""
    n = np.broadcast_to(
        spec.modulus_limbs.astype(np.uint32)[:, None], (spec.num_limbs, lane_block())
    )
    return jnp.asarray(np.ascontiguousarray(n)), jnp.full((1, 1), spec.n0_inv,
                                                          dtype=jnp.uint32)


def _blockify(spec: FieldSpec, arrays):
    """Flatten (K, *batch) -> (K, N) padded to a LANE_BLOCK multiple."""
    K = spec.num_limbs
    batch_shape = arrays[0].shape[1:]
    flats = [a.reshape(K, -1) for a in arrays]
    n = flats[0].shape[-1]
    pad = (-n) % lane_block()
    if pad:
        flats = [jnp.pad(a, ((0, 0), (0, pad))) for a in flats]
    return flats, n, batch_shape


def _unblockify(spec: FieldSpec, out, n, batch_shape):
    return out[:, :n].reshape((spec.num_limbs,) + batch_shape)


def _specs(K: int, n_in: int):
    """Block specs: n_in data blocks + modulus block + n0 scalar."""
    data = pl.BlockSpec((K, lane_block()), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    nblk = pl.BlockSpec((K, lane_block()), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    n0blk = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return [data] * n_in + [nblk, n0blk], data


# Width-canonical jitted pallas entries, cached per (op, limb count):
# flattening/padding happens OUTSIDE the jit, so every batch shape with
# the same element count shares one trace + Mosaic lowering.  (The NTT
# calls the butterfly at log2(n) different stage shapes; shape-keyed
# jits re-traced the limb pipeline for each, dominating NTT cold start.)
_FLAT_RUNS: dict = {}


def _flat_run(spec: FieldSpec, op: str, kernel_builder, n_in: int,
              n_out: int = 1):
    key = (op, spec.num_limbs, spec.modulus)
    fn = _FLAT_RUNS.get(key)
    if fn is not None:
        return fn
    K = spec.num_limbs
    kernel = kernel_builder(K)

    @jax.jit
    def fn(*flats):
        grid = flats[0].shape[-1] // lane_block()
        in_specs, data = _specs(K, len(flats))
        ncol, n0 = _consts(spec)
        shape = jax.ShapeDtypeStruct(flats[0].shape, jnp.uint32)
        return pl.pallas_call(
            kernel,
            out_shape=shape if n_out == 1 else (shape,) * n_out,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=data if n_out == 1 else (data,) * n_out,
            interpret=_interpret(),
        )(*flats, ncol, n0)

    def entry(*flats):
        from . import aot

        return aot.dispatch(f"f{K}_{op}_b{lane_block()}", fn, flats)

    _FLAT_RUNS[key] = entry
    return entry


def _run(spec: FieldSpec, op: str, kernel_builder, arrays, n_out: int = 1):
    flats, n, batch_shape = _blockify(spec, arrays)
    out = _flat_run(spec, op, kernel_builder, len(flats), n_out)(*flats)
    if n_out == 1:
        return _unblockify(spec, out, n, batch_shape)
    return tuple(_unblockify(spec, o, n, batch_shape) for o in out)


def _build_mul_kernel(K):
    def kernel(a_ref, b_ref, n_ref, n0_ref, o_ref):
        rows = _k_mont_mul(K, _rows_of(a_ref, K), _rows_of(b_ref, K),
                           _rows_of(n_ref, K), n0_ref[0, 0])
        for i in range(K):
            o_ref[i, :] = rows[i]

    return kernel


def _build_sqr_kernel(K):
    def kernel(a_ref, n_ref, n0_ref, o_ref):
        rows = _k_mont_sqr(K, _rows_of(a_ref, K), _rows_of(n_ref, K),
                           n0_ref[0, 0])
        for i in range(K):
            o_ref[i, :] = rows[i]

    return kernel


def _build_add_kernel(K):
    def kernel(a_ref, b_ref, n_ref, n0_ref, o_ref):
        rows = _k_add(_rows_of(a_ref, K), _rows_of(b_ref, K),
                      _rows_of(n_ref, K))
        for i in range(K):
            o_ref[i, :] = rows[i]

    return kernel


def _build_sub_kernel(K):
    def kernel(a_ref, b_ref, n_ref, n0_ref, o_ref):
        rows = _k_sub(_rows_of(a_ref, K), _rows_of(b_ref, K),
                      _rows_of(n_ref, K))
        for i in range(K):
            o_ref[i, :] = rows[i]

    return kernel


def _build_butterfly_kernel(K):
    def kernel(e_ref, o_ref, w_ref, n_ref, n0_ref, hi_ref, lo_ref):
        n_rows = _rows_of(n_ref, K)
        t = _k_mont_mul(K, _rows_of(o_ref, K), _rows_of(w_ref, K),
                        n_rows, n0_ref[0, 0])
        e = _rows_of(e_ref, K)
        hi = _k_add(e, t, n_rows)
        lo = _k_sub(e, t, n_rows)
        for i in range(K):
            hi_ref[i, :] = hi[i]
            lo_ref[i, :] = lo[i]

    return kernel


def mont_mul(spec: FieldSpec, a, b):
    """Pallas Montgomery product; same contract as ops.mont_mul."""
    return _run(spec, "mul", _build_mul_kernel, (a, b))


def mont_sqr(spec: FieldSpec, a):
    return _run(spec, "sqr", _build_sqr_kernel, (a,))


def add(spec: FieldSpec, a, b):
    return _run(spec, "add", _build_add_kernel, (a, b))


def sub(spec: FieldSpec, a, b):
    return _run(spec, "sub", _build_sub_kernel, (a, b))


def butterfly(spec: FieldSpec, even, odd, w):
    """Fused NTT butterfly: (even + w*odd, even - w*odd) in one kernel.

    The TPU counterpart of the reference's fused butterfly kernels
    (ntt_kernels.cu:498-574): one VMEM round-trip for three field ops.
    """
    return _run(spec, "butterfly", _build_butterfly_kernel, (even, odd, w),
                n_out=2)
