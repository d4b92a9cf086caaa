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


def _k_mont_mul(K, a_rows, b_rows, n_rows, n0):
    """Unrolled schoolbook + word-serial REDC on per-limb row values."""
    t = [jnp.zeros_like(a_rows[0]) for _ in range(2 * K + 1)]
    for i in range(K):
        for j in range(K):
            p = a_rows[i] * b_rows[j]
            t[i + j] = t[i + j] + (p & MASK)
            t[i + j + 1] = t[i + j + 1] + (p >> LIMB_BITS)
    t, _ = _k_carry_normalize(t)
    return _k_redc(K, t, n_rows, n0)


def _k_mont_sqr(K, a_rows, n_rows, n0):
    """Montgomery square exploiting product symmetry: K(K+1)/2 limb muls
    in the product phase instead of K^2 (~23% fewer total with REDC) —
    the same trick as the reference's optimized squaring
    (field.cuh:586-685).  Doubled cross terms stay < 2^17, safely inside
    the deferred-carry uint32 columns (<= K terms per column)."""
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


def _run(spec: FieldSpec, kernel, arrays, n_out: int = 1):
    flats, n, batch_shape = _blockify(spec, arrays)
    K = spec.num_limbs
    grid = flats[0].shape[-1] // lane_block()
    in_specs, data = _specs(K, len(flats))
    ncol, n0 = _consts(spec)
    shape = jax.ShapeDtypeStruct(flats[0].shape, jnp.uint32)
    out = pl.pallas_call(
        kernel,
        out_shape=shape if n_out == 1 else (shape,) * n_out,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=data if n_out == 1 else (data,) * n_out,
        interpret=_interpret(),
    )(*flats, ncol, n0)
    if n_out == 1:
        return _unblockify(spec, out, n, batch_shape)
    return tuple(_unblockify(spec, o, n, batch_shape) for o in out)


@partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a, b):
    """Pallas Montgomery product; same contract as ops.mont_mul."""
    K = spec.num_limbs

    def kernel(a_ref, b_ref, n_ref, n0_ref, o_ref):
        rows = _k_mont_mul(K, _rows_of(a_ref, K), _rows_of(b_ref, K),
                           _rows_of(n_ref, K), n0_ref[0, 0])
        for i in range(K):
            o_ref[i, :] = rows[i]

    return _run(spec, kernel, (a, b))


@partial(jax.jit, static_argnums=0)
def mont_sqr(spec: FieldSpec, a):
    K = spec.num_limbs

    def kernel(a_ref, n_ref, n0_ref, o_ref):
        ar = _rows_of(a_ref, K)
        rows = _k_mont_sqr(K, ar, _rows_of(n_ref, K), n0_ref[0, 0])
        for i in range(K):
            o_ref[i, :] = rows[i]

    return _run(spec, kernel, (a,))


@partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a, b):
    K = spec.num_limbs

    def kernel(a_ref, b_ref, n_ref, n0_ref, o_ref):
        rows = _k_add(_rows_of(a_ref, K), _rows_of(b_ref, K), _rows_of(n_ref, K))
        for i in range(K):
            o_ref[i, :] = rows[i]

    return _run(spec, kernel, (a, b))


@partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a, b):
    K = spec.num_limbs

    def kernel(a_ref, b_ref, n_ref, n0_ref, o_ref):
        rows = _k_sub(_rows_of(a_ref, K), _rows_of(b_ref, K), _rows_of(n_ref, K))
        for i in range(K):
            o_ref[i, :] = rows[i]

    return _run(spec, kernel, (a, b))


@partial(jax.jit, static_argnums=0)
def butterfly(spec: FieldSpec, even, odd, w):
    """Fused NTT butterfly: (even + w*odd, even - w*odd) in one kernel.

    The TPU counterpart of the reference's fused butterfly kernels
    (ntt_kernels.cu:498-574): one VMEM round-trip for three field ops.
    """
    K = spec.num_limbs

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

    return _run(spec, kernel, (even, odd, w), n_out=2)
