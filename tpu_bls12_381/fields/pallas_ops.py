"""Pallas TPU kernels for the hot field ops.

The pure-jnp ops in ``ops.py`` are correct and fully fused only at XLA's
discretion; these kernels pin the whole limb pipeline (multiply ->
deferred-carry accumulate -> REDC -> conditional subtract, ~150 vector
ops per element) into VMEM so no intermediate ever round-trips HBM.
Block shape: the natural (K, BN) limbs-first tile — K (16/24) rides the
sublane dimension, BN lanes (multiple of 128) ride the vector lanes; one
grid step processes BN field elements.

Bit-exactness: kernels call the *same* traced limb algorithm
(ops.mont_mul_impl etc.), so Pallas-vs-jnp equality is structural, and
tests assert it anyway.  On non-TPU backends the kernels run in Pallas
interpret mode (slow, for CI parity).

Reference analog: these play the role of field.cuh's device functions
(CIOS multiply field.cuh:509-576) as *standalone* bulk kernels — the
vecops entry points (vec_ops.cu:63-150).  Group-law composites (MSM/NTT
inner loops) still go through XLA, which fuses them with their
neighbors; the kernels here are for the pure elementwise layer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import ops
from .field import FieldSpec

LANE_BLOCK = 512  # elements per grid step; K*BN*4B*3 buffers ~ 150 KB VMEM


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _blockify(spec: FieldSpec, arrays):
    """Flatten (K, *batch) -> (K, N) padded to a LANE_BLOCK multiple."""
    K = spec.num_limbs
    batch_shape = arrays[0].shape[1:]
    flats = [a.reshape(K, -1) for a in arrays]
    n = flats[0].shape[-1]
    pad = (-n) % LANE_BLOCK
    if pad:
        flats = [jnp.pad(a, ((0, 0), (0, pad))) for a in flats]
    return flats, n, batch_shape


def _unblockify(spec: FieldSpec, out, n, batch_shape):
    return out[:, :n].reshape((spec.num_limbs,) + batch_shape)


def _binary_kernel(spec: FieldSpec, impl):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = impl(spec, a_ref[:, :], b_ref[:, :])

    return kernel


def _call_binary(spec: FieldSpec, impl, a, b):
    (af, bf), n, batch_shape = _blockify(spec, (a, b))
    K = spec.num_limbs
    grid = af.shape[-1] // LANE_BLOCK
    blk = pl.BlockSpec((K, LANE_BLOCK), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _binary_kernel(spec, impl),
        out_shape=jax.ShapeDtypeStruct(af.shape, jnp.uint32),
        grid=(grid,),
        in_specs=[blk, blk],
        out_specs=blk,
        interpret=_interpret(),
    )(af, bf)
    return _unblockify(spec, out, n, batch_shape)


@partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, a, b):
    """Pallas Montgomery product; same contract as ops.mont_mul."""
    return _call_binary(spec, ops.mont_mul_impl, a, b)


@partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a, b):
    return _call_binary(spec, ops.add_unrolled_impl, a, b)


@partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a, b):
    return _call_binary(spec, ops.sub_unrolled_impl, a, b)


@partial(jax.jit, static_argnums=0)
def mont_sqr(spec: FieldSpec, a):
    (af,), n, batch_shape = _blockify(spec, (a,))
    K = spec.num_limbs
    grid = af.shape[-1] // LANE_BLOCK
    blk = pl.BlockSpec((K, LANE_BLOCK), lambda i: (0, i),
                       memory_space=pltpu.VMEM)

    def kernel(a_ref, o_ref):
        o_ref[:, :] = ops.mont_sqr_impl(spec, a_ref[:, :])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(af.shape, jnp.uint32),
        grid=(grid,),
        in_specs=[blk],
        out_specs=blk,
        interpret=_interpret(),
    )(af)
    return _unblockify(spec, out, n, batch_shape)


@partial(jax.jit, static_argnums=0)
def butterfly(spec: FieldSpec, even, odd, w):
    """Fused NTT butterfly: (even + w*odd, even - w*odd) in one kernel.

    The TPU counterpart of the reference's fused butterfly kernels
    (ntt_kernels.cu:498-574): one VMEM round-trip for three field ops.
    """
    (ef, of, wf), n, batch_shape = _blockify(spec, (even, odd, w))
    K = spec.num_limbs
    grid = ef.shape[-1] // LANE_BLOCK
    blk = pl.BlockSpec((K, LANE_BLOCK), lambda i: (0, i),
                       memory_space=pltpu.VMEM)

    def kernel(e_ref, o_ref, w_ref, hi_ref, lo_ref):
        t = ops.mont_mul_impl(spec, o_ref[:, :], w_ref[:, :])
        e = e_ref[:, :]
        hi_ref[:, :] = ops.add_unrolled_impl(spec, e, t)
        lo_ref[:, :] = ops.sub_unrolled_impl(spec, e, t)

    hi, lo = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(ef.shape, jnp.uint32),
                   jax.ShapeDtypeStruct(ef.shape, jnp.uint32)),
        grid=(grid,),
        in_specs=[blk, blk, blk],
        out_specs=(blk, blk),
        interpret=_interpret(),
    )(ef, of, wf)
    return (_unblockify(spec, hi, n, batch_shape),
            _unblockify(spec, lo, n, batch_shape))
