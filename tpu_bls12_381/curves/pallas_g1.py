"""Fused G1 group-law Pallas kernels (the MSM hot loop).

Two families, each fully fused in VMEM (one kernel instead of ~30
separate XLA ops with intermediate HBM traffic):

* **Projective RCB16** (``pmadd``/``padd``/``pdbl``) — the production
  MSM accumulator: complete straight-line formulas, 11-12 Fq muls per
  add with no doubling fallback (curves/projective.py).
* **Jacobian** (``madd``/``jadd``/``jdbl``) — the reference-style
  complete-with-cmov formulas (madd-2007-bl + dbl-2009-l fallback),
  kept for the Jacobian public representation and scalar_mul.

Semantics are bit-identical to the generic adapter paths; tests assert
this on-device.  TPU counterpart of ``g1_add_mixed``/``g1_add``/
``g1_double`` (point.cuh:610-915) as used by the bucket-accumulation
kernels (msm_kernels.cu:268-366).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FQ
from ..fields.pallas_ops import (
    _interpret,
    _k_add,
    _k_carry_normalize,
    _k_cond_sub_modulus,
    _k_mont_mul,
    _k_mont_sqr,
    _k_sub,
    _k_sub_rows,
    lane_block,
)

K = FQ.num_limbs


def _g1_block() -> int:
    """Lane block for the fused group-law kernels.

    The CIOS limb pipeline keeps a stacked (K+2, L) accumulator plus
    operand/modulus stacks live through the formula; at the field-op
    block of 2048 lanes the 11-mul RCB16 madd kernel needs ~19 MB of
    scoped VMEM (> the 16 MB limit).  1024 lanes halves the footprint
    and the grid doubles — per-block overhead is noise at MSM sizes."""
    return min(lane_block(), 1024)


def _flat3(arrs, masks=()):
    """Flatten (K, *batch) coords + (*batch,) masks to lane-block-padded
    (K, W) / (1, W) canonical forms; returns (data, masks, n, batch_shape).

    Runs OUTSIDE the jitted pallas entry so that every batch shape with
    the same element count shares one trace + Mosaic lowering of the
    kernel — batch-shape-keyed jits re-traced the whole unrolled limb
    pipeline per caller shape, which dominated MSM cold start."""
    batch_shape = arrs[0].shape[1:]
    flat = [a.reshape(K, -1) for a in arrs]
    n = flat[0].shape[-1]
    pad = (-n) % _g1_block()
    if pad:
        flat = [jnp.pad(a, ((0, 0), (0, pad))) for a in flat]
    ms = []
    for m in masks:
        m2 = m.reshape(1, -1).astype(jnp.uint32)
        if pad:
            m2 = jnp.pad(m2, ((0, 0), (0, pad)))
        ms.append(m2)
    return flat, ms, n, batch_shape


def _unflat3(outs, n, batch_shape):
    return tuple(c[:, :n].reshape((K,) + batch_shape) for c in outs)


def _make_flat_call(kernel, n_data: int, n_mask: int, with_one: bool = False):
    """Width-canonical jitted pallas_call for a 3-coordinate-out kernel.

    Kernel argument order: n_data coordinate blocks (K, W), n_mask mask
    blocks (1, W), then the constants (modulus column, n0, optionally
    the Montgomery one)."""

    @jax.jit
    def call(*arrs):
        width = arrs[0].shape[-1]
        data = pl.BlockSpec((K, _g1_block()), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, _g1_block()), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((K, _g1_block()), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        n0spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
        ncol, n0, one = _consts()
        consts = [ncol, n0] + ([one] if with_one else [])
        cspecs = [cspec, n0spec] + ([cspec] if with_one else [])
        shape = jax.ShapeDtypeStruct((K, width), jnp.uint32)
        return pl.pallas_call(
            kernel,
            out_shape=(shape, shape, shape),
            grid=(width // _g1_block(),),
            in_specs=[data] * n_data + [mspec] * n_mask + cspecs,
            out_specs=(data, data, data),
            interpret=_interpret(),
        )(*arrs, *consts)

    def entry(*arrs):
        from ..fields import aot

        return aot.dispatch(f"g1_{kernel.__name__}_b{_g1_block()}",
                            call, arrs)

    return entry


def _k_is_zero(rows):
    acc = rows[0] == 0
    for r in rows[1:]:
        acc = acc & (r == 0)
    return acc


def _k_cmov(mask, a_rows, b_rows):
    return [jnp.where(mask, a, b) for a, b in zip(a_rows, b_rows)]


def _k_dbl(n_rows, n0, X, Y, Z):
    """dbl-2009-l (a=0) on limb rows; complete for Z=0."""
    mul = lambda a, b: _k_mont_mul(K, a, b, n_rows, n0)
    sqr = lambda a: _k_mont_sqr(K, a, n_rows, n0)
    add = lambda a, b: _k_add(a, b, n_rows)
    sub = lambda a, b: _k_sub(a, b, n_rows)
    A = sqr(X)
    B = sqr(Y)
    C = sqr(B)
    D = sub(sub(sqr(add(X, B)), A), C)
    D = add(D, D)
    E = add(add(A, A), A)
    G = sqr(E)
    X3 = sub(G, add(D, D))
    C8 = add(C, C)
    C8 = add(C8, C8)
    C8 = add(C8, C8)
    Y3 = sub(mul(E, sub(D, X3)), C8)
    Z3 = mul(add(Y, Y), Z)
    return X3, Y3, Z3


def _dbl_kernel(x1_ref, y1_ref, z1_ref, n_ref, n0_ref,
                x3_ref, y3_ref, z3_ref):
    n_rows = [n_ref[i, :] for i in range(K)]
    n0 = n0_ref[0, 0]
    X = [x1_ref[i, :] for i in range(K)]
    Y = [y1_ref[i, :] for i in range(K)]
    Z = [z1_ref[i, :] for i in range(K)]
    X3, Y3, Z3 = _k_dbl(n_rows, n0, X, Y, Z)
    for i in range(K):
        x3_ref[i, :] = X3[i]
        y3_ref[i, :] = Y3[i]
        z3_ref[i, :] = Z3[i]


_jdbl_flat = _make_flat_call(_dbl_kernel, 3, 0)


def jdbl(P):
    """Fused G1 Jacobian doubling; same contract as points.jac_double
    (dbl-2009-l is complete for Z = 0, point.cuh:610-666 analog)."""
    arrs, _, n, bs = _flat3(list(P))
    return _unflat3(_jdbl_flat(*arrs), n, bs)


def _madd_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, inf2_ref,
                 n_ref, n0_ref, one_ref, x3_ref, y3_ref, z3_ref):
    n_rows = [n_ref[i, :] for i in range(K)]
    one_rows = [one_ref[i, :] for i in range(K)]  # Montgomery 1
    n0 = n0_ref[0, 0]
    X1 = [x1_ref[i, :] for i in range(K)]
    Y1 = [y1_ref[i, :] for i in range(K)]
    Z1 = [z1_ref[i, :] for i in range(K)]
    x2 = [x2_ref[i, :] for i in range(K)]
    y2 = [y2_ref[i, :] for i in range(K)]
    inf2 = inf2_ref[0, :] != 0

    mul = lambda a, b: _k_mont_mul(K, a, b, n_rows, n0)
    sqr = lambda a: _k_mont_sqr(K, a, n_rows, n0)
    add = lambda a, b: _k_add(a, b, n_rows)
    sub = lambda a, b: _k_sub(a, b, n_rows)

    Z1Z1 = sqr(Z1)
    U2 = mul(x2, Z1Z1)
    S2 = mul(mul(y2, Z1), Z1Z1)
    H = sub(U2, X1)
    HH = sqr(H)
    I = add(HH, HH)
    I = add(I, I)
    J = mul(H, I)
    rr = sub(S2, Y1)
    r = add(rr, rr)
    V = mul(X1, I)
    X3 = sub(sub(sqr(r), J), add(V, V))
    YJ = mul(Y1, J)
    Y3 = sub(mul(r, sub(V, X3)), add(YJ, YJ))
    Z1H = add(Z1, H)
    Z3 = sub(sub(sqr(Z1H), Z1Z1), HH)

    # edge-case selection (same order as points.jac_add_affine)
    idP = _k_is_zero(Z1)
    x_eq = _k_is_zero(H) & ~idP & ~inf2
    y_eq = _k_is_zero(rr)
    dX, dY, dZ = _k_dbl(n_rows, n0, X1, Y1, Z1)
    same = x_eq & y_eq
    X3 = _k_cmov(same, dX, X3)
    Y3 = _k_cmov(same, dY, Y3)
    Z3 = _k_cmov(same, dZ, Z3)
    inv_pt = x_eq & ~y_eq  # P == -A -> identity (1 : 1 : 0)
    zero_rows = [jnp.zeros_like(X1[0]) for _ in range(K)]
    X3 = _k_cmov(inv_pt, one_rows, X3)
    Y3 = _k_cmov(inv_pt, one_rows, Y3)
    Z3 = _k_cmov(inv_pt, zero_rows, Z3)
    promote = idP & ~inf2  # identity + A -> (x2 : y2 : 1)
    X3 = _k_cmov(promote, x2, X3)
    Y3 = _k_cmov(promote, y2, Y3)
    Z3 = _k_cmov(promote, one_rows, Z3)
    X3 = _k_cmov(inf2, X1, X3)
    Y3 = _k_cmov(inf2, Y1, Y3)
    Z3 = _k_cmov(inf2, Z1, Z3)

    for i in range(K):
        x3_ref[i, :] = X3[i]
        y3_ref[i, :] = Y3[i]
        z3_ref[i, :] = Z3[i]


def _consts():
    n = np.broadcast_to(FQ.modulus_limbs.astype(np.uint32)[:, None],
                        (K, lane_block()))
    one = np.broadcast_to(FQ.one_mont_limbs.astype(np.uint32)[:, None],
                          (K, lane_block()))
    return (jnp.asarray(np.ascontiguousarray(n)),
            jnp.full((1, 1), FQ.n0_inv, dtype=jnp.uint32),
            jnp.asarray(np.ascontiguousarray(one)))


def _add_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                n_ref, n0_ref, one_ref, x3_ref, y3_ref, z3_ref):
    """Full Jacobian add (add-2007-bl) with complete edge handling —
    the fused counterpart of points.jac_add (point.cuh:679-792 analog)."""
    n_rows = [n_ref[i, :] for i in range(K)]
    one_rows = [one_ref[i, :] for i in range(K)]
    n0 = n0_ref[0, 0]
    X1 = [x1_ref[i, :] for i in range(K)]
    Y1 = [y1_ref[i, :] for i in range(K)]
    Z1 = [z1_ref[i, :] for i in range(K)]
    X2 = [x2_ref[i, :] for i in range(K)]
    Y2 = [y2_ref[i, :] for i in range(K)]
    Z2 = [z2_ref[i, :] for i in range(K)]

    mul = lambda a, b: _k_mont_mul(K, a, b, n_rows, n0)
    sqr = lambda a: _k_mont_sqr(K, a, n_rows, n0)
    add = lambda a, b: _k_add(a, b, n_rows)
    sub = lambda a, b: _k_sub(a, b, n_rows)

    Z1Z1 = sqr(Z1)
    Z2Z2 = sqr(Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(mul(Y1, Z2), Z2Z2)
    S2 = mul(mul(Y2, Z1), Z1Z1)
    H = sub(U2, U1)
    H2 = add(H, H)
    I = sqr(H2)
    J = mul(H, I)
    rr = sub(S2, S1)
    r = add(rr, rr)
    V = mul(U1, I)
    X3 = sub(sub(sqr(r), J), add(V, V))
    SJ = mul(S1, J)
    Y3 = sub(mul(r, sub(V, X3)), add(SJ, SJ))
    ZZ = add(Z1, Z2)
    Z3 = mul(sub(sub(sqr(ZZ), Z1Z1), Z2Z2), H)

    idP = _k_is_zero(Z1)
    idQ = _k_is_zero(Z2)
    x_eq = _k_is_zero(H) & ~idP & ~idQ
    y_eq = _k_is_zero(rr)
    dX, dY, dZ = _k_dbl(n_rows, n0, X1, Y1, Z1)
    same = x_eq & y_eq
    X3 = _k_cmov(same, dX, X3)
    Y3 = _k_cmov(same, dY, Y3)
    Z3 = _k_cmov(same, dZ, Z3)
    inv_pt = x_eq & ~y_eq
    zero_rows = [jnp.zeros_like(X1[0]) for _ in range(K)]
    X3 = _k_cmov(inv_pt, one_rows, X3)
    Y3 = _k_cmov(inv_pt, one_rows, Y3)
    Z3 = _k_cmov(inv_pt, zero_rows, Z3)
    X3 = _k_cmov(idP, X2, X3)
    Y3 = _k_cmov(idP, Y2, Y3)
    Z3 = _k_cmov(idP, Z2, Z3)
    X3 = _k_cmov(idQ, X1, X3)
    Y3 = _k_cmov(idQ, Y1, Y3)
    Z3 = _k_cmov(idQ, Z1, Z3)

    for i in range(K):
        x3_ref[i, :] = X3[i]
        y3_ref[i, :] = Y3[i]
        z3_ref[i, :] = Z3[i]


_jadd_flat = _make_flat_call(_add_kernel, 6, 0, with_one=True)


def jadd(P, Q):
    """Fused G1 Jacobian + Jacobian addition; same contract as
    points.jac_add(FQ_ADAPTER, P, Q)."""
    Qb = jax.tree_util.tree_map(
        lambda c: jnp.broadcast_to(c, P[0].shape), Q)
    arrs, _, n, bs = _flat3([*P, *Qb])
    return _unflat3(_jadd_flat(*arrs), n, bs)


# -----------------------------------------------------------------------------
# Complete homogeneous-projective kernels (RCB16; see curves/projective.py).
# These are the production MSM hot loop: no doubling fallback, no edge-case
# chains — one straight-line formula per kernel.
# -----------------------------------------------------------------------------


def _k_mul12(rows, n_rows):
    """12a via double/add chains (3b for G1's b = 4); stays reduced."""
    t = _k_add(_k_add(rows, rows, n_rows), rows, n_rows)  # 3a
    t = _k_add(t, t, n_rows)
    return _k_add(t, t, n_rows)


def _k_proj_add(n_rows, n0, X1, Y1, Z1, X2, Y2, Z2):
    """RCB16 algorithm 7 (a=0): complete add on limb rows, 12M + 2*mul12."""
    mul = lambda a, b: _k_mont_mul(K, a, b, n_rows, n0)
    add = lambda a, b: _k_add(a, b, n_rows)
    sub = lambda a, b: _k_sub(a, b, n_rows)
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(mul(add(X1, Y1), add(X2, Y2)), add(t0, t1))
    t4 = sub(mul(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))
    ty = sub(mul(add(X1, Z1), add(X2, Z2)), add(t0, t2))
    t0_3 = add(add(t0, t0), t0)
    t2 = _k_mul12(t2, n_rows)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = _k_mul12(ty, n_rows)
    X3_out = sub(mul(t3, t1), mul(t4, Y3))
    Y3_out = add(mul(t1, Z3), mul(Y3, t0_3))
    Z3_out = add(mul(Z3, t4), mul(t0_3, t3))
    return X3_out, Y3_out, Z3_out


def _k_proj_madd(n_rows, n0, X1, Y1, Z1, x2, y2, inf2):
    """RCB16 algorithm 8 (a=0, Z2=1): complete mixed add, 11M + 2*mul12.

    ``inf2`` selects P through (affine can't encode the identity)."""
    mul = lambda a, b: _k_mont_mul(K, a, b, n_rows, n0)
    add = lambda a, b: _k_add(a, b, n_rows)
    sub = lambda a, b: _k_sub(a, b, n_rows)
    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    t3 = sub(mul(add(X1, Y1), add(x2, y2)), add(t0, t1))
    t4 = add(mul(x2, Z1), X1)
    t5 = add(mul(y2, Z1), Y1)
    t0_3 = add(add(t0, t0), t0)
    t2 = _k_mul12(Z1, n_rows)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = _k_mul12(t4, n_rows)
    X3_out = sub(mul(t3, t1), mul(t5, Y3))
    Y3_out = add(mul(t1, Z3), mul(Y3, t0_3))
    Z3_out = add(mul(Z3, t5), mul(t0_3, t3))
    X3_out = _k_cmov(inf2, X1, X3_out)
    Y3_out = _k_cmov(inf2, Y1, Y3_out)
    Z3_out = _k_cmov(inf2, Z1, Z3_out)
    return X3_out, Y3_out, Z3_out


def _k_proj_dbl(n_rows, n0, X, Y, Z):
    """RCB16 algorithm 9 (a=0): complete doubling, 6M + 2S + mul12."""
    mul = lambda a, b: _k_mont_mul(K, a, b, n_rows, n0)
    sqr = lambda a: _k_mont_sqr(K, a, n_rows, n0)
    add = lambda a, b: _k_add(a, b, n_rows)
    sub = lambda a, b: _k_sub(a, b, n_rows)
    t0 = sqr(Y)
    Z3 = add(add(add(t0, t0), add(t0, t0)), add(add(t0, t0), add(t0, t0)))
    t1 = mul(Y, Z)
    t2 = _k_mul12(sqr(Z), n_rows)
    X3 = mul(t2, Z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, Z3)
    t2 = add(add(t2, t2), t2)
    t0 = sub(t0, t2)
    Y3 = add(mul(t0, Y3), X3)
    XY = mul(X, Y)
    t = mul(t0, XY)
    X3 = add(t, t)
    return X3, Y3, Z3


def _pmadd_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, inf2_ref,
                  n_ref, n0_ref, x3_ref, y3_ref, z3_ref):
    n_rows = [n_ref[i, :] for i in range(K)]
    n0 = n0_ref[0, 0]
    X1 = [x1_ref[i, :] for i in range(K)]
    Y1 = [y1_ref[i, :] for i in range(K)]
    Z1 = [z1_ref[i, :] for i in range(K)]
    x2 = [x2_ref[i, :] for i in range(K)]
    y2 = [y2_ref[i, :] for i in range(K)]
    inf2 = inf2_ref[0, :] != 0
    X3, Y3, Z3 = _k_proj_madd(n_rows, n0, X1, Y1, Z1, x2, y2, inf2)
    for i in range(K):
        x3_ref[i, :] = X3[i]
        y3_ref[i, :] = Y3[i]
        z3_ref[i, :] = Z3[i]


def _pmadd_signed_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, inf2_ref,
                         sign_ref, n_ref, n0_ref, x3_ref, y3_ref, z3_ref):
    """pmadd with the digit-sign negation of y2 folded in (MSM scan hot
    loop: saves the separate neg+select HBM passes)."""
    n_rows = [n_ref[i, :] for i in range(K)]
    n0 = n0_ref[0, 0]
    X1 = [x1_ref[i, :] for i in range(K)]
    Y1 = [y1_ref[i, :] for i in range(K)]
    Z1 = [z1_ref[i, :] for i in range(K)]
    x2 = [x2_ref[i, :] for i in range(K)]
    y2 = [y2_ref[i, :] for i in range(K)]
    inf2 = inf2_ref[0, :] != 0
    sign = sign_ref[0, :] != 0
    zero = [jnp.zeros_like(y) for y in y2]
    y2n = _k_sub(zero, y2, n_rows)  # 0 - y = p - y (0 stays 0)
    y2 = _k_cmov(sign, y2n, y2)
    X3, Y3, Z3 = _k_proj_madd(n_rows, n0, X1, Y1, Z1, x2, y2, inf2)
    for i in range(K):
        x3_ref[i, :] = X3[i]
        y3_ref[i, :] = Y3[i]
        z3_ref[i, :] = Z3[i]


_pmadd_signed_flat = _make_flat_call(_pmadd_signed_kernel, 5, 2)


def pmadd_signed(P, A, sign):
    """Fused projective + (+-affine) addition: adds A where sign is False,
    -A where True (projective.proj_add_mixed_signed_fast contract)."""
    X1, Y1, Z1 = P
    x2, y2, inf2 = A
    arrs, ms, n, bs = _flat3([X1, Y1, Z1, x2, y2], [inf2, sign])
    return _unflat3(_pmadd_signed_flat(*arrs, *ms), n, bs)


def _padd_kernel(x1_ref, y1_ref, z1_ref, x2_ref, y2_ref, z2_ref,
                 n_ref, n0_ref, x3_ref, y3_ref, z3_ref):
    n_rows = [n_ref[i, :] for i in range(K)]
    n0 = n0_ref[0, 0]
    P1 = [[r[i, :] for i in range(K)] for r in (x1_ref, y1_ref, z1_ref)]
    P2 = [[r[i, :] for i in range(K)] for r in (x2_ref, y2_ref, z2_ref)]
    X3, Y3, Z3 = _k_proj_add(n_rows, n0, *P1, *P2)
    for i in range(K):
        x3_ref[i, :] = X3[i]
        y3_ref[i, :] = Y3[i]
        z3_ref[i, :] = Z3[i]


def _pdbl_kernel(x1_ref, y1_ref, z1_ref, n_ref, n0_ref,
                 x3_ref, y3_ref, z3_ref):
    n_rows = [n_ref[i, :] for i in range(K)]
    n0 = n0_ref[0, 0]
    X = [x1_ref[i, :] for i in range(K)]
    Y = [y1_ref[i, :] for i in range(K)]
    Z = [z1_ref[i, :] for i in range(K)]
    X3, Y3, Z3 = _k_proj_dbl(n_rows, n0, X, Y, Z)
    for i in range(K):
        x3_ref[i, :] = X3[i]
        y3_ref[i, :] = Y3[i]
        z3_ref[i, :] = Z3[i]


_pmadd_flat = _make_flat_call(_pmadd_kernel, 5, 1)


def pmadd(P, A):
    """Fused complete projective + affine addition (projective.proj_add_mixed
    contract)."""
    X1, Y1, Z1 = P
    x2, y2, inf2 = A
    arrs, ms, n, bs = _flat3([X1, Y1, Z1, x2, y2], [inf2])
    return _unflat3(_pmadd_flat(*arrs, *ms), n, bs)


_padd_flat = _make_flat_call(_padd_kernel, 6, 0)


def padd(P, Q):
    """Fused complete projective + projective addition (projective.proj_add
    contract)."""
    Qb = jax.tree_util.tree_map(
        lambda c: jnp.broadcast_to(c, P[0].shape), Q)
    arrs, _, n, bs = _flat3([*P, *Qb])
    return _unflat3(_padd_flat(*arrs), n, bs)


_pdbl_flat = _make_flat_call(_pdbl_kernel, 3, 0)


def pdbl(P):
    """Fused complete projective doubling (projective.proj_double contract)."""
    arrs, _, n, bs = _flat3(list(P))
    return _unflat3(_pdbl_flat(*arrs), n, bs)


_madd_flat = _make_flat_call(_madd_kernel, 5, 1, with_one=True)


def madd(P, A):
    """Fused G1 Jacobian + affine addition; same contract as
    points.jac_add_affine(FQ_ADAPTER, P, A)."""
    X1, Y1, Z1 = P
    x2, y2, inf2 = A
    arrs, ms, n, bs = _flat3([X1, Y1, Z1, x2, y2], [inf2])
    return _unflat3(_madd_flat(*arrs, *ms), n, bs)
