"""Fused G2 group-law Pallas kernels: RCB16 complete formulas over Fq2.

The generic G2 path routes every Fq2 operation through separate Fq
kernels (3 muls + adds per Karatsuba multiply), so one projective add
costs ~30 kernel launches with HBM round trips between them.  These
kernels evaluate the whole RCB16 formula — Karatsuba Fq2 arithmetic
included — in VMEM, exactly mirroring pallas_g1's G1 kernels.

An Fq2 element is a (c0, c1) pair of (K, lanes) limb planes (the
adapter convention, field_adapters.Fq2Adapter); a projective point is
((X0,X1), (Y0,Y1), (Z0,Z1)).  G2's curve constant is b' = 4(1+u), so
3b' = 12(1+u): (c0, c1) -> (12(c0 - c1), 12(c0 + c1)).

Reference analog: the G2 operator overloads of point.cuh (Fq2 tower
point.cuh:81-277, G2 group law :948-1271) fused the way the GPU fuses
them — one kernel per group op.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import FQ
from ..fields.pallas_ops import (
    _interpret,
    _k_add,
    _k_mont_mul,
    _k_sub,
)
from .pallas_g1 import _k_cmov

K = FQ.num_limbs

# Fq2 temporaries are twice the size of Fq ones; halve the block to keep
# the ~10 live RCB temporaries comfortably inside VMEM.
G2_LANE_BLOCK = 1024


# -----------------------------------------------------------------------------
# Kernel-level Fq2 arithmetic on (c0_rows, c1_rows) pairs.
# -----------------------------------------------------------------------------


def _k2_add(a, b, n):
    return (_k_add(a[0], b[0], n), _k_add(a[1], b[1], n))


def _k2_sub(a, b, n):
    return (_k_sub(a[0], b[0], n), _k_sub(a[1], b[1], n))


def _k2_mul(a, b, n, n0):
    """Karatsuba: 3 base muls (point.cuh:137-160 analog)."""
    v0 = _k_mont_mul(K, a[0], b[0], n, n0)
    v1 = _k_mont_mul(K, a[1], b[1], n, n0)
    s = _k_mont_mul(K, _k_add(a[0], a[1], n), _k_add(b[0], b[1], n), n, n0)
    return (_k_sub(v0, v1, n), _k_sub(_k_sub(s, v0, n), v1, n))


def _k2_sqr(a, n, n0):
    """Complex squaring over Fq[u]/(u^2+1): 2 base muls instead of 3
    ((a0+a1)(a0-a1), 2*a0*a1 — the point.cuh:175-190 analog)."""
    re = _k_mont_mul(K, _k_add(a[0], a[1], n), _k_sub(a[0], a[1], n), n, n0)
    m = _k_mont_mul(K, a[0], a[1], n, n0)
    return (re, _k_add(m, m, n))


def _k2_mul12(a, n):
    """3b' = 12(1+u): (c0, c1) -> (12(c0-c1), 12(c0+c1))."""

    def m12(rows):
        t = _k_add(_k_add(rows, rows, n), rows, n)  # 3a
        t = _k_add(t, t, n)
        return _k_add(t, t, n)

    return (m12(_k_sub(a[0], a[1], n)), m12(_k_add(a[0], a[1], n)))


def _k2_cmov(mask, a, b):
    return (_k_cmov(mask, a[0], b[0]), _k_cmov(mask, a[1], b[1]))


def _k2_neg(a, n):
    zero = [jnp.zeros_like(r) for r in a[0]]
    return (_k_sub(zero, a[0], n), _k_sub(zero, a[1], n))


# -----------------------------------------------------------------------------
# RCB16 formulas over Fq2 (same structure as pallas_g1's _k_proj_*).
# -----------------------------------------------------------------------------


def _k2_proj_add(n, n0, X1, Y1, Z1, X2, Y2, Z2):
    mul = lambda a, b: _k2_mul(a, b, n, n0)
    add = lambda a, b: _k2_add(a, b, n)
    sub = lambda a, b: _k2_sub(a, b, n)
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(mul(add(X1, Y1), add(X2, Y2)), add(t0, t1))
    t4 = sub(mul(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))
    ty = sub(mul(add(X1, Z1), add(X2, Z2)), add(t0, t2))
    t0_3 = add(add(t0, t0), t0)
    t2 = _k2_mul12(t2, n)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = _k2_mul12(ty, n)
    X3o = sub(mul(t3, t1), mul(t4, Y3))
    Y3o = add(mul(t1, Z3), mul(Y3, t0_3))
    Z3o = add(mul(Z3, t4), mul(t0_3, t3))
    return X3o, Y3o, Z3o


def _k2_proj_madd(n, n0, X1, Y1, Z1, x2, y2, inf2):
    mul = lambda a, b: _k2_mul(a, b, n, n0)
    add = lambda a, b: _k2_add(a, b, n)
    sub = lambda a, b: _k2_sub(a, b, n)
    t0 = mul(X1, x2)
    t1 = mul(Y1, y2)
    t3 = sub(mul(add(X1, Y1), add(x2, y2)), add(t0, t1))
    t4 = add(mul(x2, Z1), X1)
    t5 = add(mul(y2, Z1), Y1)
    t0_3 = add(add(t0, t0), t0)
    t2 = _k2_mul12(Z1, n)
    Z3 = add(t1, t2)
    t1 = sub(t1, t2)
    Y3 = _k2_mul12(t4, n)
    X3o = sub(mul(t3, t1), mul(t5, Y3))
    Y3o = add(mul(t1, Z3), mul(Y3, t0_3))
    Z3o = add(mul(Z3, t5), mul(t0_3, t3))
    X3o = _k2_cmov(inf2, X1, X3o)
    Y3o = _k2_cmov(inf2, Y1, Y3o)
    Z3o = _k2_cmov(inf2, Z1, Z3o)
    return X3o, Y3o, Z3o


def _k2_proj_dbl(n, n0, X, Y, Z):
    mul = lambda a, b: _k2_mul(a, b, n, n0)
    sqr = lambda a: _k2_sqr(a, n, n0)
    add = lambda a, b: _k2_add(a, b, n)
    sub = lambda a, b: _k2_sub(a, b, n)
    t0 = sqr(Y)
    Z3 = add(add(add(t0, t0), add(t0, t0)), add(add(t0, t0), add(t0, t0)))
    t1 = mul(Y, Z)
    t2 = _k2_mul12(sqr(Z), n)
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


# -----------------------------------------------------------------------------
# Kernels + plumbing.  Point components are passed as separate refs:
# [X0 X1 Y0 Y1 Z0 Z1] (+ affine [x0 x1 y0 y1] + masks) + consts.
# -----------------------------------------------------------------------------


def _consts():
    nmat = np.broadcast_to(FQ.modulus_limbs.astype(np.uint32)[:, None],
                           (K, G2_LANE_BLOCK))
    return (jnp.asarray(np.ascontiguousarray(nmat)),
            jnp.full((1, 1), FQ.n0_inv, dtype=jnp.uint32))


def _rows(ref):
    return [ref[i, :] for i in range(K)]


def _pmadd2_kernel(x10, x11, y10, y11, z10, z11, ax0, ax1, ay0, ay1,
                   inf2_ref, sign_ref, n_ref, n0_ref,
                   ox0, ox1, oy0, oy1, oz0, oz1):
    n = _rows(n_ref)
    n0 = n0_ref[0, 0]
    P = ((_rows(x10), _rows(x11)), (_rows(y10), _rows(y11)),
         (_rows(z10), _rows(z11)))
    x2 = (_rows(ax0), _rows(ax1))
    y2 = (_rows(ay0), _rows(ay1))
    inf2 = inf2_ref[0, :] != 0
    sign = sign_ref[0, :] != 0
    y2 = _k2_cmov(sign, _k2_neg(y2, n), y2)
    X3, Y3, Z3 = _k2_proj_madd(n, n0, P[0], P[1], P[2], x2, y2, inf2)
    for i in range(K):
        ox0[i, :] = X3[0][i]
        ox1[i, :] = X3[1][i]
        oy0[i, :] = Y3[0][i]
        oy1[i, :] = Y3[1][i]
        oz0[i, :] = Z3[0][i]
        oz1[i, :] = Z3[1][i]


def _padd2_kernel(x10, x11, y10, y11, z10, z11, x20, x21, y20, y21, z20, z21,
                  n_ref, n0_ref, ox0, ox1, oy0, oy1, oz0, oz1):
    n = _rows(n_ref)
    n0 = n0_ref[0, 0]
    P1 = ((_rows(x10), _rows(x11)), (_rows(y10), _rows(y11)),
          (_rows(z10), _rows(z11)))
    P2 = ((_rows(x20), _rows(x21)), (_rows(y20), _rows(y21)),
          (_rows(z20), _rows(z21)))
    X3, Y3, Z3 = _k2_proj_add(n, n0, *P1, *P2)
    for i in range(K):
        ox0[i, :] = X3[0][i]
        ox1[i, :] = X3[1][i]
        oy0[i, :] = Y3[0][i]
        oy1[i, :] = Y3[1][i]
        oz0[i, :] = Z3[0][i]
        oz1[i, :] = Z3[1][i]


def _pdbl2_kernel(x10, x11, y10, y11, z10, z11, n_ref, n0_ref,
                  ox0, ox1, oy0, oy1, oz0, oz1):
    n = _rows(n_ref)
    n0 = n0_ref[0, 0]
    P = ((_rows(x10), _rows(x11)), (_rows(y10), _rows(y11)),
         (_rows(z10), _rows(z11)))
    X3, Y3, Z3 = _k2_proj_dbl(n, n0, P[0], P[1], P[2])
    for i in range(K):
        ox0[i, :] = X3[0][i]
        ox1[i, :] = X3[1][i]
        oy0[i, :] = Y3[0][i]
        oy1[i, :] = Y3[1][i]
        oz0[i, :] = Z3[0][i]
        oz1[i, :] = Z3[1][i]


def _flatten_fq2(e):
    """Fq2 batch (c0, c1) -> [flat c0, flat c1] (K, N) arrays."""
    return [e[0].reshape(K, -1), e[1].reshape(K, -1)]


_FLAT_CALLS: dict = {}


def _flat_call(kernel, n_data: int, n_mask: int):
    """Width-canonical jitted pallas_call, cached per kernel: flattening
    and padding happen OUTSIDE, so every batch shape with the same
    element count shares one trace + Mosaic lowering (batch-shape-keyed
    jits re-traced the whole limb pipeline per caller shape)."""
    key = (kernel, n_data, n_mask)
    fn = _FLAT_CALLS.get(key)
    if fn is not None:
        return fn

    @jax.jit
    def call(*arrs):
        width = arrs[0].shape[-1]
        data = pl.BlockSpec((K, G2_LANE_BLOCK), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, G2_LANE_BLOCK), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((K, G2_LANE_BLOCK), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        n0spec = pl.BlockSpec((1, 1), lambda i: (0, 0),
                              memory_space=pltpu.SMEM)
        ncol, n0 = _consts()
        shape = jax.ShapeDtypeStruct((K, width), jnp.uint32)
        return pl.pallas_call(
            kernel,
            out_shape=(shape,) * 6,
            grid=(width // G2_LANE_BLOCK,),
            in_specs=[data] * n_data + [mspec] * n_mask + [cspec, n0spec],
            out_specs=(data,) * 6,
            interpret=_interpret(),
        )(*arrs, ncol, n0)

    def entry(*arrs):
        from ..fields import aot

        return aot.dispatch(f"g2_{kernel.__name__}_b{G2_LANE_BLOCK}",
                            call, arrs)

    _FLAT_CALLS[key] = entry
    return entry


def _call(kernel, point_arrs, mask_arrs, batch_shape, n):
    """Shared plumbing: pad outside, run the width-canonical jit, unpad."""
    pad = (-n) % G2_LANE_BLOCK
    if pad:
        point_arrs = [jnp.pad(c, ((0, 0), (0, pad))) for c in point_arrs]
        mask_arrs = [jnp.pad(m, ((0, 0), (0, pad))) for m in mask_arrs]
    outs = _flat_call(kernel, len(point_arrs), len(mask_arrs))(
        *point_arrs, *mask_arrs)
    unflat = lambda c: c[:, :n].reshape((K,) + batch_shape)
    o = [unflat(c) for c in outs]
    return ((o[0], o[1]), (o[2], o[3]), (o[4], o[5]))


def pmadd2(P, A, sign=None):
    """Fused G2 projective + (+-affine) addition (proj_add_mixed contract;
    ``sign`` lanes add -A)."""
    X, Y, Z = P
    x2, y2, inf2 = A
    batch_shape = X[0].shape[1:]
    n = X[0].reshape(K, -1).shape[-1]
    pts = (_flatten_fq2(X) + _flatten_fq2(Y) + _flatten_fq2(Z)
           + _flatten_fq2(x2) + _flatten_fq2(y2))
    m2 = inf2.reshape(1, -1).astype(jnp.uint32)
    if sign is None:
        sg = jnp.zeros_like(m2)
    else:
        sg = sign.reshape(1, -1).astype(jnp.uint32)
    return _call(_pmadd2_kernel, pts, [m2, sg], batch_shape, n)


def padd2(P, Q):
    """Fused G2 projective + projective addition (proj_add contract)."""
    batch_shape = P[0][0].shape[1:]
    n = P[0][0].reshape(K, -1).shape[-1]
    Qb = jax.tree_util.tree_map(
        lambda c: jnp.broadcast_to(c, P[0][0].shape), Q)
    pts = []
    for comp in (*P, *Qb):
        pts += _flatten_fq2(comp)
    return _call(_padd2_kernel, pts, [], batch_shape, n)


def pdbl2(P):
    """Fused G2 projective doubling (proj_double contract)."""
    batch_shape = P[0][0].shape[1:]
    n = P[0][0].reshape(K, -1).shape[-1]
    pts = _flatten_fq2(P[0]) + _flatten_fq2(P[1]) + _flatten_fq2(P[2])
    return _call(_pdbl2_kernel, pts, [], batch_shape, n)


# (no whole-wrapper jit: the flatten/pad prologues stay in the caller's
# trace and the pallas entry itself is the width-canonical _flat_call)
