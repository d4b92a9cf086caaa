"""G2: y^2 = x^3 + 4(1+u) over Fq2 — constants and host<->device converters."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants
from ..fields import FQ
from ..fields.limbs import int_to_limbs, ints_to_limbs, limbs_to_ints
from .field_adapters import FQ2_ADAPTER
from . import points

F = FQ2_ADAPTER

_B0 = int_to_limbs(FQ.to_mont(constants.G2_B[0]), FQ.num_limbs)
_B1 = int_to_limbs(FQ.to_mont(constants.G2_B[1]), FQ.num_limbs)


def b_mont(batch_shape=()):
    from ..fields import ops

    return (
        ops.broadcast_constant(FQ, _B0, batch_shape),
        ops.broadcast_constant(FQ, _B1, batch_shape),
    )


def affine_from_ints(pts):
    """List of ((x0,x1),(y0,y1)) int pairs or None -> Fq2 affine batch."""
    x0 = [FQ.to_mont(p[0][0]) if p is not None else 0 for p in pts]
    x1 = [FQ.to_mont(p[0][1]) if p is not None else 0 for p in pts]
    y0 = [FQ.to_mont(p[1][0]) if p is not None else 0 for p in pts]
    y1 = [FQ.to_mont(p[1][1]) if p is not None else 0 for p in pts]
    inf = np.array([p is None for p in pts])
    k = FQ.num_limbs
    return (
        (jnp.asarray(ints_to_limbs(x0, k)), jnp.asarray(ints_to_limbs(x1, k))),
        (jnp.asarray(ints_to_limbs(y0, k)), jnp.asarray(ints_to_limbs(y1, k))),
        jnp.asarray(inf),
    )


def affine_to_ints(A):
    from ..fields import ops

    (x0, x1), (y0, y1), inf = A
    x0 = limbs_to_ints(np.asarray(ops.from_mont(FQ, x0)))
    x1 = limbs_to_ints(np.asarray(ops.from_mont(FQ, x1)))
    y0 = limbs_to_ints(np.asarray(ops.from_mont(FQ, y0)))
    y1 = limbs_to_ints(np.asarray(ops.from_mont(FQ, y1)))
    inf = np.asarray(inf).reshape(-1)
    return [
        None if i else ((a, b), (c, d))
        for a, b, c, d, i in zip(x0, x1, y0, y1, inf)
    ]


def jacobian_to_ints(P):
    return affine_to_ints(points.jac_to_affine(F, P))


def generator_affine(batch_shape=()):
    count = int(np.prod(batch_shape)) if batch_shape else 1
    A = affine_from_ints(
        [(constants.G2_GENERATOR_X, constants.G2_GENERATOR_Y)] * count
    )
    if not batch_shape:
        return A
    (x0, x1), (y0, y1), inf = A
    shape = (FQ.num_limbs,) + tuple(batch_shape)
    return (
        (x0.reshape(shape), x1.reshape(shape)),
        (y0.reshape(shape), y1.reshape(shape)),
        inf.reshape(tuple(batch_shape)),
    )
