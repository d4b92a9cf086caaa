"""G1: y^2 = x^3 + 4 over Fq — curve constants and host<->device converters."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import constants
from ..fields import FQ
from ..fields.limbs import int_to_limbs, ints_to_limbs, limbs_to_ints
from .field_adapters import FQ_ADAPTER
from . import points

F = FQ_ADAPTER

B_MONT_LIMBS = int_to_limbs(FQ.to_mont(constants.G1_B), FQ.num_limbs)


def b_mont(batch_shape=()):
    from ..fields import ops

    return ops.broadcast_constant(FQ, B_MONT_LIMBS, batch_shape)


def affine_from_ints(pts):
    """List of (x, y) int pairs or None -> affine batch (Montgomery form)."""
    xs = [FQ.to_mont(p[0]) if p is not None else 0 for p in pts]
    ys = [FQ.to_mont(p[1]) if p is not None else 0 for p in pts]
    inf = np.array([p is None for p in pts])
    return (
        jnp.asarray(ints_to_limbs(xs, FQ.num_limbs)),
        jnp.asarray(ints_to_limbs(ys, FQ.num_limbs)),
        jnp.asarray(inf),
    )


def affine_to_ints(A):
    """Affine batch -> list of (x, y) int pairs / None (standard form)."""
    from ..fields import ops

    x = limbs_to_ints(np.asarray(ops.from_mont(FQ, A[0])))
    y = limbs_to_ints(np.asarray(ops.from_mont(FQ, A[1])))
    inf = np.asarray(A[2]).reshape(-1)
    return [None if i else (xv, yv) for xv, yv, i in zip(x, y, inf)]


def jacobian_to_ints(P):
    """Jacobian batch -> affine int pairs via to_affine (oracle comparison)."""
    return affine_to_ints(points.jac_to_affine(F, P))


def generator_affine(batch_shape=()):
    pts = [
        (constants.G1_GENERATOR_X, constants.G1_GENERATOR_Y)
    ] * int(np.prod(batch_shape)) if batch_shape else [
        (constants.G1_GENERATOR_X, constants.G1_GENERATOR_Y)
    ]
    A = affine_from_ints(pts)
    if batch_shape:
        return tuple(
            c.reshape(c.shape[:1] + tuple(batch_shape)) if c.ndim > 1 else c.reshape(tuple(batch_shape))
            for c in A
        )
    return A
