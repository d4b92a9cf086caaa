"""Complete projective group law (RCB16) vs the big-int oracle.

The projective path is the production MSM accumulator (msm/pippenger.py);
these tests pin its semantics: agreement with the oracle on generic
points, exception-freeness on every edge case the reference's cmov
chains handle explicitly (test_curve_operations.cu / point.cuh:610-915),
and round-trip consistency with the Jacobian representation.

On TPU the fused Pallas kernels (pallas_g1.pmadd/padd/pdbl) serve these
ops; their bit-exactness vs this generic path is asserted on-device
(they are routed off on CPU where the generic path is itself the oracle
subject here).
"""

import random

import jax
import jax.numpy as jnp
import pytest

from tpu_bls12_381 import constants, oracle
from tpu_bls12_381.curves import g1, g2, points as pt, projective as pj
from tpu_bls12_381.curves.field_adapters import FQ_ADAPTER, FQ2_ADAPTER

R = constants.FR_MODULUS


def _g1_points(rng, n):
    G = oracle.g1_generator()
    return [
        oracle.jac_to_affine(
            oracle.scalar_mul(rng.randrange(1, R), G, oracle.FQ_OPS),
            oracle.FQ_OPS,
        )
        for _ in range(n)
    ]


def _g2_points(rng, n):
    G = oracle.g2_generator()
    return [
        oracle.jac_to_affine(
            oracle.scalar_mul(rng.randrange(1, R), G, oracle.FQ2_OPS),
            oracle.FQ2_OPS,
        )
        for _ in range(n)
    ]


def _o_add(a, b, FO):
    return oracle.jac_to_affine(
        oracle.jac_add(
            oracle.affine_to_jac(a, FO), oracle.affine_to_jac(b, FO), FO
        ),
        FO,
    )


def _o_dbl(a, FO):
    return oracle.jac_to_affine(
        oracle.jac_double(oracle.affine_to_jac(a, FO), FO), FO
    )


CURVES = {
    "g1": (FQ_ADAPTER, oracle.FQ_OPS, g1, _g1_points),
    "g2": (FQ2_ADAPTER, oracle.FQ2_OPS, g2, _g2_points),
}


@pytest.mark.parametrize("curve", ["g1", "g2"])
def test_add_double_mixed_match_oracle(rng, curve):
    F, FO, gmod, mk = CURVES[curve]
    n = 4 if curve == "g2" else 8
    pts = mk(rng, n)
    rot = pts[1:] + pts[:1]
    A = gmod.affine_from_ints(pts)
    B = gmod.affine_from_ints(rot)
    P = pj.affine_to_proj(F, A)
    Q = pj.affine_to_proj(F, B)
    to_ints = lambda S: gmod.jacobian_to_ints(pj.proj_to_jac(F, S))

    assert to_ints(pj.proj_add(F, P, Q)) == [
        _o_add(a, b, FO) for a, b in zip(pts, rot)
    ]
    want_dbl = [_o_dbl(a, FO) for a in pts]
    assert to_ints(pj.proj_double(F, P)) == want_dbl
    assert to_ints(pj.proj_add_mixed(F, P, B)) == [
        _o_add(a, b, FO) for a, b in zip(pts, rot)
    ]
    # completeness: the SAME formula handles P == Q (no doubling fallback)
    assert to_ints(pj.proj_add(F, P, P)) == want_dbl
    assert to_ints(pj.proj_add_mixed(F, P, A)) == want_dbl


@pytest.mark.parametrize("curve", ["g1", "g2"])
def test_edge_cases_exception_free(rng, curve):
    F, FO, gmod, mk = CURVES[curve]
    n = 2 if curve == "g2" else 4
    pts = mk(rng, n)
    A = gmod.affine_from_ints(pts)
    P = pj.affine_to_proj(F, A)
    ident = pj.proj_identity(F, (n,))
    to_ints = lambda S: gmod.jacobian_to_ints(pj.proj_to_jac(F, S))

    assert to_ints(pj.proj_add_mixed(F, ident, A)) == pts        # O + A
    Ainf = gmod.affine_from_ints([None] * n)
    assert to_ints(pj.proj_add_mixed(F, P, Ainf)) == pts         # P + inf
    negA = pt.affine_neg(F, A)
    assert to_ints(pj.proj_add_mixed(F, P, negA)) == [None] * n  # P - P
    assert to_ints(pj.proj_add(F, P, pj.proj_neg(F, P))) == [None] * n
    assert to_ints(pj.proj_add(F, P, ident)) == pts              # P + O
    assert to_ints(pj.proj_add(F, ident, ident)) == [None] * n   # O + O
    assert to_ints(pj.proj_double(F, ident)) == [None] * n       # 2O


def test_jac_proj_roundtrip(rng):
    F = FQ_ADAPTER
    pts = _g1_points(rng, 4)
    A = g1.affine_from_ints(pts)
    J = pt.affine_to_jac(F, A)
    J2 = pj.proj_to_jac(F, pj.jac_to_proj(F, J))
    assert bool(jnp.all(pt.jac_eq(F, J, J2)))
    # identity roundtrips too
    I = pt.jac_identity(F, (4,))
    I2 = pj.proj_to_jac(F, pj.jac_to_proj(F, I))
    assert bool(jnp.all(pt.jac_eq(F, I, I2)))
    # proj_to_affine agrees with the jacobian conversion
    got = g1.affine_to_ints(pj.proj_to_affine(F, pj.jac_to_proj(F, J)))
    assert got == pts


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="fused kernels are TPU-only (interpret mode is "
                           "pathologically slow for kernels this size)")
def test_fused_kernels_bit_exact():  # pragma: no cover - TPU-only
    from tpu_bls12_381.curves.pallas_g1 import padd, pdbl, pmadd

    rng = random.Random(0xB15)
    F = FQ_ADAPTER
    pts = _g1_points(rng, 6)
    A = g1.affine_from_ints(pts)
    B = g1.affine_from_ints(pts[1:] + [None])
    P = pj.affine_to_proj(F, A)
    Q = pj.affine_to_proj(F, B)
    eq3 = lambda X, Y: all(
        bool(jnp.array_equal(x, y)) for x, y in zip(X, Y)
    )
    assert eq3(pmadd(P, B), pj.proj_add_mixed(F, P, B))
    assert eq3(padd(P, Q), pj.proj_add(F, P, Q))
    assert eq3(pdbl(P), pj.proj_double(F, P))
    I = pj.proj_identity(F, (6,))
    assert eq3(pmadd(I, B), pj.proj_add_mixed(F, I, B))
    assert eq3(pmadd(P, A), pj.proj_add_mixed(F, P, A))
    assert eq3(padd(P, pj.proj_neg(F, P)), pj.proj_add(F, P, pj.proj_neg(F, P)))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="fused kernels are TPU-only")
def test_fused_g2_kernels_bit_exact():  # pragma: no cover - TPU-only
    from tpu_bls12_381.curves.pallas_g2 import padd2, pdbl2, pmadd2

    rng = random.Random(0xB15)
    F = FQ2_ADAPTER
    pts = _g2_points(rng, 3) + [None]
    A = g2.affine_from_ints(pts)
    B = g2.affine_from_ints(pts[1:] + pts[:1])
    P = pj.affine_to_proj(F, A)
    Q = pj.affine_to_proj(F, B)
    flat = jax.tree_util.tree_leaves
    eq = lambda X, Y: all(
        bool(jnp.array_equal(a, b)) for a, b in zip(flat(X), flat(Y))
    )
    assert eq(pmadd2(P, B), pj.proj_add_mixed(F, P, B))
    assert eq(padd2(P, Q), pj.proj_add(F, P, Q))
    assert eq(pdbl2(P), pj.proj_double(F, P))
    sign = jnp.asarray([False, True, True, False])
    x2, y2, inf2 = B
    want = pj.proj_add_mixed(F, P, (x2, F.cmov(sign, F.neg(y2), y2), inf2))
    assert eq(pmadd2(P, B, sign), want)
    assert eq(pmadd2(P, A), pj.proj_add_mixed(F, P, A))
