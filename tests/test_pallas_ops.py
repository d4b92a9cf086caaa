"""Pallas field kernels vs the pure-jnp reference ops — bit-exact.

On CPU these run in Pallas interpret mode; on TPU they compile to Mosaic.
The cross-backend equivalence requirement is SURVEY.md §4's test-plan item
(f): interpret-mode Pallas vs compiled vs pure-XLA must agree exactly.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpu_bls12_381 import constants
from tpu_bls12_381.fields import FR, FQ, ops, pallas_ops
from tpu_bls12_381.fields.limbs import ints_to_limbs

SPECS = {"Fr": FR, "Fq": FQ}


def _rand(spec, rng, n):
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    return jnp.asarray(ints_to_limbs(vals, spec.num_limbs))


@pytest.mark.parametrize("name", ["Fr", "Fq"])
@pytest.mark.parametrize("n", [8, 600])  # below / above one lane block
def test_mont_mul_matches_jnp(rng, name, n):
    spec = SPECS[name]
    a, b = _rand(spec, rng, n), _rand(spec, rng, n)
    got = pallas_ops.mont_mul(spec, a, b)
    want = ops.mont_mul(spec, a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("name", ["Fr", "Fq"])
def test_add_sub_sqr_match_jnp(rng, name):
    spec = SPECS[name]
    n = 300
    a, b = _rand(spec, rng, n), _rand(spec, rng, n)
    np.testing.assert_array_equal(
        np.asarray(pallas_ops.add(spec, a, b)), np.asarray(ops.add(spec, a, b)))
    np.testing.assert_array_equal(
        np.asarray(pallas_ops.sub(spec, a, b)), np.asarray(ops.sub(spec, a, b)))
    np.testing.assert_array_equal(
        np.asarray(pallas_ops.mont_sqr(spec, a)), np.asarray(ops.mont_sqr(spec, a)))


@pytest.mark.parametrize("name", ["Fr", "Fq"])
def test_mont_mul_cios_matches_unrolled(rng, name):
    """Default scan-based CIOS is bit-identical to the independent
    unrolled schoolbook+REDC implementation."""
    spec = SPECS[name]
    n = 200
    a, b = _rand(spec, rng, n), _rand(spec, rng, n)
    got = ops.mont_mul(spec, a, b)  # cios (default)
    want = ops.mont_mul_unrolled(spec, a, b)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # edge values: 0, 1, p-1
    edge = [0, 1, spec.modulus - 1, spec.modulus - 1]
    ea = jnp.asarray(ints_to_limbs(edge, spec.num_limbs))
    eb = jnp.asarray(ints_to_limbs(list(reversed(edge)), spec.num_limbs))
    np.testing.assert_array_equal(
        np.asarray(ops.mont_mul(spec, ea, eb)),
        np.asarray(ops.mont_mul_unrolled(spec, ea, eb)))
    np.testing.assert_array_equal(
        np.asarray(ops.mont_sqr(spec, a)),
        np.asarray(ops.mont_sqr_unrolled(spec, a)))


def test_butterfly_matches_composite(rng):
    n = 256
    e, o, w = (_rand(FR, rng, n) for _ in range(3))
    hi, lo = pallas_ops.butterfly(FR, e, o, w)
    t = ops.mont_mul(FR, o, w)
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(ops.add(FR, e, t)))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(ops.sub(FR, e, t)))
