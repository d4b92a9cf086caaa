"""Single-chip four-step NTT (ntt/pallas_ntt.py) vs the radix-2 ladder.

TPU-only: the tile kernel's interpret-mode compile is pathologically slow
on CPU, and on CPU the ladder path is authoritative (oracle-validated in
test_ntt.py).  Bit-exact agreement with the ladder chains the four-step
to the same oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bls12_381.fields import FR
from tpu_bls12_381.ntt import get_domain
from tpu_bls12_381.ntt.ntt import Ordering, _ntt_core

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="fused NTT tile kernel is TPU-only"
)


def _rand_fr(n, seed=7):
    """Random REDUCED Fr elements: top limb zeroed so values < 2^240 < r
    (bit-exact roundtrips require inputs already in canonical range)."""
    rng = np.random.default_rng(seed)
    v = rng.integers(0, 1 << 16, size=(FR.num_limbs, n), dtype=np.uint64)
    v[-1] = 0
    return jnp.asarray(v).astype(jnp.uint32)


@pytest.mark.parametrize("log_n", [10, 13])
@pytest.mark.parametrize("inverse", [False, True])
def test_fourstep_matches_ladder(log_n, inverse):  # pragma: no cover - TPU
    from tpu_bls12_381.ntt.pallas_ntt import ntt_fourstep

    n = 1 << log_n
    dom = get_domain(log_n)
    x = _rand_fr(n)
    got = ntt_fourstep(x, inverse=inverse, domain=dom)
    tw = dom.itw if inverse else dom.tw
    want = _ntt_core(x, log_n, inverse, Ordering.NN, tw, dom.n_inv)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("inverse", [False, True])
def test_fourstep_batched_matches_ladder(inverse):  # pragma: no cover - TPU
    from tpu_bls12_381.ntt.pallas_ntt import ntt_fourstep

    log_n, B = 10, 4
    dom = get_domain(log_n)
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1 << 16, size=(FR.num_limbs, B, 1 << log_n),
                     dtype=np.uint64)
    v[-1] = 0
    x = jnp.asarray(v).astype(jnp.uint32)
    got = ntt_fourstep(x, inverse=inverse, domain=dom)
    tw = dom.itw if inverse else dom.tw
    want = _ntt_core(x, log_n, inverse, Ordering.NN, tw, dom.n_inv)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fourstep_roundtrip():  # pragma: no cover - TPU
    from tpu_bls12_381.ntt.pallas_ntt import ntt_fourstep

    log_n = 12
    dom = get_domain(log_n)
    x = _rand_fr(1 << log_n, seed=9)
    back = ntt_fourstep(ntt_fourstep(x, domain=dom), inverse=True, domain=dom)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("inverse", [False, True])
def test_fourstep_recursive_matches_ladder(inverse, monkeypatch):  # pragma: no cover - TPU
    """One-level Bailey recursion (domains past 2^(2*cap_log); the K=22
    e2e's 2^23 shape) against the ladder, at a shrunken tile cap so the
    recursive branch runs at a test-sized 2^15."""
    import dataclasses

    from tpu_bls12_381 import tuning
    from tpu_bls12_381.ntt.pallas_ntt import (
        _cap_log, _split_top, ntt_fourstep)

    prof = dataclasses.replace(tuning.chip_profile(), ntt_tile_log_elems=10)
    monkeypatch.setattr(tuning, "_DETECTED", prof)
    assert _cap_log() == 7
    log_n = 15  # > 2*cap_log -> inner factor recurses
    la, lb = _split_top(log_n)
    assert lb > _cap_log() * 2 or (1 << lb) > (1 << _cap_log())

    dom = get_domain(log_n)
    x = _rand_fr(1 << log_n, seed=11)
    got = ntt_fourstep(x, inverse=inverse, domain=dom)
    tw = dom.itw if inverse else dom.tw
    want = _ntt_core(x, log_n, inverse, Ordering.NN, tw, dom.n_inv)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
