"""NTT algorithm routing guards (ntt/ntt.py::_route_fourstep).

Round-4's K=22 e2e crash came from routing a 2^23-element coset NTT into
the four-step tile path, whose second pass needs a row block BB that is a
multiple of Mosaic's 8-sublane granularity: at 2^23 the 4096-wide pass
leaves BB=4 and Mosaic rejects the block shape (E2E.json["22"] in round
4).  These tests pin the guard — shapes whose split exceeds tile_elems/8
per factor MUST route to the radix-2 ladder, even when the user forces
MIDNIGHT_NTT_ALGORITHM=fourstep.  Pure shape logic: runs on CPU CI.

Reference bar: domains to 2^32 are in scope
(/root/reference/bls12-381/include/ntt.cuh:60), so big domains must
always have a working route.
"""

import numpy as np
import pytest

from tpu_bls12_381.fields import FR
from tpu_bls12_381.ntt.ntt import _route_fourstep, Ordering
from tpu_bls12_381.ntt.pallas_ntt import fourstep_supported, _tile_elems


def _fake(n, lead=()):
    """Zero-copy (K, *lead, n) array — broadcast_to avoids allocating
    the 512 MB a real 2^23 operand would need."""
    return np.broadcast_to(np.zeros(1, np.uint32),
                           (FR.num_limbs,) + lead + (n,))


def test_rejects_2e23_domain():
    # the K=22 e2e quotient domain: n = 2^23 -> nA=2048, nB=4096 > cap
    assert not fourstep_supported(_fake(1 << 23))


def test_rejects_2e23_batched():
    assert not fourstep_supported(_fake(1 << 23, lead=(2,)))


def test_supported_range_matches_cap():
    cap = _tile_elems() // 8
    # largest supported: both factors == cap -> n = cap^2
    log_cap = cap.bit_length() - 1
    assert fourstep_supported(_fake(1 << (2 * log_cap)))
    assert not fourstep_supported(_fake(1 << (2 * log_cap + 1)))


def test_small_and_non_pow2_rejected():
    assert not fourstep_supported(_fake(1 << 8))   # below min size
    assert not fourstep_supported(np.zeros((FR.num_limbs,), np.uint32))


@pytest.mark.parametrize("algo", ["auto", "fourstep"])
def test_route_sends_2e23_to_ladder(monkeypatch, algo):
    """Even a forced MIDNIGHT_NTT_ALGORITHM=fourstep must not route an
    unsupported shape into the tile path (that was the crash)."""
    monkeypatch.setenv("MIDNIGHT_NTT_ALGORITHM", algo)
    from tpu_bls12_381.runtime.config import reset_config_cache

    reset_config_cache()
    try:
        assert _route_fourstep(_fake(1 << 23), Ordering.NN) is False
    finally:
        monkeypatch.delenv("MIDNIGHT_NTT_ALGORITHM", raising=False)
        reset_config_cache()


def test_route_forced_fourstep_supported_shape(monkeypatch):
    monkeypatch.setenv("MIDNIGHT_NTT_ALGORITHM", "fourstep")
    from tpu_bls12_381.runtime.config import reset_config_cache

    reset_config_cache()
    try:
        assert _route_fourstep(_fake(1 << 20), Ordering.NN) is True
    finally:
        monkeypatch.delenv("MIDNIGHT_NTT_ALGORITHM", raising=False)
        reset_config_cache()
