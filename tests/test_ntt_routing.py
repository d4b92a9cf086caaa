"""NTT algorithm routing guards (ntt/ntt.py::_route_fourstep).

Round-4's K=22 e2e crash came from routing a 2^23-element coset NTT into
the four-step tile path, whose passes need a row block BB that is a
multiple of Mosaic's 8-sublane granularity: at 2^23 the 4096-wide pass
left BB=4 and Mosaic rejected the block shape (E2E.json["22"] in round
4).  Round 5 extends the four-step with one recursion level (Bailey
split of a Bailey split), so 2^23 is now SUPPORTED (through 2^33 on the
default profiles); these tests pin both the new coverage and the guard:
shapes past the recursion's reach must still route to the radix-2
ladder, even when the user forces MIDNIGHT_NTT_ALGORITHM=fourstep.
Pure shape logic: runs on CPU CI.

Reference bar: domains to 2^32 are in scope
(/root/reference/bls12-381/include/ntt.cuh:60).
"""

import numpy as np
import pytest

from tpu_bls12_381.fields import FR
from tpu_bls12_381.ntt.ntt import _route_fourstep, Ordering
from tpu_bls12_381.ntt.pallas_ntt import (
    _cap_log, _split_top, fourstep_supported)


def _fake(n, lead=()):
    """Zero-copy (K, *lead, n) array — broadcast_to avoids allocating
    the gigabytes a real large-domain operand would need."""
    return np.broadcast_to(np.zeros(1, np.uint32),
                           (FR.num_limbs,) + lead + (n,))


def test_2e23_domain_now_supported():
    # the K=22 e2e quotient domain that crashed round 4
    assert fourstep_supported(_fake(1 << 23))
    assert fourstep_supported(_fake(1 << 23, lead=(2,)))


def test_supported_through_reference_max_domain():
    # reference handles domains to 2^32 (ntt.cuh:60); the recursion
    # covers la + 2*cap_log >= 33 on the default profiles
    cap_log = _cap_log()
    assert fourstep_supported(_fake(1 << min(32, 3 * cap_log)))


def test_beyond_recursion_rejected():
    cap_log = _cap_log()
    too_big = 3 * cap_log + 1
    assert not fourstep_supported(_fake(1 << too_big))


def test_split_top_keeps_tile_bounds():
    cap_log = _cap_log()
    for log_n in range(10, 3 * cap_log + 1):
        la, lb = _split_top(log_n)
        assert la + lb == log_n
        assert la <= cap_log, log_n
        assert lb <= 2 * cap_log, log_n
        if log_n > 2 * cap_log:
            # recursive inner factor must itself split into tile-sized
            # halves, and every pass keeps >= 2^7 lanes
            la2, lb2 = _split_top(lb)
            assert la2 <= cap_log and lb2 <= cap_log, log_n
            assert la >= 7, log_n


def test_small_and_non_pow2_rejected():
    assert not fourstep_supported(_fake(1 << 8))   # below min size
    assert not fourstep_supported(np.zeros((FR.num_limbs,), np.uint32))


@pytest.mark.parametrize("algo", ["auto", "fourstep"])
def test_route_sends_unsupported_to_ladder(monkeypatch, algo):
    """Even a forced MIDNIGHT_NTT_ALGORITHM=fourstep must not route an
    unsupported shape into the tile path (that was the round-4 crash)."""
    monkeypatch.setenv("MIDNIGHT_NTT_ALGORITHM", algo)
    from tpu_bls12_381.runtime.config import reset_config_cache

    reset_config_cache()
    too_big = 3 * _cap_log() + 1
    try:
        assert _route_fourstep(_fake(1 << too_big), Ordering.NN) is False
    finally:
        monkeypatch.delenv("MIDNIGHT_NTT_ALGORITHM", raising=False)
        reset_config_cache()


def test_route_forced_fourstep_supported_shape(monkeypatch):
    monkeypatch.setenv("MIDNIGHT_NTT_ALGORITHM", "fourstep")
    from tpu_bls12_381.runtime.config import reset_config_cache

    reset_config_cache()
    try:
        assert _route_fourstep(_fake(1 << 20), Ordering.NN) is True
        assert _route_fourstep(_fake(1 << 23), Ordering.NN) is True
    finally:
        monkeypatch.delenv("MIDNIGHT_NTT_ALGORITHM", raising=False)
        reset_config_cache()
