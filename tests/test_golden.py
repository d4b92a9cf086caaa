"""Golden-vector (KAT) suite: limb-exact parity against checked-in vectors.

The vectors in ``tests/vectors/`` were produced by ``tools/gen_vectors.py``
— an implementation independent of both the TPU path and the Python
oracle (affine chord-tangent group law, recursive FFT, plain ints).  This
is the analog of the reference's captured-vector policy
(security_audit_tests.cuh:30-46: BLST/Arkworks/EIP-2537/Zcash vectors;
tests/ntt_fft_comparison.rs:134-173: pinned omega derivation).  Any drift
in serialization, Montgomery parameters, root-of-unity derivation, or
group-law math fails here even if library and oracle agree with each other.
"""

import hashlib
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_bls12_381 import constants
from tpu_bls12_381.fields import FQ, FR, ops
from tpu_bls12_381.fields.limbs import ints_to_limbs, limbs_to_ints
from tpu_bls12_381.curves import g1, g2
from tpu_bls12_381.msm import msm_g1, msm_g2
from tpu_bls12_381.ntt import ntt, coset_ntt

VEC_DIR = os.path.join(os.path.dirname(__file__), "vectors")


def load(name):
    with open(os.path.join(VEC_DIR, name)) as f:
        return json.load(f)


def _i(s):
    return int(s, 16)


SPECS = {"fr": FR, "fq": FQ}


class TestFieldGolden:
    @pytest.mark.parametrize("name", ["fr", "fq"])
    def test_montgomery_constants(self, name):
        v = load("field_vectors.json")["fields"][name]
        spec = SPECS[name]
        p = _i(v["modulus"])
        assert spec.modulus == p
        assert spec.num_limbs == v["num_limbs"]
        assert spec.r % p == _i(v["mont_r"])
        assert spec.r2 % p == _i(v["mont_r2"])
        assert spec.n0_inv == _i(v["n0_16"])

    @pytest.mark.parametrize("name", ["fr", "fq"])
    def test_wire_format(self, name):
        """Limb images are the pinned little-endian 16-bit layout."""
        v = load("field_vectors.json")["fields"][name]
        spec = SPECS[name]
        for w in v["wire"]:
            got = ints_to_limbs([_i(w["value"])], spec.num_limbs)[:, 0]
            assert got.tolist() == w["limbs_le16"]
            gotm = ints_to_limbs([spec.to_mont(_i(w["value"]))],
                                 spec.num_limbs)[:, 0]
            assert gotm.tolist() == w["mont_limbs_le16"]

    @pytest.mark.parametrize("name", ["fr", "fq"])
    def test_arithmetic_kats(self, name):
        v = load("field_vectors.json")["fields"][name]
        spec = SPECS[name]
        ks = v["kats"]
        a_std = ints_to_limbs([_i(k["a"]) for k in ks], spec.num_limbs)
        b_std = ints_to_limbs([_i(k["b"]) for k in ks], spec.num_limbs)
        a_m = ints_to_limbs([spec.to_mont(_i(k["a"])) for k in ks],
                            spec.num_limbs)
        b_m = ints_to_limbs([spec.to_mont(_i(k["b"])) for k in ks],
                            spec.num_limbs)
        assert limbs_to_ints(np.asarray(ops.add(spec, a_std, b_std))) == \
            [_i(k["add"]) for k in ks]
        assert limbs_to_ints(np.asarray(ops.sub(spec, a_std, b_std))) == \
            [_i(k["sub"]) for k in ks]
        assert limbs_to_ints(np.asarray(ops.neg(spec, a_std))) == \
            [_i(k["neg"]) for k in ks]
        mul = ops.from_mont(spec, ops.mont_mul(spec, a_m, b_m))
        assert limbs_to_ints(np.asarray(mul)) == [_i(k["mul"]) for k in ks]
        sqr = ops.from_mont(spec, ops.mont_sqr(spec, a_m))
        assert limbs_to_ints(np.asarray(sqr)) == [_i(k["sqr"]) for k in ks]
        inv = ops.from_mont(spec, ops.inv_mont(spec, a_m))
        assert limbs_to_ints(np.asarray(inv)) == [_i(k["inv"]) for k in ks]
        # Montgomery image itself (pins R and the encode path)
        assert limbs_to_ints(np.asarray(a_m)) == [_i(k["a_mont"]) for k in ks]


def _fr_mont_limbs(ints):
    return jnp.asarray(
        ints_to_limbs([FR.to_mont(x % constants.FR_MODULUS) for x in ints],
                      FR.num_limbs))


class TestNttGolden:
    def _cases(self, kind):
        return [c for c in load("ntt_vectors.json")["cases"]
                if c["kind"] == kind]

    def test_omega_derivation(self):
        v = load("ntt_vectors.json")
        assert constants.FR_OMEGA == _i(v["omega_2e32"])

    @pytest.mark.parametrize("idx", [0, 1])
    def test_forward(self, idx):
        c = self._cases("forward")[idx]
        x = _fr_mont_limbs([_i(s) for s in c["input"]])
        y = ops.from_mont(FR, ntt(x))
        assert limbs_to_ints(np.asarray(y)) == [_i(s) for s in c["output"]]

    def test_coset(self):
        c = self._cases("coset")[0]
        x = _fr_mont_limbs([_i(s) for s in c["input"]])
        y = ops.from_mont(FR, coset_ntt(x, c["shift"]))
        assert limbs_to_ints(np.asarray(y)) == [_i(s) for s in c["output"]]

    def test_forward_digest_2e14(self):
        c = self._cases("forward_digest")[0]
        n = 1 << c["log_n"]
        r = constants.FR_MODULUS
        x = _fr_mont_limbs([(i * i + 3) % r for i in range(n)])
        y = ops.from_mont(FR, ntt(x))
        hsh = hashlib.sha256()
        for v in limbs_to_ints(np.asarray(y)):
            hsh.update(v.to_bytes(32, "little"))
        assert hsh.hexdigest() == c["output_sha256_le32"]


class TestMsmGolden:
    def _check_g1(self, c):
        scalars = _fr_mont_limbs([_i(s) for s in c["scalars"]])
        pts = [(_i(p["x"]), _i(p["y"])) for p in c["points"]]
        A = g1.affine_from_ints(pts)
        got = g1.jacobian_to_ints(
            jax.tree_util.tree_map(
                lambda v: v[..., None], msm_g1(scalars, A)))[0]
        assert got == (_i(c["expected"]["x"]), _i(c["expected"]["y"]))

    def test_g1_1024(self):
        self._check_g1(load("msm_g1_vectors.json")["cases"][0])

    def test_g1_4096(self):
        self._check_g1(load("msm_g1_vectors.json")["cases"][1])

    def test_g2_1024(self):
        c = load("msm_g2_vectors.json")["cases"][0]
        scalars = _fr_mont_limbs([_i(s) for s in c["scalars"]])
        pts = [((_i(p["x"][0]), _i(p["x"][1])),
                (_i(p["y"][0]), _i(p["y"][1]))) for p in c["points"]]
        A = g2.affine_from_ints(pts)
        got = g2.jacobian_to_ints(
            jax.tree_util.tree_map(lambda v: v[..., None],
                                   msm_g2(scalars, A)))[0]
        exp = c["expected"]
        assert got == ((_i(exp["x"][0]), _i(exp["x"][1])),
                       (_i(exp["y"][0]), _i(exp["y"][1])))
