"""Field specifications: moduli + derived Montgomery constants as limb arrays.

The analog of the reference's ``Field<Config>`` template parameters
(``field.cuh:88-199``) re-derived for 16-bit limbs (see limbs.py for why).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property

import numpy as np

from .. import constants
from .limbs import LIMB_BITS, int_to_limbs


@dataclass(frozen=True)
class FieldSpec:
    name: str
    modulus: int
    num_limbs: int  # 16-bit limbs

    @property
    def bits(self) -> int:
        return self.modulus.bit_length()

    @property
    def r(self) -> int:
        """Montgomery R = 2^(16*K)."""
        return 1 << (LIMB_BITS * self.num_limbs)

    @cached_property
    def r2(self) -> int:
        return self.r * self.r % self.modulus

    @cached_property
    def n0_inv(self) -> int:
        """-modulus^{-1} mod 2^16 (per-limb Montgomery factor)."""
        return (-pow(self.modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

    # --- numpy constant limb arrays (shape (K,)) -----------------------------

    @cached_property
    def modulus_limbs(self) -> np.ndarray:
        return int_to_limbs(self.modulus, self.num_limbs)

    @cached_property
    def r2_limbs(self) -> np.ndarray:
        return int_to_limbs(self.r2, self.num_limbs)

    @cached_property
    def one_mont_limbs(self) -> np.ndarray:
        """R mod p — the Montgomery image of 1."""
        return int_to_limbs(self.r % self.modulus, self.num_limbs)

    @cached_property
    def zero_limbs(self) -> np.ndarray:
        return np.zeros(self.num_limbs, dtype=np.uint32)

    def to_mont(self, x: int) -> int:
        return x * self.r % self.modulus

    def from_mont(self, x: int) -> int:
        return x * pow(self.r, -1, self.modulus) % self.modulus


FR = FieldSpec("Fr", constants.FR_MODULUS, 16)
FQ = FieldSpec("Fq", constants.FQ_MODULUS, 24)
