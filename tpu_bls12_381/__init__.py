"""tpu-bls12-381: TPU-native BLS12-381 cryptographic primitives.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the CUDA
reference backend riusricardo/midnight-bls12-381-cuda: Montgomery-form
Fr/Fq/Fq2 field arithmetic, G1/G2 group law, Pippenger MSM, Cooley-Tukey
NTT/iNTT (coset + batch), and element-wise vecops — designed TPU-first
(limb-vectorized VPU arithmetic, sort/scan bucket accumulation, mesh
sharding over ICI) rather than translated from CUDA.
"""

from . import constants
from .fields import FQ, FR

__version__ = "0.1.0"

__all__ = ["constants", "FQ", "FR", "__version__"]
