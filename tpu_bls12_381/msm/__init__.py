from .pippenger import msm, msm_g1, msm_g2, decompose_signed_digits, window_bits_for

__all__ = ["msm", "msm_g1", "msm_g2", "decompose_signed_digits", "window_bits_for"]
