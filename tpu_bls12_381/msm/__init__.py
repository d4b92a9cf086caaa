from .pippenger import (
    msm,
    msm_g1,
    msm_g2,
    msm_traceable,
    msm_precomputed,
    expand_bases,
    precompute_window_span,
    num_windows,
    decompose_signed_digits,
    window_bits_for,
)

__all__ = [
    "msm",
    "msm_g1",
    "msm_g2",
    "msm_traceable",
    "msm_precomputed",
    "expand_bases",
    "precompute_window_span",
    "num_windows",
    "decompose_signed_digits",
    "window_bits_for",
]
