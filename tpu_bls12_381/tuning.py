"""Per-chip-generation tuning profiles (gpu_config.cuh analog).

The reference sizes every launch from a runtime-detected `GPUConfig`
singleton (gpu_config.cuh:115-217: SM count, shared memory, per-kernel
thread tables).  The TPU analog is a per-generation profile of the knobs
that shape the Pallas/XLA programs: MSM window ceilings, bucket-tile lane
widths, the four-step NTT VMEM tile, and the Pallas lane block.  The
generation is detected once from the PJRT ``device_kind`` string (env
``MIDNIGHT_TPU_GEN`` overrides; the v5e values are the measured ones,
other generations are scaled from their published VMEM/VPU deltas and
marked as derived until profiled).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

logger = logging.getLogger("tpu_bls12_381")


@dataclass(frozen=True)
class ChipProfile:
    """Tuning knobs consumed by msm/pippenger.py and ntt/pallas_ntt.py."""

    name: str
    # MSM window ceiling below/at-or-above the large-size crossover
    # (pippenger.window_bits_for): bucket-tile lane work is free until the
    # triangle tile outgrows VMEM-resident lanes.
    msm_window_cap_small: int
    msm_window_cap_large: int
    msm_large_log_n: int
    # log2 ceiling of the bucket-accumulation lane tile L
    # (pippenger.lane_tile_for); bounded by VMEM per-core.
    msm_lane_tile_log_cap: int
    # four-step NTT in-VMEM tile (ntt/pallas_ntt.py): BB*m element budget.
    ntt_tile_log_elems: int
    # Pallas elementwise lane block (fields/pallas_ops.lane_block).
    lane_block: int
    # Roofline facts (bench_kernels.py speed-of-light accounting).
    # hbm_gbps: published per-chip HBM bandwidth.  vpu_int32_gops: VPU
    # 32-bit integer op ceiling estimated as 8x128 lanes * ~2 int ALU
    # slots * TensorCore clock (clock inferred from the published bf16
    # MXU TFLOPs) — an estimate, flagged as such in the harness output.
    hbm_gbps: float = 819.0
    vpu_int32_gops: float = 3000.0
    # derived=True: scaled from spec sheets, not yet profiled on-chip.
    derived: bool = False


# v5e numbers are profiled in-repo (see docstrings at the use sites).
# v4: 128 MiB/core VMEM like v5e but older VPU — keep the v5e shapes.
# v5p: 2x HBM bandwidth and bigger VMEM per core than v5e — one step
#   wider lane tiles / NTT tile.
# v6e (Trillium): ~2x v5e per-chip compute and VMEM — one step wider.
_PROFILES = {
    # hbm_gbps from the published spec sheets (v4 1228, v5e 819, v5p 2765,
    # v6e 1640); vpu_int32_gops = 8*128 lanes * 2 slots * clock, clock
    # inferred from published bf16 MXU TFLOPs (v4 ~1.05, v5e ~1.5,
    # v5p ~1.75, v6e ~1.75 GHz).
    "v4": ChipProfile("v4", 15, 16, 22, 15, 14, 2048,
                      hbm_gbps=1228.0, vpu_int32_gops=2150.0, derived=True),
    "v5e": ChipProfile("v5e", 15, 16, 22, 15, 14, 2048,
                       hbm_gbps=819.0, vpu_int32_gops=3070.0),
    "v5p": ChipProfile("v5p", 15, 16, 22, 16, 15, 2048,
                       hbm_gbps=2765.0, vpu_int32_gops=3580.0, derived=True),
    "v6e": ChipProfile("v6e", 15, 16, 22, 16, 15, 4096,
                       hbm_gbps=1640.0, vpu_int32_gops=3580.0, derived=True),
    # CPU/interpret: small blocks keep CI fast; tile caps irrelevant.
    "cpu": ChipProfile("cpu", 15, 16, 22, 15, 14, 256,
                       hbm_gbps=50.0, vpu_int32_gops=100.0),
}

_DETECTED: ChipProfile | None = None


def _kind_to_gen(kind: str) -> str:
    k = kind.lower().replace(" ", "")
    for gen in ("v6e", "v5p", "v5e", "v4"):
        if gen in k:
            return gen
    if "v6" in k:
        return "v6e"
    if "v5lite" in k or "v5litepod" in k:
        return "v5e"
    return ""


def chip_profile() -> ChipProfile:
    """Detect-once tuning profile for the default backend."""
    global _DETECTED
    if _DETECTED is not None:
        return _DETECTED
    import jax

    env = os.environ.get("MIDNIGHT_TPU_GEN", "").strip().lower()
    gen = env if env in _PROFILES else ""
    if not gen:
        if jax.default_backend() != "tpu":
            gen = "cpu"
        else:
            gen = _kind_to_gen(jax.devices()[0].device_kind)
            if not gen:
                # axon-style tunnels report an opaque kind; its env names
                # the real generation.
                gen = _kind_to_gen(
                    os.environ.get("PALLAS_AXON_TPU_GEN", ""))
    prof = _PROFILES.get(gen)
    if prof is None:
        prof = _PROFILES["v5e"]
        logger.warning(
            "unknown TPU generation (device_kind=%r); using the %s profile",
            jax.devices()[0].device_kind, prof.name)
    elif prof.derived:
        logger.info(
            "TPU %s profile is derived from spec ratios, not profiled", gen)
    _DETECTED = prof
    return prof


def reset_cache() -> None:
    global _DETECTED
    _DETECTED = None
