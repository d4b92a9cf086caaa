"""Env-var-driven configuration, read once and cached.

TPU analog of ``core/config.rs``: every knob is an environment variable
read lazily on first use and cached for the process lifetime (the
reference caches in `OnceLock`s; we cache in a singleton dataclass).
Variables keep the reference's ``MIDNIGHT_*`` names where the semantics
carry over (core/config.rs:52-363):

  MIDNIGHT_DEVICE          auto | tpu | cpu        (reference: auto|gpu|cpu)
  MIDNIGHT_TPU_MIN_K       MSM accel threshold log2, default 15
                           (MIDNIGHT_GPU_MIN_K accepted as alias)
  MIDNIGHT_NTT_MIN_K       NTT accel threshold log2, default 12
  MIDNIGHT_VECOPS_MIN_SIZE vecops accel threshold, default 4096
  MIDNIGHT_TPU_PRECOMPUTE  base precompute factor 1..8, default 1
  MIDNIGHT_MSM_WINDOW      fixed MSM window bits (else auto table)
  MIDNIGHT_NTT_ORDERING    NN | NR | RN | RR, default NN
  MIDNIGHT_NTT_ALGORITHM   auto | radix2 | fourstep, default auto
                           (reference: Auto|Radix2|MixedRadix,
                           core/config.rs:168-212; fourstep is the TPU
                           mixed-radix analog — ntt/pallas_ntt.py)
  MIDNIGHT_NTT_FAST_TWIDDLES  accepted for drop-in compatibility
                           (core/config.rs:225-244); the four-step path
                           always prepacks full per-stage twiddle tables
                           (the fast-twiddles trade), so the knob is a
                           logged no-op here
  MIDNIGHT_NTT_MAX_LOG_N   default domain size the Accelerator pre-builds
                           (default 16; the reference's GpuNttContext::new
                           max(log_n, 20) analog, core/ntt.rs:342-364)
  MIDNIGHT_SHARDING        auto | none | <int #devices>, default auto
  MIDNIGHT_TRACE           comma list: msm,ntt,vecops,all (timing spans)
"""

from __future__ import annotations

import enum
import logging
import os
from dataclasses import dataclass, field

logger = logging.getLogger("tpu_bls12_381")


class DeviceType(enum.Enum):
    AUTO = "auto"
    TPU = "tpu"
    CPU = "cpu"


def _int_env(name: str, default: int, lo: int, hi: int, aliases=()) -> int:
    for n in (name, *aliases):
        raw = os.environ.get(n)
        if raw is not None:
            try:
                v = int(raw)
            except ValueError:
                logger.warning("%s=%r is not an int; using %d", n, raw, default)
                return default
            if not (lo <= v <= hi):
                logger.warning("%s=%d out of [%d, %d]; clamping", n, v, lo, hi)
                return min(max(v, lo), hi)
            return v
    return default


@dataclass(frozen=True)
class Config:
    device: DeviceType
    msm_min_k: int
    ntt_min_k: int
    vecops_min_size: int
    precompute_factor: int
    msm_window: int | None
    # "auto" (default): GLV when the doubled point set still fits the HBM
    # budget in one shot (measured on v5e: +25% at 2^20, OOM at 2^22);
    # "on"/"off" force.  pippenger.msm resolves "auto" per call.
    msm_glv: str
    ntt_max_log_n: int
    ntt_ordering: str
    ntt_algorithm: str
    sharding: str
    trace: frozenset = field(default_factory=frozenset)

    @classmethod
    def from_env(cls) -> "Config":
        raw_dev = os.environ.get("MIDNIGHT_DEVICE", "auto").lower()
        try:
            device = DeviceType(raw_dev)
        except ValueError:
            logger.warning("MIDNIGHT_DEVICE=%r unknown; using auto", raw_dev)
            device = DeviceType.AUTO
        window = _int_env("MIDNIGHT_MSM_WINDOW", 0, 0, 24)
        trace_raw = os.environ.get("MIDNIGHT_TRACE", "")
        trace = frozenset(t.strip() for t in trace_raw.split(",") if t.strip())
        ft = os.environ.get("MIDNIGHT_NTT_FAST_TWIDDLES")
        if ft is not None:
            logger.info(
                "MIDNIGHT_NTT_FAST_TWIDDLES=%s accepted (no-op: per-stage "
                "twiddle tables are always prepacked here)", ft)
        return cls(
            device=device,
            msm_min_k=_int_env("MIDNIGHT_TPU_MIN_K", 15, 0, 30,
                               aliases=("MIDNIGHT_GPU_MIN_K",)),
            ntt_min_k=_int_env("MIDNIGHT_NTT_MIN_K", 12, 0, 32),
            vecops_min_size=_int_env("MIDNIGHT_VECOPS_MIN_SIZE", 4096, 0, 1 << 30),
            precompute_factor=_int_env("MIDNIGHT_TPU_PRECOMPUTE", 1, 1, 8,
                                       aliases=("MIDNIGHT_GPU_PRECOMPUTE",)),
            msm_window=window or None,
            msm_glv={"1": "on", "true": "on", "on": "on", "yes": "on",
                     "0": "off", "false": "off", "off": "off", "no": "off",
                     }.get(os.environ.get("MIDNIGHT_MSM_GLV", "auto")
                           .lower(), "auto"),
            ntt_max_log_n=_int_env("MIDNIGHT_NTT_MAX_LOG_N", 16, 0, 32),
            ntt_ordering=os.environ.get("MIDNIGHT_NTT_ORDERING", "NN").upper(),
            ntt_algorithm={"mixedradix": "fourstep"}.get(
                os.environ.get("MIDNIGHT_NTT_ALGORITHM", "auto").lower(),
                os.environ.get("MIDNIGHT_NTT_ALGORITHM", "auto").lower(),
            ),
            sharding=os.environ.get("MIDNIGHT_SHARDING", "auto").lower(),
            trace=trace,
        )

    # --- decision helpers (core/config.rs:449-513 analogs) -----------------

    def use_accel_msm(self, n: int) -> bool:
        if self.device is DeviceType.CPU:
            return False
        if self.device is DeviceType.TPU:
            return True
        return n >= (1 << self.msm_min_k)

    def use_accel_ntt(self, n: int) -> bool:
        if self.device is DeviceType.CPU:
            return False
        if self.device is DeviceType.TPU:
            return True
        return n >= (1 << self.ntt_min_k)

    def use_accel_vecops(self, n: int) -> bool:
        if self.device is DeviceType.CPU:
            return False
        if self.device is DeviceType.TPU:
            return True
        return n >= self.vecops_min_size

    def traces(self, tag: str) -> bool:
        return "all" in self.trace or tag in self.trace


_CONFIG: Config | None = None


def config() -> Config:
    """Process-wide cached config (read env once, like OnceLock)."""
    global _CONFIG
    if _CONFIG is None:
        _CONFIG = Config.from_env()
        logger.info("tpu_bls12_381 config: %s", _CONFIG)
    return _CONFIG


def reset_config_cache() -> None:
    """Drop the cache (tests / after os.environ mutation)."""
    global _CONFIG
    _CONFIG = None
