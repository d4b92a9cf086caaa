"""ctypes loader for the native host-conversion library (native/convert.cpp).

Builds the .so on first use (g++, cached next to the source) and exposes
numpy-array entry points; every function has a pure-numpy/Python fallback
in runtime/types.py so the library degrades gracefully without a
toolchain.  This is the native runtime component that plays the role of
the reference's host-side conversion layer (core/types.rs) — the
device-side compute is all JAX/XLA.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger("tpu_bls12_381.native")

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native")
_SO = os.path.join(_DIR, "libtpu_bls12_381_native.so")

_LIB = None
_TRIED = False
_LOCK = threading.Lock()

FIELD_FQ = 0
FIELD_FR = 1


def _build() -> bool:
    src = os.path.join(_DIR, "convert.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        return os.path.exists(_SO)
    except (OSError, subprocess.CalledProcessError) as e:
        logger.info("native build failed (%s); using numpy fallbacks", e)
        return False


def lib() -> ctypes.CDLL | None:
    """The loaded native library, building it on first use; None if absent."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError as e:
            logger.info("native load failed (%s); using numpy fallbacks", e)
            return None
        u64p = np.ctypeslib.ndpointer(dtype=np.uint64, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS")
        L.wire_to_limbs16.argtypes = [u64p, u32p, ctypes.c_size_t, ctypes.c_int]
        L.limbs16_to_wire.argtypes = [u32p, u64p, ctypes.c_size_t, ctypes.c_int]
        L.mont_encode_batch.argtypes = [u64p, u64p, ctypes.c_size_t, ctypes.c_int]
        L.mont_decode_batch.argtypes = [u64p, u64p, ctypes.c_size_t, ctypes.c_int]
        L.native_abi_version.restype = ctypes.c_int
        if L.native_abi_version() != 1:
            logger.warning("native ABI mismatch; using numpy fallbacks")
            return None
        _LIB = L
        return _LIB


def available() -> bool:
    return lib() is not None


def wire_to_limbs16(words: np.ndarray) -> np.ndarray:
    """(n, k64) uint64 -> (4*k64, n) uint32 limbs-first."""
    L = lib()
    w = np.ascontiguousarray(words, dtype=np.uint64)
    n, k64 = w.shape
    out = np.empty((4 * k64, n), dtype=np.uint32)
    L.wire_to_limbs16(w, out, n, k64)
    return out


def limbs16_to_wire(limbs: np.ndarray) -> np.ndarray:
    """(4*k64, n) uint32 -> (n, k64) uint64."""
    L = lib()
    a = np.ascontiguousarray(limbs, dtype=np.uint32)
    k16, n = a.shape
    out = np.empty((n, k16 // 4), dtype=np.uint64)
    L.limbs16_to_wire(a, out, n, k16 // 4)
    return out


def mont_encode(words: np.ndarray, field: int) -> np.ndarray:
    """(n, k64) standard-form words -> Montgomery-form words."""
    L = lib()
    w = np.ascontiguousarray(words, dtype=np.uint64)
    out = np.empty_like(w)
    L.mont_encode_batch(w, out, w.shape[0], field)
    return out


def mont_decode(words: np.ndarray, field: int) -> np.ndarray:
    L = lib()
    w = np.ascontiguousarray(words, dtype=np.uint64)
    out = np.empty_like(w)
    L.mont_decode_batch(w, out, w.shape[0], field)
    return out
