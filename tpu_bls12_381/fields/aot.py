"""AOT export cache for the Pallas kernel entry points.

The cold-start problem (artifacts/COLDSTART_*.json): the unrolled limb
kernels cost ~75 s of HOST-side work per kernel instance — jax tracing
(~40k jnp calls) plus jaxpr->MLIR Mosaic lowering — and that cost is
paid per (kernel, flattened width) in EVERY process, even when every
XLA compile hits the persistent compilation cache (measured: first MSM
call ~350 s with 62 cache hits and zero compiles).  The reference has
no analog problem: its kernels are compiled once by nvcc at build time
(bls12-381/CMakeLists.txt); this module is the build-time-compile
equivalent for the JAX world.

Mechanism: the first time a kernel entry runs at a given width,
``jax.export`` traces + lowers it ONCE and the serialized StableHLO
module (with the Mosaic payload embedded) is written to a disk cache.
Every later use — in this process or any other — deserializes and calls
the exported module: no kernel tracing, no Mosaic lowering; the XLA
backend compile of the module is covered by the persistent compilation
cache.  ``Exported.call`` is traceable, so kernel calls inside the
jitted MSM/NTT stage graphs inline the cached module and the stage
traces stay cheap too.

Scope guards: disabled off-TPU (CPU CI runs Pallas in interpret mode),
under vmap/pmap transforms (the exported-call primitive has no batching
rule), and by MIDNIGHT_AOT_CACHE=0.  Any failure falls back to the
plain jitted path — the cache is an accelerator, never a correctness
dependency.
"""

from __future__ import annotations

import hashlib
import logging
import os
import threading

import jax

logger = logging.getLogger("tpu_bls12_381.aot")

_MEM: dict = {}
_JITS: dict = {}
_LOCK = threading.Lock()
_SRC_HASH: str | None = None
_ENABLED: bool | None = None


def _enabled() -> bool:
    global _ENABLED
    if _ENABLED is None:
        if os.environ.get("MIDNIGHT_AOT_CACHE", "1") == "0":
            _ENABLED = False
        else:
            try:
                _ENABLED = jax.default_backend() == "tpu"
            except Exception:
                _ENABLED = False
    return _ENABLED


def _cache_dir() -> str:
    env = os.environ.get("MIDNIGHT_AOT_CACHE_DIR")
    if env:
        return env
    # Per-user, not the world-shared /tmp: cache entries are executed
    # code (deserialized StableHLO modules), so a predictable shared
    # path would let another local user plant modules.
    home = os.path.expanduser("~")
    if home and home != "~":
        return os.path.join(home, ".cache", "tpu_bls12_381_aot")
    return f"/tmp/tpu_bls12_381_aot_cache_{os.getuid()}"


def _makedirs_private(path: str) -> None:
    os.makedirs(path, mode=0o700, exist_ok=True)


def _source_hash() -> str:
    """Hash of EVERY package source + jax version.

    Exported stage graphs (msm/pippenger.py stages, ntt stages) inline
    logic from arbitrary package modules — points.py, ops.py, tuning,
    field_adapters — so hashing only the Pallas kernel files left a
    stale-cache hole: edit a stage body and a warm cache silently
    replayed the old code.  Hashing the whole package is ~100 kB once
    per process and makes any source edit invalidate every key."""
    global _SRC_HASH
    if _SRC_HASH is None:
        h = hashlib.sha256(jax.__version__.encode())
        base = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for dirpath, dirnames, filenames in sorted(os.walk(base)):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, fn), base)
                try:
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        h.update(rel.encode())
                        h.update(f.read())
                except OSError:
                    pass
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _args_ok(args) -> bool:
    """True when every arg is a concrete array or a plain jit tracer
    (exported calls inline fine under jit; vmap/pmap tracers do not)."""
    try:
        from jax._src.interpreters.partial_eval import DynamicJaxprTracer
    except ImportError:  # pragma: no cover - jax internals moved
        return not any(isinstance(a, jax.core.Tracer) for a in args)
    for a in args:
        if isinstance(a, jax.core.Tracer) and not isinstance(
                a, DynamicJaxprTracer):
            return False
    return True


def _key(tag: str, leaves, treedef) -> str:
    sig = ",".join(f"{a.dtype}{list(a.shape)}" for a in leaves)
    raw = f"{tag}|{sig}|{treedef}|{_source_hash()}"
    safe = "".join(c if c.isalnum() or c in "._-" else "_"
                   for c in tag.split("|")[0])[:48]
    return f"{safe}-{hashlib.sha256(raw.encode()).hexdigest()[:24]}"


def dispatch(tag: str, jit_fn, args, lazy: bool = False):
    """Run ``jit_fn(*args)`` through the AOT export cache when possible.

    ``args`` may be pytrees (stage inputs are coordinate trees).  With
    ``lazy`` the second parameter is a zero-arg builder returning the
    jitted function — only invoked on a cache miss or fallback, so hot
    paths never construct throwaway jit wrappers."""
    def plain():
        # memoize lazily-built jits by tag: a fresh jit object per call
        # would discard jax's trace cache (statics are baked into tag)
        if not lazy:
            return jit_fn
        fn = _JITS.get(tag)
        if fn is None:
            fn = jit_fn()
            with _LOCK:
                _JITS[tag] = fn
        return fn

    leaves = jax.tree_util.tree_leaves(args)
    if not _enabled() or not _args_ok(leaves):
        return plain()(*args)
    treedef = jax.tree_util.tree_structure(args)
    key = _key(tag, leaves, treedef)
    exp = _MEM.get(key)
    if exp is None:
        exp = _load(key)
        if exp is None:
            exp = _build(tag, key, plain(), args)
        if exp is None:
            return plain()(*args)
        with _LOCK:
            _MEM[key] = exp
    try:
        return exp.call(*args)
    except Exception as e:  # pragma: no cover - defensive
        logger.warning("aot call failed for %s (%s); plain jit", tag, e)
        return plain()(*args)


def _build(tag, key, jit_fn, args):
    try:
        from jax import export as jexport

        shapes = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)
        exp = jexport.export(jit_fn)(*shapes)
        try:
            _makedirs_private(_cache_dir())
            tmp = os.path.join(_cache_dir(), f".{key}.{os.getpid()}")
            with open(tmp, "wb") as f:
                f.write(exp.serialize())
            os.replace(tmp, os.path.join(_cache_dir(), key))
        except OSError as e:
            logger.info("aot cache write failed for %s: %s", tag, e)
        return exp
    except Exception as e:
        logger.warning("aot export failed for %s (%s); plain jit", tag, e)
        return None


def _load(key):
    path = os.path.join(_cache_dir(), key)
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    try:
        from jax import export as jexport

        return jexport.deserialize(bytearray(data))
    except Exception as e:  # stale/corrupt entry: drop it
        logger.info("aot cache entry %s unreadable (%s); removing", key, e)
        try:
            os.unlink(path)
        except OSError:
            pass
        return None
