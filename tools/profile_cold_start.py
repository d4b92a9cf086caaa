"""Cold-start breakdown: where does the first MSM call's compile time go?

Runs ONE G1 MSM at BENCH_LOG_N (default 20) with `jax_log_compiles`
enabled and a configurable persistent-cache dir, and writes a JSON
breakdown of every XLA compile (jit name, seconds) plus the end-to-end
first-call wall time to artifacts/COLDSTART.json.

The reference's warmup is a 256-point MSM that triggers CUDA JIT/alloc
(core/msm.rs:931-956) and is effectively free; here every staged jit is
shape-specialized so the first call at a new size pays real XLA compiles.
This tool answers (a) which stage dominates and (b) what the persistent
compile cache buys a warm process:

    COLD=1 python tools/profile_cold_start.py      # fresh cache dir
    python tools/profile_cold_start.py             # reuse cache (warm path)
"""

from __future__ import annotations

import json
import logging
import os
import re
import sys
import tempfile
import time

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cache_dir = os.environ.get("BENCH_CACHE_DIR", "/tmp/tpu_bls12_381_jax_cache")
if os.environ.get("COLD"):
    # true cold start: fresh XLA persistent cache AND fresh AOT export
    # cache (fields/aot.py)
    cache_dir = tempfile.mkdtemp(prefix="tpu_bls_coldcache_")
    os.environ["MIDNIGHT_AOT_CACHE_DIR"] = tempfile.mkdtemp(
        prefix="tpu_bls_coldaot_")
# bench.py (imported below for input builders) re-applies the cache dir
# from BENCH_CACHE_DIR at import time — keep the two in agreement
os.environ["BENCH_CACHE_DIR"] = cache_dir
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_log_compiles", True)


class _CompileLog(logging.Handler):
    """Collect 'Finished XLA compilation of <name> in <secs> sec' records."""

    PAT = re.compile(r"Finished XLA compilation of (\S+) in ([0-9.]+) sec")

    def __init__(self):
        super().__init__()
        self.entries: list[dict] = []

    def emit(self, record):
        m = self.PAT.search(record.getMessage())
        if m:
            self.entries.append(
                {"name": m.group(1), "secs": float(m.group(2))})


def main():
    log_n = int(os.environ.get("BENCH_LOG_N", "20"))
    handler = _CompileLog()
    # the "jax" root only: child loggers (jax._src.compiler etc.) propagate
    # up, so attaching to both double-counts every compile
    logging.getLogger("jax").addHandler(handler)
    logging.getLogger("jax").setLevel(logging.DEBUG)

    sys.path.insert(0, _REPO)
    from bench import _random_fr_mont, _random_g1_batch
    from tpu_bls12_381.msm import msm_g1
    from tpu_bls12_381.runtime.tracing import fence

    n = 1 << log_n
    t_setup0 = time.perf_counter()
    scalars = _random_fr_mont(n)
    A = _random_g1_batch(n)
    jax.block_until_ready(A)
    setup_s = time.perf_counter() - t_setup0
    n_setup_compiles = len(handler.entries)

    t0 = time.perf_counter()
    fence(msm_g1(scalars, A))
    first_call_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    fence(msm_g1(scalars, A))
    warm_call_s = time.perf_counter() - t1

    msm_compiles = handler.entries[n_setup_compiles:]
    msm_compile_total = sum(e["secs"] for e in msm_compiles)
    top = sorted(msm_compiles, key=lambda e: -e["secs"])[:20]
    out = {
        "log_n": log_n,
        "cache_dir": cache_dir,
        "cold": bool(os.environ.get("COLD")),
        "device": jax.devices()[0].platform,
        "setup_s": round(setup_s, 3),
        "first_call_s": round(first_call_s, 3),
        "warm_call_s": round(warm_call_s, 4),
        "msm_compile_total_s": round(msm_compile_total, 3),
        "msm_compile_count": len(msm_compiles),
        "top_compiles": [
            {"name": e["name"], "secs": round(e["secs"], 3)} for e in top],
    }
    os.makedirs(os.path.join(_REPO, "artifacts"), exist_ok=True)
    suffix = "cold" if out["cold"] else "warm"
    path = os.path.join(_REPO, "artifacts", f"COLDSTART_{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"# written to {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
