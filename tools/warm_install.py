"""Install-step cache warmer: pre-seed the AOT export + XLA caches.

True cold start at 2^20 is ~350 s (artifacts/COLDSTART_NOTES.md): host
tracing + Mosaic lowering of the unrolled limb kernels plus the XLA
backend compiles, paid once per (kernel, width).  The reference pays the
analogous cost at BUILD time (nvcc compiles every kernel,
bls12-381/CMakeLists.txt); this script is that build step for the JAX
world — run it once at install/deploy time and every later process
starts warm (measured: first 2^20 MSM call drops from ~350 s to ~17 s,
first 2^16 call to ~6 s).

Usage:
    python tools/warm_install.py                 # default production set
    WARM_MSM_LOGS=16,20,22 WARM_NTT_LOGS=22,23 python tools/warm_install.py

Warms, per size: the G1 MSM staged pipeline (GLV auto, the production
config), and the NTT at the listed domains (four-step or ladder, as the
router chooses).  Caches land in MIDNIGHT_AOT_CACHE_DIR (default
~/.cache/tpu_bls12_381_aot) and the XLA persistent compilation cache.
"""

from __future__ import annotations

import os
import sys
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("BENCH_CACHE_DIR", "/tmp/tpu_bls12_381_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    from bench import _random_fr_mont, _random_g1_batch
    from tpu_bls12_381.fields import FR
    from tpu_bls12_381.msm import msm_g1
    from tpu_bls12_381.ntt import get_domain, ntt
    from tpu_bls12_381.runtime.tracing import fence

    msm_logs = [int(k) for k in
                os.environ.get("WARM_MSM_LOGS", "16,20").split(",") if k]
    ntt_logs = [int(k) for k in
                os.environ.get("WARM_NTT_LOGS", "21,22").split(",") if k]

    for lg in msm_logs:
        n = 1 << lg
        t0 = time.perf_counter()
        sc = _random_fr_mont(min(n, n))
        A = _random_g1_batch(n)
        jax.block_until_ready(A)
        fence(msm_g1(sc, A))
        print(f"# warmed msm 2^{lg} in {time.perf_counter() - t0:.1f}s",
              flush=True)
        del sc, A

    import numpy as np
    import jax.numpy as jnp

    for lg in ntt_logs:
        t0 = time.perf_counter()
        dom = get_domain(lg)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.integers(
            0, 1 << 16, size=(FR.num_limbs, 1 << lg),
            dtype=np.uint64)).astype(jnp.uint32)
        fence(ntt(x, domain=dom))
        print(f"# warmed ntt 2^{lg} in {time.perf_counter() - t0:.1f}s",
              flush=True)
        del x

    print("# warm_install done")


if __name__ == "__main__":
    main()
