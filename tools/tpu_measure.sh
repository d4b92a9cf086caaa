#!/usr/bin/env bash
# Turnkey real-TPU measurement pass: runs every TPU-gated artifact step
# in priority order, appending to MEASURE_LOG (default /tmp/tpu_measure.log).
# Each step is independent and timeout-guarded so a flaky tunnel or a
# single regression doesn't lose the rest.
#
# Usage: tools/tpu_measure.sh [step ...]     # default: all steps
# Steps: probe msm20 msm22 ntt22 g2_16 g2_18 batch sol suite e2e msm24
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts
LOG=${MEASURE_LOG:-artifacts/tpu_measure.log}
STEPS=("$@")
[ ${#STEPS[@]} -eq 0 ] && STEPS=(probe msm20 msm22 ntt22 g2_16 g2_18 batch sol suite suite_golden e2e msm24 scaling)

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" 2>&1 | tee -a "$LOG"
  local rc=${PIPESTATUS[0]}
  echo "--- $name rc=$rc" | tee -a "$LOG"
  return 0
}

for s in "${STEPS[@]}"; do
  case $s in
    probe) run probe 120 python -c "import jax; print(jax.devices())" ;;
    msm20) BENCH_LOG_N=20 run msm20 1800 python bench.py ;;
    msm22) BENCH_LOG_N=22 run msm22 2400 python bench.py ;;
    ntt22) BENCH_METRIC=ntt BENCH_LOG_N=22 run ntt22 1200 python bench.py ;;
    ntt23) BENCH_METRIC=ntt BENCH_LOG_N=23 run ntt23 1800 python bench.py ;;
    msm22_glv1) MIDNIGHT_MSM_GLV=1 MIDNIGHT_MSM_HBM_BUDGET_MB=14000 BENCH_LOG_N=22 \
           run msm22_glv1 2400 python bench.py ;;
    g2_16) BENCH_METRIC=g2 BENCH_LOG_N=16 run g2_16 1800 python bench.py ;;
    g2_18) BENCH_METRIC=g2 BENCH_LOG_N=18 run g2_18 2400 python bench.py ;;
    batch) BENCH_METRIC=batch BENCH_LOG_N=16 BENCH_BATCH=8 run batch 2400 python bench.py ;;
    sol)   run sol 2400 python bench_kernels.py ;;
    suite) SUITE_FILES="tests/test_pallas_ops.py tests/test_fourstep.py tests/test_projective.py" \
           run suite 3600 tests/run_suite.sh --tpu ;;
    suite_golden) SUITE_FILES="tests/test_golden.py tests/test_tpu_smoke.py" SUITE_APPEND=1 \
           run suite_golden 3600 tests/run_suite.sh --tpu ;;
    e2e)   BENCH_E2E_KS=${BENCH_E2E_KS:-14,16,18,20,22} run e2e 7200 python bench_e2e.py ;;
    msm24) BENCH_LOG_N=24 BENCH_REPS=1 run msm24 3600 python bench.py ;;
    coldstart) COLD=1 run coldstart 1800 python tools/profile_cold_start.py
               run coldwarm 900 python tools/profile_cold_start.py ;;
    scaling) BENCH_FORCE_CPU=1 XLA_FLAGS="--xla_force_host_platform_device_count=8" \
             run scaling 3600 python bench_scaling.py ;;
    *) echo "unknown step: $s" ;;
  esac
done
echo "=== done ($(date -u +%H:%M:%SZ)) ===" | tee -a "$LOG"
