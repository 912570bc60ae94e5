#!/usr/bin/env bash
# One-shot TPU measurement/validation session (resilient to a flaky axon
# relay): runs the standing hardware checks in cheapest-information-first
# order, appending everything to $LOG. Designed to be launched in the
# background the moment the relay answers and left alone (each stage is
# timeout-bound; a wedged relay fails a stage, not the script).
#
#   bash scripts/tpu_session.sh [stage...]     # default: all stages
#   tail -f /tmp/tpu_session.log
#
# Stages:
#   tests    full RUN_TPU_TESTS=1 hardware suite (flash, windowed conv
#            variants, interp kernels, e2e)
#   bench    headline train bench + infer + cached-eval
#   trace    BENCH_TRACE capture + trace_budget per-op breakdown
#
# Historical stages (probe/interp/dyng/sweep) are CLOSED with recorded
# verdicts — see STATUS.md "Perf measurement series": dynamic gathers can
# never lower on v5e (single source vreg), W=384 measured optimal, banked/
# packed one-hot refuted, windowed interp live.

set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_session.log}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-$PWD/.jaxcache}
STAGES=${*:-tests bench trace}

say() { echo "=== [$(date +%H:%M:%S)] $*" >>"$LOG"; }

run_stage() {  # run_stage <seconds> <label> <cmd...>
  local t=$1 label=$2; shift 2
  say "START $label"
  timeout "$t" "$@" >>"$LOG" 2>&1
  local rc=$?
  say "END $label rc=$rc"
  return $rc
}

say "session start: stages=[$STAGES]"

for s in $STAGES; do
  case $s in
    tests)
      run_stage 7200 tpu_tests env RUN_TPU_TESTS=1 \
        python -m pytest tests/test_flash_tpu.py \
        tests/test_interp_window_tpu.py tests/test_window_conv_trace.py \
        -q --no-header
      run_stage 1800 learning_seg python scripts/learning_check.py --task seg
      run_stage 1800 learning_midfc \
        python scripts/learning_check.py --task midfc
      ;;
    bench)
      # session runs are not driver-timeout-bound: give the in-bench
      # watchdog the stage's full budget so a cold compile never
      # self-aborts at the 480s driver default
      run_stage 3600 bench_train env BENCH_BUDGET_S=3500 python bench.py
      run_stage 1800 bench_infer env BENCH_MODE=infer BENCH_BUDGET_S=1700 python bench.py
      run_stage 1800 bench_cached env BENCH_MODE=infer BENCH_CACHED=1 \
        BENCH_BUDGET_S=1700 python bench.py
      run_stage 1800 bench_midfc env BENCH_MODE=midfc BENCH_BUDGET_S=1700 python bench.py
      ;;
    trace)
      run_stage 3600 bench_trace env BENCH_TRACE=/tmp/trace BENCH_BUDGET_S=3500 python bench.py
      run_stage 600 trace_budget python scripts/trace_budget.py /tmp/trace
      ;;
    *)
      say "unknown stage $s"
      ;;
  esac
done

say "session done"
