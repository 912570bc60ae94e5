#!/usr/bin/env bash
# One-shot TPU measurement session (resilient to a flaky axon relay): runs
# the round-3 pending measurements in cheapest-information-first order,
# appending everything to $LOG. Designed to be launched in the background
# the moment the relay answers and left alone (each stage is timeout-bound;
# a wedged relay fails a stage, not the script).
#
#   bash scripts/tpu_session.sh [stage...]     # default: all stages
#   tail -f /tmp/tpu_session.log
#
# Stages:
#   probe    scripts/probe_dyngather.py (does jnp.take lower? is it fast?)
#   interp   windowed-interp TPU parity tests + opbench interp micro
#   dyng     CSN_DYNG parity tests + conv micro A/B (skips if probe failed)
#   bench    headline train bench + infer + cached-eval
#   sweep    narrow-window sweep (CSN_W_SAME x CSN_CAP_MULT) conv micro

set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_session.log}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}
STAGES=${*:-probe interp dyng bench sweep}

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
    probe)
      run_stage 2400 probe_dyngather python scripts/probe_dyngather.py
      ;;
    interp)
      run_stage 3600 interp_tpu_tests env RUN_TPU_TESTS=1 \
        python -m pytest tests/test_interp_window_tpu.py -q --no-header
      run_stage 3600 opbench_interp env OPBENCH_ONLY=interp \
        python scripts/opbench.py
      ;;
    dyng)
      if grep -q "COMPILES" "$LOG" 2>/dev/null; then
        run_stage 5400 dyng_parity env RUN_TPU_TESTS=1 \
          python -m pytest tests/test_flash_tpu.py -q --no-header \
          -k dyngather
        run_stage 3600 conv_micro_base env OPBENCH_ONLY=same0k3 \
          python scripts/opbench.py
        run_stage 3600 conv_micro_dyng1 env OPBENCH_ONLY=same0k3 \
          CSN_DYNG=1 python scripts/opbench.py
        run_stage 3600 conv_micro_dyng2 env OPBENCH_ONLY=same0k3 \
          CSN_DYNG=2 python scripts/opbench.py
        run_stage 3600 conv_micro_dyng3 env OPBENCH_ONLY=same0k3 \
          CSN_DYNG=3 python scripts/opbench.py
        run_stage 3600 stem_micro_base env OPBENCH_ONLY=same0k5 \
          python scripts/opbench.py
        run_stage 3600 stem_micro_dyng1 env OPBENCH_ONLY=same0k5 \
          CSN_DYNG=1 python scripts/opbench.py
      else
        say "SKIP dyng (probe did not report COMPILES)"
      fi
      ;;
    bench)
      run_stage 3600 bench_train python bench.py
      run_stage 1800 bench_infer env BENCH_MODE=infer python bench.py
      run_stage 1800 bench_cached env BENCH_MODE=infer BENCH_CACHED=1 \
        python bench.py
      ;;
    sweep)
      run_stage 3600 sweep_w256 env OPBENCH_ONLY=same0k3 CSN_W_SAME=256 \
        CSN_CAP_MULT=2.0 python scripts/opbench.py
      run_stage 3600 sweep_w128 env OPBENCH_ONLY=same0k3 CSN_W_SAME=128 \
        CSN_CAP_MULT=4.0 python scripts/opbench.py
      ;;
    *)
      say "unknown stage $s"
      ;;
  esac
done

say "session done"
