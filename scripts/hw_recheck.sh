#!/bin/bash
# One-shot hardware re-verification after a tunnel outage: checklist +
# bench headline + the newest operator configs. Run from the repo root
# with the default (axon) environment. Appends to hw_recheck.log.
# Fails loudly: per-step exit codes, a final PASS k/n line, exit nonzero
# on any failure (VERDICT r2 Next #8).
set -u
cd "$(dirname "$0")/.."
log=hw_recheck.log
echo "=== hw_recheck $(date -u +%FT%TZ) ===" | tee -a $log
probe() { timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1; }
echo "probe: $(probe)" | tee -a $log

declare -a names rcs
run_step() {
  local name=$1 to=$2; shift 2
  echo "--- step: $name ---" | tee -a $log
  timeout "$to" "$@" 2>&1 | tee -a $log
  local rc=${PIPESTATUS[0]}
  names+=("$name"); rcs+=("$rc")
  echo "--- step $name exit=$rc ---" | tee -a $log
}

run_step tpu_check 4000 python scripts/tpu_check.py
run_step bench 1500 python bench.py
BENCH_ONLY=scan_by_key,window,outer_join,quantile,sort_pairs \
  run_step bench_suite 3600 python scripts/bench_suite.py

fails=0
for i in "${!names[@]}"; do
  if [ "${rcs[$i]}" -ne 0 ]; then
    echo "FAIL: ${names[$i]} (exit ${rcs[$i]})" | tee -a $log
    fails=$((fails+1))
  fi
done
total=${#names[@]}
echo "hw_recheck: PASS $((total-fails))/$total" | tee -a $log
echo "=== done $(date -u +%FT%TZ) ===" | tee -a $log
exit $((fails > 0 ? 1 : 0))
