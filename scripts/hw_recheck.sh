#!/bin/bash
# One-shot hardware re-verification after a tunnel outage: checklist +
# bench headline + the newest operator configs. Run from the repo root
# with the default (axon) environment. Appends to hw_recheck.log.
set -u
cd "$(dirname "$0")/.."
log=hw_recheck.log
echo "=== hw_recheck $(date -u +%FT%TZ) ===" | tee -a $log
probe() { timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tail -1; }
echo "probe: $(probe)" | tee -a $log
timeout 3000 python scripts/tpu_check.py 2>&1 | tee -a $log
timeout 1200 python bench.py 2>&1 | tee -a $log
BENCH_ONLY=scan_by_key,window,outer_join,quantile \
  timeout 2400 python scripts/bench_suite.py 2>&1 | tee -a $log
echo "=== done $(date -u +%FT%TZ) ===" | tee -a $log
