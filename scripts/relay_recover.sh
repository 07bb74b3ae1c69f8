#!/bin/bash
# Poll the TPU relay; on recovery run the round-2 sequence:
#   1. on-chip value checks of the newest kernel paths (refine repro +
#      collapse/stack-sharing checks) -- value safety BEFORE any bench
#   2. the stretch-shear breakdown probe
#   3. bench.py (persists BENCH_BEST only on improvement)
#   4. full tpu_validation
# Logs to .round2/recover.log. Exits after one full pass.
set -u
cd /root/repo
mkdir -p .round2
LOG=.round2/recover.log

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0
print('RELAY_OK')
" 2>/dev/null | grep -q RELAY_OK
}

echo "recover watcher start $(date +%H%M%S)" >> $LOG
while true; do
  if probe; then
    echo "relay healthy $(date +%H%M%S)" >> $LOG
    echo "--- value checks" >> $LOG
    timeout 1500 python -u /tmp/refine_repro.py >> $LOG 2>&1
    timeout 1800 python -u /tmp/onchip_checks.py >> $LOG 2>&1
    if grep -q "BAD\|FAIL\|Error" $LOG; then
      echo "VALUE CHECKS FAILED -- not benching" >> $LOG
      break
    fi
    echo "--- stretch breakdown" >> $LOG
    timeout 1500 python -u /tmp/stretch_breakdown.py >> $LOG 2>&1
    echo "--- bench" >> $LOG
    SIGBENCH_ATTEMPTS=1 SIGBENCH_TIMEOUT_S=2700 timeout 3000 \
      python -u bench.py >> $LOG 2>&1
    echo "--- validation" >> $LOG
    timeout 3000 python -u scripts/tpu_validation.py >> $LOG 2>&1
    echo "recover pass done $(date +%H%M%S)" >> $LOG
    break
  fi
  sleep 120
done
