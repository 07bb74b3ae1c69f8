#!/bin/bash
# One-shot on-chip sequence for round 2: validation (quick, then full),
# then the headline bench (inner, persisted via BENCH_BEST.json).
# Safe to re-run; logs to .round2/.
set -u
cd /root/repo
mkdir -p .round2
STAMP=$(date +%H%M%S)
echo "=== on-chip round2 sequence start $STAMP ===" | tee -a .round2/onchip.log

timeout 1800 python -u scripts/tpu_validation.py --quick 2>&1 | tee .round2/val_quick_$STAMP.log | grep --line-buffered -E "OK |FAIL|ALL|devices" >> .round2/onchip.log
timeout 5400 python -u scripts/tpu_validation.py 2>&1 | tee .round2/val_full_$STAMP.log | grep --line-buffered -E "OK |FAIL|ALL|ms|pairs|blocked|devices" >> .round2/onchip.log

# headline bench: parent watchdog persists BENCH_BEST.json on success
SIGBENCH_ATTEMPTS=1 SIGBENCH_TIMEOUT_S=3000 timeout 3300 python -u bench.py 2>&1 | tee -a .round2/onchip.log
echo "=== sequence done $(date +%H%M%S) ===" | tee -a .round2/onchip.log
