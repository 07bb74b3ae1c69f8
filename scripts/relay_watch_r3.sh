#!/bin/bash
# Round-3 relay watcher: poll the TPU relay; on recovery run the queued
# on-chip work in order (value checks BEFORE any timing), logging to
# .round3/. Exits after one full pass. Safe to re-run.
set -u
cd /root/repo
mkdir -p .round3
LOG=.round3/watch.log

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0
print('RELAY_OK')
" 2>/dev/null | grep -q RELAY_OK
}

echo "r3 watcher start $(date +%H%M%S)" >> $LOG
while true; do
  if probe; then
    echo "relay healthy $(date +%H%M%S)" >> $LOG
    echo "--- canonical flow (on-chip)" >> $LOG
    PYTHONPATH=/root/repo timeout 1800 python -u /tmp/canonical_flow.py \
      >> $LOG 2>&1
    echo "--- stage probe" >> $LOG
    timeout 2400 python -u scripts/stage_probe.py >> $LOG 2>&1
    echo "r3 watcher pass done $(date +%H%M%S)" >> $LOG
    break
  fi
  sleep 120
done
