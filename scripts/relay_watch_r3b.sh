#!/bin/bash
# Round-3 session-2 relay watcher: on recovery run the queued on-chip
# work in order (value checks before timings). Exits after one pass.
set -u
cd /root/repo
LOG=/tmp/r3b_chipwork.log

probe() {
  timeout 90 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0
print('RELAY_OK')
" 2>/dev/null | grep -q RELAY_OK
}

echo "r3b watcher start $(date +%H%M%S)" >> $LOG
while true; do
  if probe; then
    echo "RELAY RECOVERED $(date +%H:%M:%S)" > /tmp/relay_status.txt
    echo "relay healthy $(date +%H%M%S)" >> $LOG
    echo "--- dil (base-lane value A/B + timings)" >> $LOG
    timeout 3000 bash -c 'WINCHECK_MODE=dil SIG_BASE_LANES=0 python -u scripts/onchip_window_check.py' >> $LOG 2>&1
    echo "--- wprobe (fixed-window step cost)" >> $LOG
    timeout 3000 bash -c 'WINCHECK_MODE=wprobe python -u scripts/onchip_window_check.py' >> $LOG 2>&1
    echo "--- interleave timings" >> $LOG
    timeout 2000 python -u scripts/interleave_probe.py >> $LOG 2>&1
    echo "chipwork pass done $(date +%H%M%S)" >> $LOG
    break
  fi
  echo "wedged $(date +%H:%M:%S)" > /tmp/relay_status.txt
  sleep 120
done
