#!/bin/bash
# Watch for the tunneled TPU chip to return, then run the round-4 suite.
# Probes serially (one TPU client at a time) and respects the suite's
# hard deadline so a late chip return cannot collide with the round-end
# bench run.
cd "$(dirname "$0")/.." || exit 1
DEADLINE=${SUITE_DEADLINE_EPOCH:-1787050800}   # 2026-08-18 11:00 UTC
while true; do
  left=$((DEADLINE - $(date +%s)))
  if [ "$left" -lt 900 ]; then
    echo "watch: deadline reached with chip still down" >> r04_suite.log
    exit 2
  fi
  if timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "watch: chip reachable, launching suite" >> r04_suite.log
    exec bash examples/r04_tpu_suite.sh
  fi
  sleep 240
done
