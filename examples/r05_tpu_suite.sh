#!/bin/bash
# Round-5 TPU measurement suite. Stages run strictly serially (one TPU
# client at a time; see .claude/skills/verify). Value-ordered: the
# VERDICT r4 done-criteria artifacts land first if the chip window is
# short.
#
#   bash examples/r05_tpu_suite.sh
#
# Stages:
#   1. probe           — abort early if the chip is unreachable
#   2. bench_ops       — roofline denominators (adds f32 matmul + int8
#                        gather rows consumed by bench.py's roofline field)
#   3. pressure_sweep  — fused native stage path: >=3 repeats per budget
#                        (VERDICT r4 next #1 done-criteria)
#   4. flagship_tune   — headline grid + the new GAT rows (next #3)
#   5. reference_scale — 10M-node dim-1024 single-chip run (next #2;
#                        --generate must have been run beforehand)
#   6. node_local_ab   — node_local degenerate-group overhead row (next #8)
cd "$(dirname "$0")/.." || exit 1
LOG=r05_suite.log
: > "$LOG"

# Hard deadline: the round driver runs bench.py on the same single chip at
# round end — a still-running stage would deadlock it.
DEADLINE=${SUITE_DEADLINE_EPOCH:-1787219100}   # 2026-08-20 10:25 UTC

stage() {
  local name=$1 tmo=$2; shift 2
  local left=$((DEADLINE - $(date +%s)))
  if [ "$left" -lt 120 ]; then
    echo "=== $name SKIPPED (past deadline) ===" | tee -a "$LOG"
    return 9
  fi
  [ "$tmo" -gt "$left" ] && tmo=$left
  echo "=== $name start $(date +%H:%M:%S) (tmo=${tmo}s) ===" | tee -a "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== $name exit=$rc $(date +%H:%M:%S) ===" | tee -a "$LOG"
  return $rc
}

stage probe 300 python -c "import jax; print(jax.devices())" || {
  echo "TPU unreachable — suite aborted" | tee -a "$LOG"; exit 2; }

stage bench_ops 2400 python examples/bench_ops.py --cache_gather \
  --json BENCH_OPS_r05.json
# window 128: the staged transfer ships each cold row at most once per
# window, so longer windows amortize the per-transfer tunnel jitter
# (measured ~40ms real vs up-to-seconds stalls) across 4x the steps
stage pressure_sweep 7200 python examples/pressure_sweep.py \
  --window 128 --steps 256 --out PRESSURE_SWEEP_r05.json
stage flagship_tune 7200 python examples/flagship_tune.py \
  --out FLAGSHIP_TUNE_r05.json
stage reference_scale 3600 python examples/reference_scale.py --run \
  --out REFSCALE_r05.json
stage node_local_ab 1800 python examples/node_local_ab.py \
  --out NODE_LOCAL_AB_r05.json

echo "suite done $(date +%H:%M:%S)" | tee -a "$LOG"
ls -la BENCH_OPS_r05.json PRESSURE_SWEEP_r05.json FLAGSHIP_TUNE_r05.json \
  REFSCALE_r05.json NODE_LOCAL_AB_r05.json 2>&1 | tee -a "$LOG"
