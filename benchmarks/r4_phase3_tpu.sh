#!/bin/bash
# Round-4 phase-3 TPU queue: (a) terminal-floor decomposition (VERDICT
# r3 item 3 follow-through), (b) whole-step heads A/B incl. heads=1
# (levers.json follow-up), (c) full-scale quality check for the heads=2
# encoder (dh=128, no lane padding) before deciding the default.
# Two attempts per job (remote Mosaic compile flake).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_phase3.log
: > "$LOG"

run_job() {
  local name="$1"; shift
  for attempt in 1 2; do
    echo "=== $name (attempt $attempt) $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout 3600 "$@" >> "$LOG" 2>&1
    rc=$?
    echo "=== $name rc=$rc ===" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  echo "=== $name FAILED twice ===" >> "$LOG"
  return 1
}

run_job uq_floor python benchmarks/uq_floor.py --repeats 15
run_job levers_steps python benchmarks/train_levers.py --steps-only
run_job flagship_h2 python benchmarks/flagship_fullscale.py run \
  --model condunet --seed 42 --heads 2
echo "=== phase3 done $(date -u +%H:%M:%S) ===" >> "$LOG"
