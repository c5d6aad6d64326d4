#!/bin/bash
# Round-4 phase-2 TPU queue: the two full-scale verdicts STATUS.md r3
# cited but never committed (VERDICT r3 item 1), on the phase-1
# checkpoints. Two attempts per job (remote Mosaic compile flake).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_phase2.log
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

run_job guidance_interval python benchmarks/uq_guidance_interval.py \
  --seed 42 --g 0.7 --temp 1.5
run_job deep_ensemble python benchmarks/uq_deep_ensemble.py uq \
  --seeds 42,123,7
echo "=== phase2 done $(date -u +%H:%M:%S) ===" >> "$LOG"
