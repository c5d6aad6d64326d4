#!/bin/bash
# Round-4 phase-1 TPU queue: retrain the full-scale checkpoints that the
# two missing VERDICT verdicts need (the round-3 teachers were cleaned;
# only distilled students were committed).
#   1. CFG flagship (condunet-cfg_s42)  -> guidance_interval sweep input
#   2-4. deep-ensemble members s42/s123/s7 (shared split_seed=42)
# Each job gets 2 attempts (the remote Mosaic compile flakes once, then
# works — CLAUDE.md) under a hard timeout.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_phase1.log
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

run_job cfg_s42 python benchmarks/flagship_fullscale.py run \
  --model condunet --seed 42 --uncond-prob 0.1
run_job member_s42 python benchmarks/uq_deep_ensemble.py train --seed 42
run_job member_s123 python benchmarks/uq_deep_ensemble.py train --seed 123
run_job member_s7 python benchmarks/uq_deep_ensemble.py train --seed 7
echo "=== phase1 done $(date -u +%H:%M:%S) ===" >> "$LOG"
