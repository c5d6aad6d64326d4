#!/bin/bash
# Round-5 phase-1 TPU queue: make every default-setting quality gate
# spread-aware (VERDICT r4 items 2+4). All runs use the CURRENT training
# code, full reference scale (5,076 x 4693 x 14, 500 epochs), and record
# CRPS/SBC alongside WSSE closure:
#   1. baseline flagship s42: eval-from-checkpoint (round-4 ckpt is
#      current-code; adds the CRPS/SBC fields its result.json predates)
#   2-3. baseline flagship s43/s44 retrains (round-3-era results lack
#      CRPS and were produced by superseded code)
#   4-5. min-SNR-5 s43/s44 (s42 exists with CRPS) -> 3-seed adoption gate
#   6-11. heads=1 / heads=2 at s42/s43/s44 -> 3-seed retirement re-check
# Each job gets 2 attempts (the remote Mosaic compile flakes once, then
# works - CLAUDE.md) under a hard timeout.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_phase1.log
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

FS="benchmarks/flagship_fullscale.py"
run_job base_s42_eval python $FS eval --model condunet --seed 42
run_job base_s43 python $FS run --model condunet --seed 43
run_job base_s44 python $FS run --model condunet --seed 44
run_job minsnr_s43 python $FS run --model condunet --seed 43 --loss-weighting min_snr
run_job minsnr_s44 python $FS run --model condunet --seed 44 --loss-weighting min_snr
run_job h1_s42 python $FS run --model condunet --seed 42 --heads 1
run_job h1_s43 python $FS run --model condunet --seed 43 --heads 1
run_job h1_s44 python $FS run --model condunet --seed 44 --heads 1
run_job h2_s42 python $FS run --model condunet --seed 42 --heads 2
run_job h2_s43 python $FS run --model condunet --seed 43 --heads 2
run_job h2_s44 python $FS run --model condunet --seed 44 --heads 2
echo "=== phase1 done $(date -u +%H:%M:%S) ===" >> "$LOG"
