#!/bin/bash
# Round-5 phase-3b: the phase-3 queue minus the two completed quick
# gates (bf16_mega PASSED 1.732s vs 1.733s; slab_ab v1 measured and
# retired — the v2 rerun happens outside this queue). Restarts from the
# checkpoint-regenerating trains. See r5_campaign3.sh for rationale.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_phase3b.log
: > "$LOG"

run_job() {
  local name="$1"; shift
  for attempt in 1 2; do
    echo "=== $name (attempt $attempt) $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout 5400 "$@" >> "$LOG" 2>&1
    rc=$?
    echo "=== $name rc=$rc ===" >> "$LOG"
    [ $rc -eq 0 ] && return 0
  done
  echo "=== $name FAILED twice ===" >> "$LOG"
  return 1
}

FS="benchmarks/flagship_fullscale.py"
UT="benchmarks/uq_temperature.py"
run_job base_s43 python $FS run --model condunet --seed 43
run_job minsnr_s43 python $FS run --model condunet --seed 43 --loss-weighting min_snr
run_job temper_base_s43 python $UT --seed 43
run_job temper_minsnr_s43 python $UT --seed 43 --tag condunet-minsnr5
run_job minsnr_s44 python $FS run --model condunet --seed 44 --loss-weighting min_snr
run_job h1_s42 python $FS run --model condunet --seed 42 --heads 1
run_job h1_s43 python $FS run --model condunet --seed 43 --heads 1
run_job h1_s44 python $FS run --model condunet --seed 44 --heads 1
run_job h2_s42 python $FS run --model condunet --seed 42 --heads 2
run_job h2_s43 python $FS run --model condunet --seed 43 --heads 2
run_job h2_s44 python $FS run --model condunet --seed 44 --heads 2
run_job roofline python benchmarks/train_roofline.py
run_job scale_x2 python $FS run --model condunet --seed 42 --dataset-scale 2
run_job scale_x4 python $FS run --model condunet --seed 42 --dataset-scale 4
echo "=== phase3b done $(date -u +%H:%M:%S) ===" >> "$LOG"
