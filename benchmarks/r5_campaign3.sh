#!/bin/bash
# Round-5 phase-3 TPU queue (fresh checkout: docs/results carries the
# phase-1 result.json artifacts but run-dir ckpt/ trees are gitignored,
# so everything checkpoint-dependent retrains first; training is
# bitwise-reproducible so retrained baselines reproduce their committed
# best-val — verified after the run).
# Order = decision value per VERDICT r4:
#   1-2. bf16 fused-core gate + slab-attention A/B (bench-critical)
#   3-6. min-SNR calibrated-T head-to-head at a SECOND seed (s43):
#        base/minsnr retrains for ckpts, then both tempering sweeps
#   7.   minsnr s44 -> 3-seed adoption gate on the training axes
#   8-13. heads=1/2 x s42/43/44 (CRPS-bearing reruns) -> spread-aware
#        retirement re-check
#   14.  corrected roofline (GN+SiLU + attention byte models)
#   15-16. coverage-collapse data-scaling study (2x, 4x)
# Each job gets 2 attempts (the remote Mosaic compile flakes once then
# works — CLAUDE.md) under a hard timeout.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_phase3.log
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
run_job bf16_mega python benchmarks/check_bf16_mega.py
run_job slab_ab python benchmarks/train_slab.py
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
echo "=== phase3 done $(date -u +%H:%M:%S) ===" >> "$LOG"
