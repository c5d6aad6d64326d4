#!/bin/bash
# Round-5 phase-2 TPU queue (run after r5_campaign1.sh):
#   1. on-chip slab-attention A/B (train_slab.py -> slab_attn.json)
#   2. corrected roofline (GN+SiLU + attention byte models)
#   3. tempering sweeps with CRPS/SBC for the min-SNR head-to-head at
#      calibrated T, all seeds, CURRENT-code checkpoints
#   4. coverage-collapse data-scaling study (2x / 4x datasets, s42)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_phase2.log
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

run_job bf16_mega python benchmarks/check_bf16_mega.py
run_job slab_ab python benchmarks/train_slab.py
run_job roofline python benchmarks/train_roofline.py
for s in 42 43 44; do
  run_job temper_base_s$s python benchmarks/uq_temperature.py --seed $s
  run_job temper_minsnr_s$s python benchmarks/uq_temperature.py \
    --seed $s --model condunet --tag condunet-minsnr5
done
FS="benchmarks/flagship_fullscale.py"
run_job scale_x2 python $FS run --model condunet --seed 42 --dataset-scale 2
run_job scale_x4 python $FS run --model condunet --seed 42 --dataset-scale 4
echo "=== phase2 done $(date -u +%H:%M:%S) ===" >> "$LOG"
