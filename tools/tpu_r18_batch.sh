#!/bin/bash
# Round-4 hardware batch (VERDICT r3 items 3, 4, 6):
#   A. staged experiment lineage end to end on the chip:
#      v6_mask MLM pretrain -> v7 contrastive BOOTSTRAPPED from it
#      (vs v7 from scratch at matched steps) -> v7_classifier fine-tune
#      (reference anchors: configs/train/v6.yaml:6, v7_classifier.yaml:7,
#       train.py:295-311)
#   B. train-step speed-of-light inputs: packed decomposition at the
#      production recipe (rows=8, remat none), rows 8/10/12 re-sweep, and
#      remat modes under the final kernels
#   C. link-aware system e2e: bench_extract_e2e now embeds a 16 MB link
#      probe in its JSON (BASELINE gets its first link-cited row)
#   D. headline regression guard
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r18_batch.log}
R=/tmp/r18
mkdir -p $R
{
  echo "=== r18 batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD

  echo "--- arm A1: v6_mask MLM pretrain (150 steps) ---"
  timeout 5400 python tools/tpu_convergence.py --config v6_mask --steps 150 --sets 8 \
    --root $R/lineage_data --output $R/v6_mask --batch-size 8 --max-length 2048
  echo "--- arm A2: v7 contrastive bootstrapped from the MLM tower ---"
  timeout 5400 python tools/tpu_convergence.py --config v7 --steps 150 --sets 8 \
    --root $R/lineage_data --output $R/v7_boot --batch-size 8 --max-length 2048 \
    from_pretrained=$R/v6_mask/model from_pretrained_allow_missing=true
  echo "--- arm A3: v7 contrastive from scratch (matched steps) ---"
  timeout 5400 python tools/tpu_convergence.py --config v7 --steps 150 --sets 8 \
    --root $R/lineage_data --output $R/v7_scratch --batch-size 8 --max-length 2048
  echo "--- arm A4: v7_classifier fine-tune from the bootstrapped model ---"
  timeout 5400 python tools/tpu_convergence.py --config v7_classifier --steps 100 --sets 8 \
    --root $R/lineage_data --output $R/v7_classifier --batch-size 8 --max-length 2048 \
    from_pretrained=$R/v7_boot/model dataset.min_year=2008

  echo "--- arm B1: packed decomposition, production recipe (rows=8, remat none) ---"
  timeout 3600 python tools/bench_train_decompose.py --rows 8 --remat none
  echo "--- arm B2: rows sweep (packed, remat none) ---"
  for rows in 8 10 12; do
    timeout 2400 python tools/bench_train_step.py --packed --batch-size $rows --remat none
  done
  echo "--- arm B3: remat modes at rows=8 (packed) ---"
  for rm in full dots; do
    timeout 2400 python tools/bench_train_step.py --packed --batch-size 8 --remat $rm
  done

  echo "--- arm C: system e2e with link probe (64 sets) ---"
  timeout 7200 python tools/bench_extract_e2e.py --sets 64 --workers 6

  echo "--- arm D: headline regression ---"
  timeout 3600 python bench.py

  echo "=== r18 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
