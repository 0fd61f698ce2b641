#!/bin/bash
# r19b: retries + confirmation for the r19 table sweep.
#   1. table=64 step time (the r19 arm died on a transient relay HTTP 500)
#   2. table=48 bracket (second sample)
#   3. v8_packed convergence smoke at the NEW defaults (exact-FFD collator,
#      packed_max_windows=48): the shipped recipe must train, not just bench.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r19b_batch.log}
{
  echo "=== r19b batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  echo "--- 1: rows=10 table=64 retry ---"
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 10 --remat none --max-windows 64
  echo "--- 2: rows=10 table=48 bracket ---"
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 10 --remat none --max-windows 48
  echo "--- 3: v8_packed convergence smoke at new defaults ---"
  rm -rf /tmp/mmrs_convergence_r19b /tmp/convergence_run_r19b
  timeout 5400 python tools/tpu_convergence.py --config v8_packed --steps 60 --max-length 4096 \
    --root /tmp/mmrs_convergence_r19b --output /tmp/convergence_run_r19b
  echo "=== r19b batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
