#!/bin/bash
# Round-3 batch 1: trainable-fused-rope hardware validation + the perf
# corpus on the device path + the honest-baseline headline regression.
#
# Arm order: the smoke gates everything (Mosaic crashes surface there, not
# in interpret mode); the train-step A/B is BRACKETED (off/on/off) so the
# day-to-day chip variance documented in BASELINE.md can't fake a verdict.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r12_batch.log}
{
  echo "=== r12 batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  git status --short cm3p_tpu bench.py tools | head -5
  echo "--- arm A: kernel-variant smoke, L=4096 (incl. TFR grad variants) ---"
  timeout 7200 python tools/tpu_smoke.py -L 4096
  echo "--- arm B: headline bench (bundled map, honest vs_baseline) ---"
  timeout 3600 python bench.py
  echo "--- arm C: headline bench over the 16-map perf corpus ---"
  timeout 3600 python bench.py --corpus
  echo "--- arm D1: packed train step, fused-rope OFF (bracket open) ---"
  timeout 3600 python tools/bench_train_step.py --packed --remat none --iters 8
  echo "--- arm D2: packed train step, fused-rope ON ---"
  timeout 3600 env CM3P_TRAIN_FUSED_ROPE=1 python tools/bench_train_step.py --packed --remat none --iters 8
  echo "--- arm D3: packed train step, fused-rope OFF (bracket close) ---"
  timeout 3600 python tools/bench_train_step.py --packed --remat none --iters 8
  echo "--- arm E1: dense train step (v7 shape), fused-rope OFF ---"
  timeout 3600 python tools/bench_train_step.py --iters 8
  echo "--- arm E2: dense train step (v7 shape), fused-rope ON ---"
  timeout 3600 env CM3P_TRAIN_FUSED_ROPE=1 python tools/bench_train_step.py --iters 8
  echo "=== r12 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
