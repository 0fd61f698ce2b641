#!/bin/bash
# Round-3 batch 3: retry the trainable-fused-rope train A/B after the
# scoped-vmem fix (unroll 4 -> 3 on the rope'd global backward; r12 arm D2
# OOMed 752 KB over the 16 MB stack at the production L=4096 shape).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r14_batch.log}
{
  echo "=== r14 batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  git status --short cm3p_tpu bench.py tools | head -5
  echo "--- arm A1: packed train step, fused-rope OFF (bracket open) ---"
  timeout 3600 python tools/bench_train_step.py --packed --remat none --iters 8
  echo "--- arm A2: packed train step, fused-rope ON ---"
  timeout 3600 env CM3P_TRAIN_FUSED_ROPE=1 python tools/bench_train_step.py --packed --remat none --iters 8
  echo "--- arm A3: packed train step, fused-rope OFF (bracket close) ---"
  timeout 3600 python tools/bench_train_step.py --packed --remat none --iters 8
  echo "--- arm B1: dense train step (v7 shape), fused-rope ON ---"
  timeout 3600 env CM3P_TRAIN_FUSED_ROPE=1 python tools/bench_train_step.py --iters 8
  echo "--- arm B2: dense train step (v7 shape), fused-rope OFF ---"
  timeout 3600 python tools/bench_train_step.py --iters 8
  echo "=== r14 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
