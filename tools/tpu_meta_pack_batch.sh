#!/bin/bash
# meta_pack default-flip A/B, one chip session. Motivation: the tower-level
# ablation (tools/bench_meta_tower.py, 2026-08-18) measured grad_meta
# 0.2335 -> 0.2055 s at meta_pack=16 (XLA seg-bias route; the flash route
# at 32/64 LOSES). This batch brackets the FULL packed train step and the
# V=1000 eval shape so the flip decision is end-to-end, same-chip.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_meta_pack_batch.log}
echo "=== meta_pack batch start $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD) ===" >> "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag: $* ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $tag rc=$rc dur=$((SECONDS - t0))s ---" >> "$LOG"
  return $rc
}

# bracket open: current default
run step_mp0_a 3600 python tools/bench_train_decompose.py
run step_mp16  3600 python tools/bench_train_decompose.py --meta-pack 16
# the 1000-variation eval shape (fwd-only; metadata-tower-dominated)
run eval_mp0   3600 python tools/bench_variations.py
run eval_mp16  3600 python tools/bench_variations.py --meta-pack 16
# bracket close
run step_mp0_b 3600 python tools/bench_train_decompose.py

echo "=== meta_pack batch done $(date -u +%FT%TZ) ===" >> "$LOG"
