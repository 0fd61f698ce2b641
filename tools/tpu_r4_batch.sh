#!/bin/bash
# Post-gate-flip tuning + insurance, one chip session:
# 1) packed-rows rescan — the 128-row optimum was measured before the
#    FUSED_WO/W8A8 extraction gates landed; the balance may have shifted.
#    (--batch-size 16 keeps the dense probe cheap; headline = packed rate.)
# 2) a 100-step real-data convergence run on the NEW defaults
#    (meta_pack=16 + the gate flips) — training math is proven exactly
#    equal (tests/test_meta_pack.py) so this is end-to-end insurance that
#    the shipped default config still trains on hardware.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r4_batch.log}
echo "=== r4 batch start $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD) ===" >> "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag: $* ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $tag rc=$rc dur=$((SECONDS - t0))s ---" >> "$LOG"
  return $rc
}

run rows128 5400 python bench.py --batch-size 16 --packed-rows 128
run rows160 5400 python bench.py --batch-size 16 --packed-rows 160
run rows192 5400 python bench.py --batch-size 16 --packed-rows 192
run rows256 5400 python bench.py --batch-size 16 --packed-rows 256
run rows320 5400 python bench.py --batch-size 16 --packed-rows 320
run conv100 7200 python tools/tpu_convergence.py --steps 100 --output /tmp/conv_r4 --root /tmp/mmrs_conv_r4

echo "=== r4 batch done $(date -u +%FT%TZ) ===" >> "$LOG"
