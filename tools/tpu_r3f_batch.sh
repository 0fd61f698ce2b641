#!/bin/bash
# Round-2 continuation, decisive default-flip A/B. Motivation: r3d measured
# CM3P_FUSED_WO=1 at 202.0 vs same-batch default 161.9, and r3e measured
# CM3P_W8A8=1 at 204.2 — but r3e had NO same-batch bf16 baseline, the two
# winners were never combined, and the chip swings ±18% across hours
# (161.9 vs 191.5 same config, same day). This batch brackets every
# candidate between two default arms on one chip session so the flip
# decision is noise-proof.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3f_batch.log}
echo "=== r3f batch start $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD) ===" >> "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag: $* ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $tag rc=$rc dur=$((SECONDS - t0))s ---" >> "$LOG"
  return $rc
}

# bracket open: bf16 baseline (--precise: bench.py defaults the gates ON since
# the flip this batch motivated — explicit per-arm env keeps re-runs clean)
run bench_default_a 5400 python bench.py --packed-rows 128 --precise

# the two measured winners, standalone
run bench_wo 5400 env CM3P_FUSED_WO=1 CM3P_W8A8=0 python bench.py --packed-rows 128
run bench_w8a8 5400 env CM3P_FUSED_WO=0 CM3P_W8A8=1 python bench.py --packed-rows 128

# the never-tested combination (complementary: epilogue fusion is the
# attention half, W8A8 is the FFN Wi / QKV half)
run bench_wo_w8a8 5400 env CM3P_FUSED_WO=1 CM3P_W8A8=1 python bench.py --packed-rows 128

# + int8 inside the Wo epilogue (drift cos_min 0.999987, r3d)
run bench_wo_q_w8a8 5400 env CM3P_FUSED_WO=1 CM3P_FUSED_WO_Q=1 CM3P_W8A8=1 python bench.py --packed-rows 128

# bracket close: bf16 baseline again (chip-drift control)
run bench_default_b 5400 python bench.py --packed-rows 128 --precise

echo "=== r3f batch done $(date -u +%FT%TZ) ===" >> "$LOG"
