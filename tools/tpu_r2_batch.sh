#!/bin/bash
# Round-2 TPU validation batch — run as ONE background process when the
# axon relay is reachable (it has multi-hour outages; probe first).
#
# Order matters: smoke gates everything (Mosaic regressions fail loudly in
# minutes), then the micro A/B, then headline A/Bs for each candidate gate.
# Every run appends to $LOG; the last bench line per config is the result.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r2_batch.log}
echo "=== batch start $(date -u +%FT%TZ) ===" >> "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag: $* ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $tag rc=$rc dur=$((SECONDS - t0))s ---" >> "$LOG"
  return $rc
}

# 1) kernel-variant smoke (incl. the new Wo-epilogue variants)
run smoke 3600 python tools/tpu_smoke.py || { echo "SMOKE FAILED — aborting batch" >> "$LOG"; exit 1; }

# 2) LNMM / W8A8 micro bench (per-layer ms, quant error)
run lnmm_q 3600 python tools/bench_lnmm_q.py

# 3) headline A/Bs (each ~5-10 min warm; first compile can be slow)
run bench_base    5400 python bench.py                       # defaults: LNMM on, FFN on
run bench_lnmm0   5400 env CM3P_FUSED_LNMM=0 python bench.py # isolate LNMM gain
run bench_w8a8    5400 env CM3P_W8A8=1 python bench.py
run bench_w8a8wo  5400 env CM3P_W8A8=1 CM3P_W8A8_WO=1 python bench.py
run bench_wo      5400 env CM3P_FUSED_WO=1 python bench.py
run bench_woq     5400 env CM3P_FUSED_WO=1 CM3P_FUSED_WO_Q=1 python bench.py
run bench_all     5400 env CM3P_FUSED_WO=1 CM3P_FUSED_WO_Q=1 CM3P_W8A8=1 CM3P_W8A8_WO=1 python bench.py

echo "=== batch done $(date -u +%FT%TZ) ===" >> "$LOG"
