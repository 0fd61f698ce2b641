#!/bin/bash
# Round-2 continuation batch: per-half lnmm diagnosis + local-only Wo
# epilogue, after the LNMM default flip (commit 32d2d42). Runs immediately
# as ONE background process; set WAIT_FOR="pattern:file" to gate on another
# batch's completion line (only one process may use the shared TPU at a
# time — concurrent benches corrupt both runs' same-day A/B numbers).
#
# Questions this answers (see BASELINE.md round-2c table for the priors):
#   1. Production-shape smoke: do the WO/lnmm variants compile at L=4096
#      with the new wo_fusable bound? (The L=1024 smoke missed the scoped-
#      vmem blowup.)
#   2. Which lnmm half carries the -30% in-situ loss — LN->QKV or
#      Wo->+residual? If one half is ~neutral, int8 can ride it.
#   3. Does the in-kernel Wo epilogue pay off now that it engages on local
#      layers only (global falls back to the XLA epilogue)?
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3_batch.log}
# WAIT_FOR="pattern:file" — optional gate on another batch's completion line
if [ -n "${WAIT_FOR:-}" ]; then
  echo "=== r3 batch waiting for $WAIT_FOR $(date -u +%FT%TZ) ===" >> "$LOG"
  while ! grep -q "${WAIT_FOR%%:*}" "${WAIT_FOR##*:}" 2>/dev/null; do
    sleep 120
  done
fi
echo "=== r3 batch start $(date -u +%FT%TZ) ===" >> "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag: $* ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $tag rc=$rc dur=$((SECONDS - t0))s ---" >> "$LOG"
  return $rc
}

# 1) production-shape smoke (L=4096, the shape the L=1024 smoke missed)
run smoke4096 7200 python tools/tpu_smoke.py -L 4096 \
  || { echo "SMOKE4096 FAILED — aborting batch" >> "$LOG"; exit 1; }

# 2) champion confirmation at the new defaults (expect ~182 on the 08-18 chip)
run bench_default 5400 python bench.py

# 3) per-half lnmm arms (master off by default now; sub-gates force halves)
run bench_qkv_only 5400 env CM3P_FUSED_LNMM_QKV=1 python bench.py
run bench_wo_only  5400 env CM3P_FUSED_LNMM_WO=1 python bench.py

# 4) int8 on the qkv half alone (only worth it if arm 3a is ~neutral)
run bench_qkv_w8a8 5400 env CM3P_FUSED_LNMM_QKV=1 CM3P_W8A8=1 python bench.py

# 5) local-only Wo epilogue (global now declines via wo_fusable)
run bench_wo_local 5400 env CM3P_FUSED_WO=1 python bench.py

echo "=== r3 batch done $(date -u +%FT%TZ) ===" >> "$LOG"
