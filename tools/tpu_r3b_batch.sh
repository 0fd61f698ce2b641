#!/bin/bash
# Round-2 continuation batch, take 2. The L=4096 smoke already ran twice
# (everything passes except 'global seg WO fp32 rope', now known to be a
# DETERMINISTIC whole-program compile failure of a non-production debug
# combination — see tools/tpu_repro_wofp32.py). So: benches first, the
# repro + the re-gated int8 drift measurement after.
#
# Questions:
#   1. Which lnmm half carries the -30% in-situ loss — LN->QKV or
#      Wo->+residual? If one half is ~neutral, int8 can ride it.
#   2. Does the in-kernel Wo epilogue pay off on local layers (global
#      declines via wo_fusable at L=4096)?
#   3. int8 drift at production shape with the gates ACTUALLY engaged
#      (tools/bench_int8_drift.py previously never enabled the lnmm
#      sub-gates its int8 arms ride on).
#   4. Full diagnostic for the deterministic fp32+rope+seg+WO compile crash.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3b_batch.log}
echo "=== r3b batch start $(date -u +%FT%TZ) ===" >> "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag: $* ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $tag rc=$rc dur=$((SECONDS - t0))s ---" >> "$LOG"
  return $rc
}

# 1) champion confirmation at the new defaults (expect ~182 on the 08-18 chip)
run bench_default 5400 python bench.py

# 2) per-half lnmm arms (master off by default now; sub-gates force halves)
run bench_qkv_only 5400 env CM3P_FUSED_LNMM_QKV=1 python bench.py
run bench_wo_only  5400 env CM3P_FUSED_LNMM_WO=1 python bench.py

# 3) int8 on the qkv half alone (only worth it if arm 2a is ~neutral)
run bench_qkv_w8a8 5400 env CM3P_FUSED_LNMM_QKV=1 CM3P_W8A8=1 python bench.py

# 4) local-only Wo epilogue (global declines via wo_fusable at L=4096)
run bench_wo_local 5400 env CM3P_FUSED_WO=1 python bench.py

# 5) int8 embedding drift at production shape, gates actually engaged
run int8_drift 5400 python tools/bench_int8_drift.py

# 6) full diagnostic of the deterministic fp32 WO compile crash
run repro_wofp32 3600 python tools/tpu_repro_wofp32.py

echo "=== r3b batch done $(date -u +%FT%TZ) ===" >> "$LOG"
