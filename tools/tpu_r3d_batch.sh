#!/bin/bash
# Round-2 continuation batch, take 3. The r3b arms 2-4 (qkv_only / wo_only /
# qkv_w8a8) were contaminated by the git-checkout race (the pre-flip tree —
# LNMM master default ON — was on disk while they ran: wo_only measured
# 120.8 ~= the known full-lnmm 126.8, qkv_w8a8 139.2 ~= the known
# lnmm+W8A8 137.1), and bench_wo_local was killed mid-run with the session.
# This re-runs all of them against the committed post-flip tree (82de6be+),
# plus the int8-drift measurement and the fp32-WO compile-crash repro.
# ONE process on the shared TPU at a time.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3d_batch.log}
echo "=== r3d batch start $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD) ===" >> "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag: $* ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $tag rc=$rc dur=$((SECONDS - t0))s ---" >> "$LOG"
  return $rc
}

# 1) same-day champion anchor (all A/B deltas below compare against this)
run bench_default 5400 python bench.py

# 2) per-half lnmm arms (master off by default; sub-gates force halves)
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

echo "=== r3d batch done $(date -u +%FT%TZ) ===" >> "$LOG"
