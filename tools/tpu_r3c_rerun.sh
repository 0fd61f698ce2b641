#!/bin/bash
# Re-run of the two r3b arms contaminated by a git-checkout race: a bisect
# rewrote /root/repo to the pre-flip tree while the batch was running, so
# bench_qkv_only imported a module without the sub-gates (ImportError) and
# bench_wo_only may have seen either tree. Waits for r3b to finish.
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3c_rerun.log}
echo "=== r3c waiting for r3b $(date -u +%FT%TZ) ===" >> "$LOG"
while ! grep -q "=== r3b batch done" /tmp/tpu_r3b_batch.log 2>/dev/null; do
  sleep 120
done
echo "=== r3c start $(date -u +%FT%TZ) ===" >> "$LOG"

run() {
  local tag=$1 to=$2; shift 2
  echo "--- $tag: $* ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$to" "$@" >> "$LOG" 2>&1
  echo "--- $tag rc=$? dur=$((SECONDS - t0))s ---" >> "$LOG"
}

run bench_qkv_only 5400 env CM3P_FUSED_LNMM_QKV=1 python bench.py
run bench_wo_only  5400 env CM3P_FUSED_LNMM_WO=1 python bench.py

echo "=== r3c done $(date -u +%FT%TZ) ===" >> "$LOG"
