#!/bin/bash
# Round-2 continuation: the two int8 configurations never A/B'd standalone.
#   1. CM3P_XLA_INT8 (ops/xla_int8.py, new) — W8A8 via plain XLA ops for the
#      QKV/attn-Wo projections: no Pallas boundary, so the lnmm -30% trap
#      (BASELINE.md round-2c) structurally cannot apply. Micro first: does
#      XLA lower the int8 dot to the MXU 2x rate at our shapes?
#   2. CM3P_W8A8[_WO] with lnmm OFF — int8 Wi/Wo inside the CHAMPION fused
#      FFN kernel. The round-2c arms rode the then-default-ON lnmm master
#      gate, so in-fused-FFN int8 alone was never measured.
# Waits for the r3d batch (one process on the shared TPU at a time).
set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-/tmp/tpu_r3e_batch.log}
echo "=== r3e waiting for r3d $(date -u +%FT%TZ) ===" >> "$LOG"
while ! grep -q "=== r3d batch done" /tmp/tpu_r3d_batch.log 2>/dev/null; do
  sleep 120
done
echo "=== r3e batch start $(date -u +%FT%TZ) @ $(git rev-parse --short HEAD) ===" >> "$LOG"

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "--- $tag: $* ---" >> "$LOG"
  local t0=$SECONDS
  timeout "$to" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "--- $tag rc=$rc dur=$((SECONDS - t0))s ---" >> "$LOG"
  return $rc
}

# 0) micro: XLA int8 dot vs bf16 at the four production shapes
run micro_xla_int8 3600 python tools/bench_xla_int8.py

# 1) XLA-path W8A8 on QKV + attn Wo (~47% of dense flops)
run bench_xla_int8 5400 env CM3P_XLA_INT8=1 CM3P_FUSED_WO=0 CM3P_W8A8=0 python bench.py --packed-rows 128

# 2) int8 Wi inside the champion fused-FFN kernel (lnmm stays off)
run bench_ffn_w8a8 5400 env CM3P_FUSED_WO=0 CM3P_W8A8=1 python bench.py --packed-rows 128

# 3) + int8 FFN Wo in-kernel
run bench_ffn_w8a8_wo 5400 env CM3P_FUSED_WO=0 CM3P_W8A8=1 CM3P_W8A8_WO=1 python bench.py --packed-rows 128

# 4) full int8 dense stack, boundary-free (XLA QKV/Wo + in-FFN-kernel Wi/Wo)
run bench_all_int8 5400 env CM3P_XLA_INT8=1 CM3P_FUSED_WO=0 CM3P_W8A8=1 CM3P_W8A8_WO=1 python bench.py --packed-rows 128

echo "=== r3e batch done $(date -u +%FT%TZ) ===" >> "$LOG"
