#!/bin/bash
# r19d: int8 IPC PASSTHROUGH A/B (after the r19c find that the
# dequantize/requantize round trip ate the IPC win). Arms bracketed:
#   B   int8 wire only
#   C'  int8 wire + int8 IPC passthrough (workers quantize once, parent
#       ships codes straight into the device wire)
#   B'  bracket
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r19d_batch.log}
ROOT=/tmp/mmrs_extract_bench_r19c
{
  echo "=== r19d batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  echo "--- B: int8 wire ---"
  CM3P_MEL_WIRE=int8 timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  echo "--- C2: int8 wire + IPC passthrough ---"
  CM3P_MEL_WIRE=int8 CM3P_INT8_IPC=1 timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  cp "$ROOT/emb.parquet" /tmp/r19d_embC2.parquet
  echo "--- B2: int8 wire bracket ---"
  CM3P_MEL_WIRE=int8 timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  cp "$ROOT/emb.parquet" /tmp/r19d_embB2.parquet
  echo "--- drift C2 (passthrough) vs B2 (parent-quantized int8 wire) ---"
  python - <<'PY'
import numpy as np, pandas as pd
b = pd.read_parquet('/tmp/r19d_embB2.parquet'); c = pd.read_parquet('/tmp/r19d_embC2.parquet')
eb = np.stack(b['embedding'].to_numpy()); ec = np.stack(c['embedding'].to_numpy())
cos = (eb*ec).sum(1)/(np.linalg.norm(eb,axis=1)*np.linalg.norm(ec,axis=1))
print(f"DRIFT passthrough_vs_parentq cos_min={cos.min():.6f} cos_mean={cos.mean():.6f} n={len(cos)}")
PY
  echo "=== r19d batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
