#!/bin/bash
# r19e: loader-lever record batch (VERDICT r4 item 4b close-out).
# The prior session's r19c batch found the dequantize/requantize round trip
# ate the int8-IPC win (~1 s of the 14 s warm e2e) and motivated the
# passthrough (extract_beatmap_embeddings.py int8_passthrough), but its log
# died with the container before BASELINE.md recorded it, and the r19d
# passthrough A/B never ran. This batch records the whole story in one
# bracketed session:
#   A   default wire (bf16 compact) baseline — includes the mel stft
#       temporaries fix (09e0784)
#   B   int8 host->device mel wire (CM3P_MEL_WIRE=int8)
#   C   int8 wire + worker int8 IPC PASSTHROUGH (CM3P_INT8_IPC=1): workers
#       quantize once, parent ships codes straight into the device wire
#   A'  baseline bracket (link drift control)
# Drift C vs A (cosine over parquets), then a same-session headline guard.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r19e_batch.log}
ROOT=/tmp/mmrs_extract_bench_r19e
{
  echo "=== r19e batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  echo "--- A: baseline (bf16 wire) ---"
  timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  cp "$ROOT/emb.parquet" /tmp/r19e_embA.parquet
  echo "--- B: int8 mel wire ---"
  CM3P_MEL_WIRE=int8 timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  echo "--- C: int8 wire + IPC passthrough ---"
  CM3P_MEL_WIRE=int8 CM3P_INT8_IPC=1 timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  cp "$ROOT/emb.parquet" /tmp/r19e_embC.parquet
  echo "--- A2: baseline bracket ---"
  timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  echo "--- drift C (int8 wire + passthrough) vs A (bf16 wire) ---"
  python - <<'PY'
import numpy as np, pandas as pd
a = pd.read_parquet('/tmp/r19e_embA.parquet'); c = pd.read_parquet('/tmp/r19e_embC.parquet')
ea = np.stack(a['embedding'].to_numpy()); ec = np.stack(c['embedding'].to_numpy())
assert ea.shape == ec.shape, (ea.shape, ec.shape)
cos = (ea * ec).sum(1) / (np.linalg.norm(ea, axis=1) * np.linalg.norm(ec, axis=1))
print(f"DRIFT int8wire+passthrough_vs_bf16 cos_min={cos.min():.6f} cos_mean={cos.mean():.6f} n={len(cos)}")
PY
  echo "--- headline guard ---"
  timeout 5400 python bench.py
  echo "=== r19e batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
