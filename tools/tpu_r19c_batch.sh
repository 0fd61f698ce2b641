#!/bin/bash
# r19c: loader levers A/B on the real chip (VERDICT r4 item 4a+4b).
# Warm e2e (64-set corpus fixture, 6 workers) with embedded link probes:
#   A  baseline (includes the r19 mel temporaries fix)
#   B  + int8 host->device mel wire (CM3P_MEL_WIRE=int8; r13 tied the wires)
#   C  + worker-side int8 IPC quantize (CM3P_INT8_IPC=1) on top of B —
#      the ROADMAP round-5 lever: 4x fewer loader->parent queue bytes and
#      EXACT re-quantization into the int8 device wire
#   A' bracket re-run (link drift control)
# Embedding drift C-vs-A checked at the end (cosine over the parquets).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r19c_batch.log}
ROOT=/tmp/mmrs_extract_bench_r19c
{
  echo "=== r19c batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  echo "--- A: baseline ---"
  timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  cp "$ROOT/emb.parquet" /tmp/r19c_embA.parquet
  echo "--- B: + int8 mel wire ---"
  CM3P_MEL_WIRE=int8 timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  echo "--- C: + int8 IPC quantize ---"
  CM3P_MEL_WIRE=int8 CM3P_INT8_IPC=1 timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  cp "$ROOT/emb.parquet" /tmp/r19c_embC.parquet
  echo "--- A2: baseline bracket ---"
  timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --corpus --root "$ROOT"
  echo "--- drift C vs A ---"
  python - <<'PY'
import numpy as np, pandas as pd
a = pd.read_parquet('/tmp/r19c_embA.parquet')
c = pd.read_parquet('/tmp/r19c_embC.parquet')
ka = a.set_index(a.columns[0]) if a.columns[0] != 'embedding' else a
ea = np.stack(a['embedding'].to_numpy()); ec = np.stack(c['embedding'].to_numpy())
assert ea.shape == ec.shape, (ea.shape, ec.shape)
cos = (ea * ec).sum(1) / (np.linalg.norm(ea, axis=1) * np.linalg.norm(ec, axis=1))
print(f"DRIFT int8ipc_vs_base cos_min={cos.min():.6f} cos_mean={cos.mean():.6f} n={len(cos)}")
PY
  echo "=== r19c batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
