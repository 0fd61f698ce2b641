#!/bin/bash
# Round-2h validation batch: memoized Pallas dispatch + AOT executable cache.
# Arms (one TPU session, sequential):
#   1. bench.py            — headline regression check under the new dispatch
#   2. tpu_smoke.py        — every kernel variant still compiles/runs at L=4096
#   3. bench_extract_e2e   — system extraction cold/warm; warm now rides the
#                            AOT executable cache (fresh-process deserialize)
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r5_batch.log}
{
  echo "=== r5 batch start $(date -u +%FT%TZ) ==="
  echo "--- arm 1: bench.py (headline) ---"
  timeout 2400 python bench.py
  echo "--- arm 2: kernel smoke L=4096 ---"
  timeout 3600 python tools/tpu_smoke.py -L 4096
  echo "--- arm 3: system e2e (cold+warm, AOT) ---"
  rm -rf /root/.cache/cm3p_tpu/aot
  timeout 3600 python tools/bench_extract_e2e.py --sets 64 --workers 6
  echo "=== r5 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
