#!/bin/bash
# r18 follow-up: retry the arms the relay dropped (one INTERNAL
# remote_compile error killed B1 mid-decomposition; rows=10/12 compiles ran
# into a congestion window). Keep each arm independent so one relay hiccup
# doesn't take the rest down.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r18b_batch.log}
{
  echo "=== r18b batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  echo "--- B1 retry: packed decomposition (rows=8, remat none) ---"
  timeout 3600 python tools/bench_train_decompose.py --rows 8 --remat none
  echo "--- B2 retry: rows sweep remainder ---"
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 10 --remat none
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 12 --remat none
  echo "--- B3 retry: remat modes at rows=8 ---"
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 8 --remat full
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 8 --remat dots
  echo "=== r18b batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
