#!/bin/bash
# r19f: joint (rows, packed_max_windows) re-sweep after the exact-FFD
# collator (the r19b mw sweep held rows=10 fixed; the fill sweep says
# rows=12/mw=56 packs 54.8 real windows at 96.7% fill — model-predicted
# ~+5% effective w/s over the shipped 10/48). mw=64 tables deterministically
# fail relay compile at V=256 (r19), so 56 is the largest table tried.
#   A   rows=10 mw=48 (shipped, bracket)
#   B   rows=12 mw=56
#   C   rows=14 mw=56 (fill 84.5% — expected loser, pins the rows slope)
#   A'  rows=10 mw=48 bracket
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r19f_batch.log}
{
  echo "=== r19f batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  echo "--- A: rows=10 mw=48 (shipped) ---"
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 10 --remat none --max-windows 48
  echo "--- B: rows=12 mw=56 ---"
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 12 --remat none --max-windows 56
  echo "--- C: rows=14 mw=56 ---"
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 14 --remat none --max-windows 56
  echo "--- A2: rows=10 mw=48 bracket ---"
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 10 --remat none --max-windows 48
  echo "=== r19f batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
