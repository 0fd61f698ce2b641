#!/bin/bash
# Round-2 close-out validation on the final tree: headline regression +
# the full kernel-variant smoke at the production length. No new gates
# this batch — pure insurance that the tree the driver benches is the
# tree the r10 numbers were measured on (only doc/comment commits since).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r11_batch.log}
{
  echo "=== r11 batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  git status --short cm3p_tpu bench.py tools | head -5
  echo "--- arm A: headline bench ---"
  timeout 3600 python bench.py
  echo "--- arm B: kernel-variant smoke, L=4096 ---"
  timeout 5400 python tools/tpu_smoke.py -L 4096
  echo "=== r11 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
