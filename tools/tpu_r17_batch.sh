#!/bin/bash
# Round-3 final validation: smoke on the tree carrying the fp32 TFR decline
# (r15's one smoke failure must now PASS via the fallback) + a headline
# regression guard.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r17_batch.log}
{
  echo "=== r17 final validation start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  git status --short cm3p_tpu bench.py tools | head -5
  echo "--- arm A: kernel-variant smoke, L=4096 ---"
  timeout 7200 python tools/tpu_smoke.py -L 4096
  echo "--- arm B: headline bench ---"
  timeout 3600 python bench.py
  echo "=== r17 final validation done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
