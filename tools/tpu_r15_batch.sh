#!/bin/bash
# Round-3 close-out validation on the FINAL tree (the r11 discipline): the
# r12-r14 arms imported whatever tree existed at their start times; this
# batch re-validates the headline, the corpus headline, and the full
# kernel smoke on one committed revision.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r15_batch.log}
{
  echo "=== r15 close-out start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  git status --short cm3p_tpu bench.py tools | head -5
  echo "--- arm A: headline bench (final tree) ---"
  timeout 3600 python bench.py
  echo "--- arm B: corpus headline (final tree) ---"
  timeout 3600 python bench.py --corpus
  echo "--- arm C: kernel-variant smoke, L=4096 ---"
  timeout 7200 python tools/tpu_smoke.py -L 4096
  echo "=== r15 close-out done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
