#!/bin/bash
# Round-2j validation: native audio front end landed (audio_fast.cpp).
# Arms:
#   A. kernel smoke at production shapes — Mosaic regression insurance
#      before the round-end driver bench.
#   B. headline bench (production gates) — regression check after the
#      host-side changes (bench.py's real_window_sequences rides the
#      native parse path; device math untouched, expect day-noise only).
#   C. system e2e with audio-backed sets — the arm the native audio
#      front end actually moves (loader stage).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r8_batch.log}
{
  echo "=== r8 batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  git status --short cm3p_tpu | head -5
  echo "--- arm A: kernel variant smoke (L=4096) ---"
  timeout 5400 python tools/tpu_smoke.py -L 4096
  echo "--- arm B: headline bench ---"
  timeout 3600 python bench.py
  echo "--- arm C: system e2e, 64 sets, audio ---"
  timeout 3600 python tools/bench_extract_e2e.py --sets 64 --workers 6
  echo "=== r8 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
