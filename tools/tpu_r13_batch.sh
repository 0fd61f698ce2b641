#!/bin/bash
# Round-3 batch 2: the system-side story (VERDICT r2 next #2 + #7 e2e half).
#   A  mel-wire int8 verdict: drift + per-flush device time vs bf16
#   B  warm e2e + loader-scaling table at 1/2/4/8 workers on this 1-core
#      host (flat rates = the measured proof of the 1-core bound)
#   C  warm e2e with the int8 mel wire (drain A/B vs arm B's bf16 runs)
#   D  warm e2e over the 16-map corpus fixture (distribution coverage)
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r13_batch.log}
{
  echo "=== r13 batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  git status --short cm3p_tpu bench.py tools extract_beatmap_embeddings.py | head -5
  echo "--- arm A: mel-wire int8 drift + flush timing ---"
  timeout 3600 python tools/bench_mel_wire.py
  echo "--- arm B: e2e warm + worker scaling (1-core host) ---"
  for W in 1 2 4 8; do
    echo "--- arm B workers=$W ---"
    timeout 3600 python tools/bench_extract_e2e.py --workers "$W"
  done
  echo "--- arm C: e2e warm, int8 mel wire (workers=6 default) ---"
  timeout 3600 env CM3P_MEL_WIRE=int8 python tools/bench_extract_e2e.py
  echo "--- arm D: e2e warm over the 16-map corpus fixture ---"
  timeout 5400 python tools/bench_extract_e2e.py --corpus --root /tmp/mmrs_extract_corpus
  echo "=== r13 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
