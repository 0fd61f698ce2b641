#!/bin/bash
# Round-3 batch 5: multi-mode training + the pcm wire on real hardware.
#   A  corpus-mode convergence: train the actual train.py recipe on a
#      fixture cycling all 16 perf-corpus maps (taiko/mania/catch/std in
#      the TRAINING loop - r2's convergence only ever saw the std map)
#   B  pcm-wire e2e (device DFT-conv mel executes on the real chip)
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r16_batch.log}
{
  echo "=== r16 batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  git status --short cm3p_tpu bench.py tools | head -5
  echo "--- arm A: corpus-mode convergence (150 steps, all game modes) ---"
  timeout 7200 python tools/tpu_convergence.py --corpus --sets 16 --steps 150 \
    --root /tmp/mmrs_convergence_corpus --output /tmp/convergence_corpus_run
  echo "--- arm B: pcm-wire e2e (on-device mel on real TPU) ---"
  timeout 3600 env CM3P_MEL_WIRE=pcm python tools/bench_extract_e2e.py --workers 6
  echo "=== r16 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
