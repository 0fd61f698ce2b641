#!/bin/bash
# Round-2i clean validation: native host front end + AOT prewarm cold-start,
# run from a frozen committed tree (r6's arms 2/3 ran against a mutating
# working tree mid-build — fingerprint churn invalidated the prewarm).
# Arms:
#   A. prewarm (timed)    — canonical flush shapes into an empty AOT cache
#   B. system e2e         — its "cold" pass deserializes the prewarmed
#                           executables; warm = steady state. Compare against
#                           r5 (cold 607 s / warm 53 s, pre-native-host) and
#                           r6 arm 2 (cold 408 s / warm 31.3 s, mid-build).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r7_batch.log}
{
  echo "=== r7 batch start $(date -u +%FT%TZ) ==="
  echo "--- fingerprint guard ---"
  git rev-parse HEAD
  git status --short cm3p_tpu | head -5
  echo "--- arm A: prewarm into empty AOT cache (timed) ---"
  rm -rf /root/.cache/cm3p_tpu/aot
  time timeout 3600 python extract_beatmap_embeddings.py --prewarm
  echo "--- arm B: system e2e (cold rides the prewarmed cache) ---"
  timeout 3600 python tools/bench_extract_e2e.py --sets 64 --workers 6
  echo "=== r7 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
