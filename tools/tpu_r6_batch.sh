#!/bin/bash
# Round-2i validation batch: sparse log-mel (host) + AOT prewarm (cold start).
# Arms (one TPU session, sequential):
#   1. bench.py              — headline regression check (device path; the
#                              sparse mel is host-side and bit-exact, so any
#                              move here is day-noise or a real regression)
#   2. system e2e, baseline  — cold/warm without any AOT artifacts, directly
#                              comparable to the r5 ladder (10.9 w/s warm,
#                              607 s cold); warm now also carries the sparse
#                              mel + faster host windowing
#   3. prewarm + system e2e  — wipe the cache, run --prewarm (timed), then
#                              the same e2e: its "cold" pass should ride the
#                              prewarmed executables and land near warm
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r6_batch.log}
{
  echo "=== r6 batch start $(date -u +%FT%TZ) ==="
  echo "--- arm 1: bench.py (headline) ---"
  timeout 2400 python bench.py
  echo "--- arm 2: system e2e baseline (no AOT artifacts) ---"
  rm -rf /root/.cache/cm3p_tpu/aot
  timeout 3600 python tools/bench_extract_e2e.py --sets 64 --workers 6
  echo "--- arm 3a: prewarm (timed) ---"
  rm -rf /root/.cache/cm3p_tpu/aot
  time timeout 3600 python extract_beatmap_embeddings.py --prewarm
  echo "--- arm 3b: system e2e with prewarmed cache ---"
  timeout 3600 python tools/bench_extract_e2e.py --sets 64 --workers 6
  echo "=== r6 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
