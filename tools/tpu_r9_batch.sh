#!/bin/bash
# Round-2h validation: warm-extraction overhead attack (AOT manifest preload
# + compact mel wire) and the e2e protocol move to production granularity
# (16 s windows, L=4096 rows — reference README:34).
# Arms:
#   A. headline bench — regression check (device math unchanged).
#   B. system e2e, 64 sets w/ audio, NEW protocol — cold rebuilds the
#      compact executables; warm exercises manifest preload + compact wire.
#      Stage breakdown in the log attributes the win (dispatch should lose
#      the ~21.5 s serial deserialize, drain the ~47% mel bytes).
#   C. same e2e warm-only comparison arm with CM3P_COMPACT_MEL=0 (fresh
#      process via --root reuse): isolates compact-wire vs preload gains.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r9_batch.log}
{
  echo "=== r9 batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  git status --short cm3p_tpu extract_beatmap_embeddings.py | head -5
  echo "--- arm A: headline bench ---"
  timeout 3600 python bench.py
  echo "--- arm B: system e2e, 64 sets, audio, 16s windows (compact+preload) ---"
  rm -rf /tmp/mmrs_extract_bench_r9
  timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --root /tmp/mmrs_extract_bench_r9
  echo "--- arm C: e2e warm arm, compact OFF (preload still on) ---"
  CM3P_COMPACT_MEL=0 timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --root /tmp/mmrs_extract_bench_r9
  echo "=== r9 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
