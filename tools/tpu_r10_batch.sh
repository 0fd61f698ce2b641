#!/bin/bash
# Round-2i validation: eager flush quantum (--flush-rows, default min(64,
# batch)) — packed flushes dispatch as soon as 64 rows are ready, so each
# flush's host->device mel transfer + device compute overlap the loader's
# CPU work on later windows. r9 showed the legacy job accumulating the
# whole 1024-window fixture into one end-of-loader flush: drain 8.1 s of
# the 30.0 s warm wall was a fully serial transfer+compute tail.
# Arms:
#   A. headline bench — regression check (device math unchanged).
#   B. system e2e, 64 sets w/ audio — NEW eager default. Cold rebuilds the
#      AOT executables at the 64-row shapes; warm is the decision number.
#      Expect: drain shrinks to the small tail flush; wall ~ loader CPU.
#   C. same e2e warm with --flush-rows 192 (legacy single-flush behavior)
#      for the same-session A/B. Separate AOT manifest by design (the
#      extra key includes flush_rows).
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r10_batch.log}
{
  echo "=== r10 batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  git status --short cm3p_tpu extract_beatmap_embeddings.py | head -5
  echo "--- arm A: headline bench ---"
  timeout 3600 python bench.py
  echo "--- arm B: system e2e, 64 sets, audio, eager flush (default) ---"
  rm -rf /tmp/mmrs_extract_bench_r10
  timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --root /tmp/mmrs_extract_bench_r10
  echo "--- arm C: e2e legacy single-flush (--flush-rows 192) ---"
  timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --root /tmp/mmrs_extract_bench_r10 --flush-rows 192
  echo "--- arm B2: eager warm re-run (bracket for day noise) ---"
  timeout 5400 python tools/bench_extract_e2e.py --sets 64 --workers 6 --root /tmp/mmrs_extract_bench_r10
  echo "=== r10 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
