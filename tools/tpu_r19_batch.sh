#!/bin/bash
# r19 batch (round 5): VERDICT r4 items 5 + 4c on real hardware.
#   A. Trainer.evaluate at the reference's test-time V=1000 (verdict #5)
#   B. packed_max_windows sweep at rows=10 (verdict #4c + ROADMAP round-5
#      lever): the shipped 64-slot window table halves vs the fill sim's
#      40-window sweet spot (tools/sweep_pack_fill.py: mw=40 -> 40 real
#      windows/batch at 84.5% token fill vs 31.1 at mw=64). Device step
#      times per table size complete the picture.
#   C. headline guard: bench.py must stay in the 204-206 emb/s band.
# Arms independent; one relay hiccup doesn't take the rest down.
cd "$(dirname "$0")/.." || exit 1
LOG=${1:-/tmp/tpu_r19_batch.log}
{
  echo "=== r19 batch start $(date -u +%FT%TZ) ==="
  git rev-parse HEAD
  echo "--- A: Trainer.evaluate at V=1000 (full model, L=2048, B=8, 2 batches) ---"
  timeout 5400 python tools/tpu_eval_v1000.py --record /tmp/r19_eval_v1000.json
  echo "--- B: packed window-table sweep at rows=10 ---"
  for mw in 0 32 40 48 64; do
    echo "--- B: rows=10 max_windows=$mw ---"
    timeout 3600 python tools/bench_train_step.py --packed --batch-size 10 --remat none --max-windows "$mw"
  done
  echo "--- B2: bracket check rows=10 mw=40 again ---"
  timeout 3600 python tools/bench_train_step.py --packed --batch-size 10 --remat none --max-windows 40
  echo "--- C: headline guard ---"
  timeout 3600 python bench.py
  echo "=== r19 batch done $(date -u +%FT%TZ) ==="
} >"$LOG" 2>&1
