"""Host-side collator fill at (rows, packed_max_windows) combinations.

The device cost of a packed train step is set by the COMPILED shapes —
(rows, seq_len) token rows plus a ``packed_max_windows`` window table whose
dummy slots still run the full metadata tower — while throughput counts
only REAL windows. ``packed_max_windows`` therefore trades step time
(smaller table = less dummy metadata compute) against collator fill (a
small cap forces early batch emission). This tool measures the fill side on
the real perf-corpus window distribution: average real windows per emitted
batch for each (rows, max_windows) arm. Combine with
``bench_train_step.py --packed --max-windows N`` step times:

    effective windows/s = avg_real_windows_per_batch / step_time

Pure host work (no jax), so it runs anywhere.

    python tools/sweep_pack_fill.py --rows 10 --max-windows 24 32 40 48 64
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+", default=[10])
    ap.add_argument("--max-windows", type=int, nargs="+", default=[24, 32, 40, 48, 64])
    ap.add_argument("--seq-len", type=int, default=4096)
    ap.add_argument("--n-windows", type=int, default=600)
    ns = ap.parse_args(argv)

    from bench import real_window_sequences
    from cm3p_tpu.data.packing_collator import packed_batches

    seqs, _ = real_window_sequences(ns.n_windows, corpus=str(REPO / "resources" / "perf_corpus"))
    lengths = [len(s) for s in seqs]
    print(f"corpus windows: {len(seqs)}, token lengths min/med/max = "
          f"{min(lengths)}/{int(np.median(lengths))}/{max(lengths)}")

    def sample_stream():
        for s in seqs:
            n = len(s)
            yield {
                "input_ids": np.asarray(s, np.int32),
                "attention_mask": np.ones(n, np.int32),
            }

    results = []
    for rows in ns.rows:
        for mw in ns.max_windows:
            batches = list(
                packed_batches(sample_stream(), rows=rows, seq_len=ns.seq_len, pad_id=0, max_windows=mw)
            )
            per_batch = [int(b["window_valid"].sum()) for b in batches]
            packed_windows = int(sum(per_batch))
            rec = {
                "rows": rows,
                "max_windows": mw,
                "batches": len(batches),
                "real_windows_mean": round(float(np.mean(per_batch)), 2),
                "real_windows_min": int(min(per_batch)),
                "real_windows_max": int(max(per_batch)),
                "windows_packed": packed_windows,
                "windows_dropped_tail": len(seqs) - packed_windows,
                "token_fill_pct": round(
                    100.0 * sum(min(l, ns.seq_len) for l in lengths[:packed_windows]) / (len(batches) * rows * ns.seq_len), 1,
                ),
            }
            results.append(rec)
            print(json.dumps(rec))
    return results


if __name__ == "__main__":
    main()
