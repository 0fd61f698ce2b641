"""Data-pipeline soak: a full epoch over a ~2k-beatmapset MMRS dataset.

The reference operates at 244K beatmaps (``/root/reference/README.md``);
every dataset test here runs at 8-64 sets (VERDICT r4 next #6). This tool
synthesizes a metadata parquet three orders of magnitude above the test
fixtures — bodies CYCLE a small pool of real .osu/.wav files via relative
paths, so disk stays bounded while the metadata frame, the per-epoch
shuffle, the (process, worker) sharding, the interleaving, and the
error-skip accounting all run at production row counts — then streams one
full epoch through SampleLoader workers asserting:

* bounded RSS growth on the parent (no leak proportional to rows),
* steady samples/s across the epoch (first vs last quartile),
* exact error-skip accounting (a configurable fraction of rows point at a
  missing beatmap file; every healthy row's windows must arrive).

Anchors: /root/reference/utils/mmrs_dataset.py:102-159 (iteration),
validate_dataset.py:103-220 (corpus-scale stats pass).

    python tools/soak_dataset.py --sets 2000 --workers 2
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time
from datetime import datetime
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def build_soak_dataset(root: Path, n_sets: int, broken_every: int = 50) -> dict:
    """~n_sets-set parquet whose rows cycle a small pool of real set dirs."""
    import pandas as pd

    from run_mp_cluster import build_mini_mmrs

    POOL = 8
    build_mini_mmrs(root, POOL)
    pool_rows = pd.read_parquet(root / "metadata.parquet").reset_index()

    statuses = [("ranked", 1), ("loved", 4), ("graveyard", -2)]
    rows = []
    n_broken = 0
    for i in range(n_sets):
        src = pool_rows.iloc[i % POOL]
        broken = broken_every and (i % broken_every == broken_every - 1)
        n_broken += int(bool(broken))
        rows.append(
            {
                "BeatmapSetId": 10_000 + i,
                "Id": 50_000 + i,
                "BeatmapSetFolder": src["BeatmapSetFolder"],
                "BeatmapFile": "missing.osu" if broken else src["BeatmapFile"],
                "AudioFile": src["AudioFile"],
                "ModeInt": 0,
                "Mode": "osu",
                "Cs": 3.0 + (i % 4),
                "Status": statuses[i % 3][0],
                "Ranked": statuses[i % 3][1],
                "UserId": 100 + (i % 997),
                "Creator": f"mapper_{i % 997}",
                "SubmittedDate": datetime(2008 + (i % 15), 1 + (i % 12), 1),
                "DifficultyRating": 1.5 + (i % 70) / 10.0,
                "StarRating": np.linspace(1.0, 5.0, 7),
                "TopTagIds": np.array([1 + (i % 5), 6 + (i % 7)]),
            }
        )
    df = __import__("pandas").DataFrame(rows)
    df.to_parquet(root / "metadata.parquet")
    return {"sets": n_sets, "broken_sets": n_broken, "pool": POOL}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sets", type=int, default=2000)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--root", default="/tmp/mmrs_soak")
    ap.add_argument("--broken-every", type=int, default=50,
                    help="every Nth row points at a missing beatmap file")
    ap.add_argument("--no-audio", action="store_true")
    ap.add_argument("--record", default=None)
    ns = ap.parse_args(argv)

    root = Path(ns.root)
    meta = None
    if not (root / "soak_meta.json").exists():
        root.mkdir(parents=True, exist_ok=True)
        meta = build_soak_dataset(root, ns.sets, ns.broken_every)
        (root / "soak_meta.json").write_text(json.dumps(meta))
        print(f"built soak dataset: {meta}")
    else:
        meta = json.loads((root / "soak_meta.json").read_text())

    import train as train_entry
    from cm3p_tpu.data import DatasetConfig, SampleLoader
    from cm3p_tpu.processing import CM3PProcessor
    from cm3p_tpu.tokenize import MetadataTokenizer

    processor = CM3PProcessor(
        metadata_tokenizer=MetadataTokenizer(
            modes={0: "osu"},
            statuses={1: "ranked", 4: "loved", -2: "graveyard"},
            mappers={100 + i: f"mapper_{i}" for i in range(997)},
            tags={i: {"name": f"tag{i}"} for i in range(1, 13)},
        )
    )
    processor.default_kwargs["beatmap_kwargs"].update(
        {"max_length": 512, "window_length_sec": 10.0, "window_stride_sec": 10.0}
    )
    processor.default_kwargs["audio_kwargs"].update(
        {"pad_to_multiple_of": 160000, "max_source_positions": 1000}
    )

    ds_cfg = DatasetConfig(
        train_dataset_paths=[str(root)],
        cycle_length=8,
        dt_augment_prob=0.5,
        metadata_dropout_prob=0.2,
        include_audio=not ns.no_audio,
        train_metadata_variations=1,
        include_source_metadata=True,
        # exact accounting: drop_last interleaving would truncate the other
        # sub-iterators' tails when the first exhausts (training parity);
        # the soak wants every healthy row's windows to arrive exactly once
        drop_last=False,
    )
    factory = train_entry.MmrsDatasetFactory(
        ds_cfg, processor, test=False, process_id=0, process_count=1, seed=7,
    )
    loader = SampleLoader(factory, num_workers=ns.workers, log_dir=str(root / "logs"))

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0  # MB
    t0 = time.time()
    n_samples = 0
    set_ids = set()
    checkpoints = []  # (samples, elapsed_s, parent_rss_mb)
    for sample in loader:
        n_samples += 1
        if "beatmap_id" in sample:
            set_ids.add(str(sample["beatmap_id"]))
        if n_samples % 500 == 0:
            rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
            checkpoints.append((n_samples, round(time.time() - t0, 1), round(rss, 1)))
            print(f"  {n_samples} samples, {time.time()-t0:.0f}s, parent maxrss {rss:.0f} MB", flush=True)
    wall = time.time() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0

    # worker logs carry the error-skips; count the skip lines
    skip_lines = 0
    log_dir = Path(loader.log_dir or "dataloader")
    if ns.workers and log_dir.exists():
        for wlog in log_dir.glob("worker_*.log"):
            skip_lines += sum(
                1 for line in wlog.open(errors="replace") if "Failed to" in line
            )

    # steady throughput: first vs last quartile of the checkpoint curve
    steady = None
    if len(checkpoints) >= 4:
        q = len(checkpoints) // 4
        first = checkpoints[q][0] / checkpoints[q][1]
        lastn, lastt, _ = checkpoints[-1]
        prevn, prevt, _ = checkpoints[-1 - q]
        last = (lastn - prevn) / max(lastt - prevt, 1e-9)
        steady = round(last / first, 3)

    healthy_sets = meta["sets"] - meta["broken_sets"]
    record = {
        **meta,
        "workers": ns.workers,
        "audio": not ns.no_audio,
        "samples": n_samples,
        "distinct_beatmaps": len(set_ids),
        "wall_s": round(wall, 1),
        "samples_per_sec": round(n_samples / wall, 2),
        "parent_maxrss_mb_start": round(rss0, 1),
        "parent_maxrss_mb_end": round(rss1, 1),
        "rss_growth_mb": round(rss1 - rss0, 1),
        "throughput_last_over_first": steady,
        "worker_skip_log_lines": skip_lines,
        "expected_min_samples": healthy_sets,  # >=1 window per healthy set
        "rss_curve": checkpoints[:: max(1, len(checkpoints) // 20)],
    }
    ok = (
        n_samples >= healthy_sets
        # every healthy row yielded windows; every broken row was skipped
        # with a logged warning — exact error-skip accounting
        and len(set_ids) == healthy_sets
        and (ns.workers == 0 or skip_lines == meta["broken_sets"])
        and (steady is None or steady > 0.5)
        and record["rss_growth_mb"] < 2000
    )
    record["ok"] = bool(ok)
    print("RESULT " + json.dumps({k: v for k, v in record.items() if k != "rss_curve"}))
    if ns.record:
        Path(ns.record).write_text(json.dumps(record, indent=1) + "\n")
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
