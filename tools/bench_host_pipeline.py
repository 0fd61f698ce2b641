"""Host data-pipeline throughput profile (samples/s per worker).

The real-data convergence run (BASELINE.md) was data-pipeline-bound: the jit
step takes 0.37 s but the run sustained only ~0.5-0.6 steps/s with 2 loader
workers. This tool measures the per-worker sample rate of the full host path
(parquet row -> audio decode -> parse -> window -> tokenize -> mel ->
variations) on the same 8-set real-beatmap fixture, and prints a cProfile
top list so optimization goes where the time is.

    python tools/bench_host_pipeline.py [--samples 200] [--profile]
"""
from __future__ import annotations

import argparse
import cProfile
import io
import json
import pstats
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=200)
    ap.add_argument("--variations", type=int, default=8)
    ap.add_argument("--max-length", type=int, default=2048)
    ap.add_argument("--root", default="/tmp/mmrs_convergence")
    ap.add_argument("--profile", action="store_true", help="print cProfile hotspots")
    ap.add_argument("--no-audio", action="store_true")
    ns = ap.parse_args(argv)

    from tools.tpu_convergence import build_dataset

    root = Path(ns.root)
    if not (root / "metadata.parquet").exists():
        build_dataset(root, 8)

    from cm3p_tpu.data import DatasetConfig, MmrsDataset
    from cm3p_tpu.utils.config import load_config

    args = load_config(Path(REPO / "configs" / "train"), "default", [
        f"dataset.train_dataset_paths=[{root}]",
        f"dataset.test_dataset_paths=[{root}]",
        f"dataset.train_metadata_variations={ns.variations}",
        "dataset.cycle_length=4",
        f"processor.default_kwargs.beatmap_kwargs.max_length={ns.max_length}",
    ] + (["dataset.include_audio=false"] if ns.no_audio else []))

    from train import build_processor

    ds_cfg = DatasetConfig(**{k: v for k, v in args["dataset"].items() if k != "synthetic"})
    processor = build_processor(args, ds_cfg)
    dataset = MmrsDataset(ds_cfg, processor, test=False, worker_id=0, num_workers=1)

    state = {"it": iter(dataset)}
    next(state["it"])  # warm one sample (audio cache etc.) before timing

    def _next():
        try:
            return next(state["it"])
        except StopIteration:  # epoch boundary: restart (fixture is tiny)
            state["it"] = iter(dataset)
            return next(state["it"])

    def run(n):
        got = 0
        for _ in range(n):
            _next()
            got += 1
        return got

    if ns.profile:
        prof = cProfile.Profile()
        t0 = time.perf_counter()
        prof.enable()
        got = run(ns.samples)
        prof.disable()
        dt = time.perf_counter() - t0
        s = io.StringIO()
        pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(30)
        print(s.getvalue())
    else:
        t0 = time.perf_counter()
        got = run(ns.samples)
        dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "host_pipeline_samples_per_sec",
        "value": round(got / dt, 2),
        "unit": "samples/s/worker",
        "detail": {"samples": got, "seconds": round(dt, 2),
                   "variations": ns.variations, "max_length": ns.max_length,
                   "audio": not ns.no_audio},
    }))


if __name__ == "__main__":
    main()
