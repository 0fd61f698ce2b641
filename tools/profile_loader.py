"""cProfile the extraction loader path in-process (no TPU, no workers).

Reproduces exactly what one SampleLoader worker does for the e2e bench
fixture: MmrsDataset(extract config) iteration — parse, tokenize, mel
(compact wire), metadata derivation — so the 'loader' seconds of
bench_extract_e2e.py can be attributed function by function.

    python tools/profile_loader.py [--sets 8] [--sort cumulative] [--top 40]
"""
from __future__ import annotations

import argparse
import cProfile
import pstats
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sets", type=int, default=8)
    ap.add_argument("--root", default="/tmp/mmrs_profile_fixture")
    ap.add_argument("--sort", default="cumulative")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--no-audio", action="store_true")
    ap.add_argument("--no-compact", action="store_true")
    ns = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from tpu_convergence import build_dataset

    root = Path(ns.root)
    if not (root / "metadata.parquet").exists():
        root.mkdir(parents=True, exist_ok=True)
        build_dataset(root, ns.sets)

    from cm3p_tpu.data import DatasetConfig, MmrsDataset
    from cm3p_tpu.processing import CM3PProcessor

    processor = CM3PProcessor()
    bk = processor.default_kwargs["beatmap_kwargs"]
    bk["max_length"] = 4096
    bk["window_length_sec"] = 16
    bk["window_stride_sec"] = 16
    if not ns.no_audio and not ns.no_compact:
        processor.default_kwargs["audio_kwargs"]["compact_tail"] = True

    ds_cfg = DatasetConfig(
        train_dataset_paths=[str(root)],
        include_audio=not ns.no_audio,
        include_metadata=False,
        include_source_metadata=True,
        dt_augment_prob=0.0,
        cycle_length=1,
    )
    ds = MmrsDataset(ds_cfg, processor, worker_id=0, num_workers=1, test=False)

    # warm one sample outside the profile (vocab build, native lib dlopen)
    it = iter(ds)
    next(it)

    prof = cProfile.Profile()
    t0 = time.perf_counter()
    prof.enable()
    n = 0
    for _ in ds:
        n += 1
    prof.disable()
    dt = time.perf_counter() - t0
    print(f"{n} samples in {dt:.2f}s = {n / dt:.1f} samples/s")
    stats = pstats.Stats(prof)
    stats.sort_stats(ns.sort).print_stats(ns.top)


if __name__ == "__main__":
    main()
