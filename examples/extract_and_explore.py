"""End-to-end example: extract embeddings for your beatmaps and explore them.

The script equivalent of the reference's Colab notebook
(``colab/CM3P_embeddings.ipynb``): load (or randomly init) a model, process
local ``.osu``/``.osz`` files into per-beatmap embeddings, optionally merge
with a precomputed embeddings parquet, run the analytics core (PCA +
k-means + kNN) and write everything ready for the browser visualizer.

    python examples/extract_and_explore.py --beatmaps my_maps/ --output explore/
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--beatmaps", required=True, help=".osu/.osz files or directories")
    parser.add_argument("--output", required=True)
    parser.add_argument("--model-dir", default=None, help="trained model dir (random init if absent)")
    parser.add_argument("--processor-dir", default=None)
    parser.add_argument("--merge-with", default=None, help="precomputed embeddings parquet")
    parser.add_argument("--clusters", type=int, default=8)
    parser.add_argument("--cpu", action="store_true")
    ns = parser.parse_args(argv)

    out_dir = Path(ns.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    emb_path = out_dir / "embeddings.parquet"

    # 1. extract embeddings (reuses the CLI tool's plumbing)
    import extract_beatmap_embeddings as extractor

    extractor_args = [
        "--beatmap-files", ns.beatmaps,
        "--output", str(emb_path),
        "--no-audio",
    ]
    if ns.model_dir:
        extractor_args += ["--model-dir", ns.model_dir]
    else:
        extractor_args += ["--tiny-model", "--max-length", "1024"]
    if ns.processor_dir:
        extractor_args += ["--processor-dir", ns.processor_dir]
    if ns.merge_with:
        extractor_args += ["--merge-with", ns.merge_with]
    if ns.cpu:
        extractor_args += ["--cpu"]
    extractor.main(extractor_args)

    # 2. analytics: PCA projection + clusters + neighbors
    import pandas as pd

    from cm3p_tpu import native

    df = pd.read_parquet(emb_path)
    emb = np.stack(df["embedding"].to_numpy()).astype(np.float32)
    points = native.calculate_pca(emb)
    labels = native.calculate_kmeans(emb, k=min(ns.clusters, len(emb)))
    normalized = native.normalize_vectors(emb)

    df["x"], df["y"], df["cluster"] = points[:, 0], points[:, 1], labels
    df.to_parquet(out_dir / "embeddings_projected.parquet", index=False)

    # visualizer-ready JSON (works offline, no parquet parser needed)
    records = df.drop(columns=[c for c in df.columns if df[c].dtype == object and c not in ("Title", "Artist", "Creator", "Version", "Status")], errors="ignore")
    viz = df[[c for c in ("beatmap_id", "Title", "Artist", "Creator", "Version", "Status", "Cs") if c in df.columns]].copy()
    viz["embedding"] = [list(map(float, e)) for e in emb]
    viz.to_json(out_dir / "embeddings_viz.json", orient="records")

    # 3. neighbor report for the first beatmap
    if len(emb) > 1:
        idx, dist = native.find_nearest_neighbors(normalized, 0, min(5, len(emb) - 1))
        names = df["Title"].fillna("").tolist() if "Title" in df else [str(i) for i in range(len(df))]
        print(f"\nNearest neighbors of '{names[0]}':")
        for i, (j, d) in enumerate(zip(idx, dist), 1):
            print(f"  {i}. {names[j]} (cosine distance {d:.4f})")

    print(
        json.dumps(
            {
                "beatmaps": len(df),
                "clusters": int(labels.max()) + 1 if len(labels) else 0,
                "outputs": [str(emb_path), str(out_dir / "embeddings_viz.json")],
                "next": "serve visualizer/ and load embeddings_viz.json",
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
