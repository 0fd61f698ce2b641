"""Retrieval-quality parity between two embedding sets (BASELINE metric #3).

Given two embeddings parquets (e.g. reference PyTorch extraction vs ours)
joined on ``Id``/``beatmap_id``, computes cosine-similarity statistics and
recall@k agreement of nearest-neighbor sets — R@10 parity means a user's
similarity search returns (almost) the same maps either way.

    python tools/retrieval_parity.py --a ref_embeddings.parquet --b ours.parquet [--k 10]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))


def load_embeddings(path: str) -> pd.DataFrame:
    df = pd.read_parquet(path)
    id_col = "Id" if "Id" in df.columns else "beatmap_id"
    out = pd.DataFrame({"id": df[id_col].astype("int64"), "embedding": df["embedding"]})
    return out.dropna(subset=["embedding"]).drop_duplicates("id")


def knn_sets(emb: np.ndarray, k: int) -> np.ndarray:
    from cm3p_tpu import native

    normalized = native.normalize_vectors(emb)
    sims = normalized @ normalized.T
    np.fill_diagonal(sims, -np.inf)
    return np.argsort(-sims, axis=1)[:, :k]


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--a", required=True, help="reference embeddings parquet")
    parser.add_argument("--b", required=True, help="candidate embeddings parquet")
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--max-rows", type=int, default=20000)
    ns = parser.parse_args(argv)

    a = load_embeddings(ns.a)
    b = load_embeddings(ns.b)
    joined = a.merge(b, on="id", suffixes=("_a", "_b"))
    if len(joined) > ns.max_rows:
        joined = joined.sample(ns.max_rows, random_state=0).reset_index(drop=True)
    if len(joined) < ns.k + 1:
        print(json.dumps({"error": f"only {len(joined)} shared ids"}))
        return 1

    emb_a = np.stack(joined["embedding_a"].to_numpy()).astype(np.float32)
    emb_b = np.stack(joined["embedding_b"].to_numpy()).astype(np.float32)

    na = emb_a / np.clip(np.linalg.norm(emb_a, axis=1, keepdims=True), 1e-9, None)
    nb = emb_b / np.clip(np.linalg.norm(emb_b, axis=1, keepdims=True), 1e-9, None)
    cos = (na * nb).sum(axis=1)

    knn_a = knn_sets(emb_a, ns.k)
    knn_b = knn_sets(emb_b, ns.k)
    overlap = np.array([len(set(x) & set(y)) / ns.k for x, y in zip(knn_a, knn_b)])

    result = {
        "metric": f"recall_at_{ns.k}_agreement",
        "value": round(float(overlap.mean()), 4),
        "unit": "fraction",
        "detail": {
            "rows": len(joined),
            "cosine_mean": round(float(cos.mean()), 6),
            "cosine_min": round(float(cos.min()), 6),
            "cosine_drift_mean": round(float(1 - cos.mean()), 6),
            "knn_overlap_p10": round(float(np.percentile(overlap, 10)), 4),
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
