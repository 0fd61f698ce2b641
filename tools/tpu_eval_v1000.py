"""Trainer.evaluate at the reference's test-time V=1000, end to end.

The reference evaluates with 1000 metadata variations per sample
(``/root/reference/configs/train/default.yaml:147``, consumed by the HF
eval loop ``/root/reference/train.py:92-139``). Round 2 timed the raw
V=1000 *step* on hardware (``bench_variations.py``: 0.260 s), but the
PIPELINE at that scale — the host-side variation generator emitting 1000
tokenized variations per sample, their padding, the (B, 1000, L) device
batches, and the zero-shot metric accumulator over (B, B, 1000) logits —
had only ever executed at V<=8. This tool runs the real ``Trainer.evaluate``
loop (real MMRS fixture, real model config) at V=1000 and records
wall-clock split into host-pipeline and device time for BASELINE.md.

Usage:
    python tools/tpu_eval_v1000.py                  # real chip, full model
    python tools/tpu_eval_v1000.py --cpu            # tiny smoke (tests)
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sets", type=int, default=8)
    ap.add_argument("--root", default="/tmp/mmrs_eval_v1000")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--variations", type=int, default=1000)
    ap.add_argument("--max-length", type=int, default=2048)
    ap.add_argument("--max-eval-batches", type=int, default=2)
    ap.add_argument("--config", default="default")
    ap.add_argument("--record", default=None)
    ap.add_argument("--cpu", action="store_true", help="tiny model on CPU (smoke)")
    ns = ap.parse_args(argv)

    if ns.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    from cm3p_tpu.utils.cache import enable_compilation_cache

    if not ns.cpu:
        enable_compilation_cache()

    from tpu_convergence import build_dataset

    root = Path(ns.root)
    if not (root / "metadata.parquet").exists():
        root.mkdir(parents=True, exist_ok=True)
        build_dataset(root, ns.sets)

    import optax

    import train as train_entry
    from cm3p_tpu.data import DatasetConfig
    from cm3p_tpu.train import Trainer
    from cm3p_tpu.train.train_state import create_train_state
    from cm3p_tpu.utils.config import load_config

    config_name = ns.config
    overrides = [
        f"dataset.train_dataset_paths=[{root}]",
        f"dataset.test_dataset_paths=[{root}]",
        f"dataset.test_metadata_variations={ns.variations}",
        "dataset.labels=none",
        f"training.per_device_eval_batch_size={ns.batch}",
        f"training.max_eval_batches={ns.max_eval_batches}",
        "training.num_workers=0",
        "training.packed=false",
        f"processor.default_kwargs.beatmap_kwargs.max_length={ns.max_length}",
    ]
    if ns.cpu:
        config_name = "smoke" if ns.config == "default" else ns.config
        overrides += ["dataset.synthetic=false", "attn_impl=xla"]
    args = load_config(str(REPO / "configs" / "train"), config_name, overrides)

    dataset_kwargs = {k: v for k, v in args["dataset"].items() if k != "synthetic"}
    ds_cfg = DatasetConfig(**dataset_kwargs)
    processor = train_entry.build_processor(args, ds_cfg)
    model_cfg, model = train_entry.build_model(args, processor)

    eval_factory = train_entry.mmrs_batches(args, processor, test=True)

    # host-pipeline-only pass: how long the variation generator + padding
    # takes to produce the eval batches without any device work
    t0 = time.perf_counter()
    host_batches = []
    for i, b in enumerate(eval_factory()):
        if i >= ns.max_eval_batches:
            break
        host_batches.append({k: v.shape for k, v in b.items() if hasattr(v, "shape")})
    host_s = time.perf_counter() - t0
    if not host_batches:
        sys.exit("fixture produced no eval batches")
    print(f"host pipeline: {len(host_batches)} batches in {host_s:.2f} s "
          f"(shapes: { {k: list(v) for k, v in host_batches[0].items()} })")

    trainer = Trainer(
        model,
        optax.sgd(0.0),
        eval_factory,
        eval_factory,
        output_dir=str(Path(ns.root) / "out"),
        max_eval_batches=ns.max_eval_batches,
        eval_has_variations=True,
        labels_kind="none",
    )
    rng = jax.random.PRNGKey(0)
    example = next(iter(eval_factory()))
    example = {k: v for k, v in example.items() if k != "beatmap_id"}
    state = create_train_state(model, trainer.tx, rng, example)

    results = {}
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        metrics = trainer.evaluate(state)
        wall = time.perf_counter() - t0
        results[tag] = {"wall_s": round(wall, 2), "metrics": {k: (round(float(v), 4) if v is not None else None) for k, v in metrics.items()}}
        print(f"{tag} evaluate: {wall:.2f} s  metrics={results[tag]['metrics']}")

    record = {
        "variations": ns.variations,
        "batch": ns.batch,
        "max_length": ns.max_length,
        "eval_batches": len(host_batches),
        "host_pipeline_s": round(host_s, 2),
        "backend": jax.default_backend(),
        **results,
    }
    out = json.dumps(record)
    print("RESULT " + out)
    if ns.record:
        Path(ns.record).write_text(out + "\n")
    trainer.close()


if __name__ == "__main__":
    main()
