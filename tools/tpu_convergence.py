"""End-to-end training-convergence check on real data (TPU or CPU).

Builds a small MMRS-layout dataset from the bundled REAL beatmap
(``resources/*.osu``) — N beatmapsets, each a metadata-perturbed copy with
its own audio track — then runs the actual ``train.py`` recipe (full data
pipeline with augmentations, Pallas kernels, Muon, contrastive loss with
metadata variations) for a few hundred steps and summarizes the loss
trajectory from ``train_log.jsonl``.

This is evidence the framework *trains*, not just that one step compiles:
the reference's tests forward a single batch (``tests/test_cm3p.py``), and
its real training requires the 39k-set MMRS dataset. Protocol + measured
curves: BASELINE.md "convergence" section.

    python tools/tpu_convergence.py --steps 300
"""
from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import wave
from datetime import datetime
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

BUNDLED = next((REPO / "resources").glob("*.osu"))


def _last_object_ms(osu_text: str) -> int:
    last = 0
    in_objects = False
    for line in osu_text.splitlines():
        line = line.strip()
        if line == "[HitObjects]":
            in_objects = True
            continue
        if in_objects and line and not line.startswith("["):
            parts = line.split(",")
            if len(parts) >= 3:
                try:
                    last = max(last, int(float(parts[2])))
                except ValueError:
                    pass
    return last


def _patch_metadata(osu_text: str, *, title: str, creator: str, sid: int, bid: int) -> str:
    """Rewrite the [Metadata] identity fields so each copy is a distinct beatmap."""
    subs = {
        "Title": title,
        "TitleUnicode": title,
        "Creator": creator,
        "BeatmapID": str(bid),
        "BeatmapSetID": str(sid),
    }
    out = []
    for line in osu_text.splitlines():
        m = re.match(r"^(\w+)\s*:", line)
        if m and m.group(1) in subs:
            out.append(f"{m.group(1)}:{subs[m.group(1)]}")
        else:
            out.append(line)
    return "\n".join(out)


def write_wav(path: Path, seconds: float, freq: float, rate: int = 16000) -> None:
    n = int(seconds * rate)
    t = np.linspace(0, seconds, n, endpoint=False)
    data = (np.sin(2 * np.pi * freq * t) * 0.3 * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(data.tobytes())


def build_dataset(root: Path, n_sets: int, corpus: bool = False) -> None:
    """N beatmapsets from the bundled map, or — with ``corpus`` — cycling the
    16-map perf corpus (modes x densities x lengths, VERDICT r2 next #7) so
    the system e2e numbers cover the full input distribution."""
    sources = [BUNDLED]
    if corpus:
        corpus_dir = REPO / "resources" / "perf_corpus"
        sources = sorted(corpus_dir.glob("*.osu")) + [BUNDLED]
        if len(sources) < 2:
            raise FileNotFoundError(f"perf corpus missing: {corpus_dir} (run tools/make_perf_corpus.py)")
    statuses = [("ranked", 1), ("loved", 4), ("graveyard", -2), ("qualified", 3)]
    rows = []
    for i in range(n_sets):
        src = sources[i % len(sources)]
        osu_text = src.read_text(encoding="utf-8")
        seconds = _last_object_ms(osu_text) / 1000.0 + 2.0
        mode_m = re.search(r"^Mode:\s*(\d+)", osu_text, re.MULTILINE)
        mode_int = int(mode_m.group(1)) if mode_m else 0
        sid, bid = 1000 + i, 5000 + i
        folder = f"set_{sid}"
        set_dir = root / "data" / folder
        set_dir.mkdir(parents=True, exist_ok=True)
        write_wav(set_dir / "audio.wav", seconds, freq=220.0 * (1 + i * 0.25))
        fname = f"map_{bid}.osu"
        (set_dir / fname).write_text(
            _patch_metadata(
                osu_text, title=f"Convergence Track {i}", creator=f"mapper_{i}", sid=sid, bid=bid
            ),
            encoding="utf-8",
        )
        rows.append(
            {
                "BeatmapSetId": sid,
                "Id": bid,
                "BeatmapSetFolder": folder,
                "BeatmapFile": fname,
                "AudioFile": "audio.wav",
                "ModeInt": mode_int,
                "Mode": {0: "osu", 1: "taiko", 2: "fruits", 3: "mania"}[mode_int],
                "Cs": 3.0 + (i % 4),
                "Status": statuses[i % len(statuses)][0],
                "Ranked": statuses[i % len(statuses)][1],
                "UserId": 100 + i,
                "Creator": f"mapper_{i}",
                "SubmittedDate": datetime(2008 + i, 3, 1),
                "DifficultyRating": 2.0 + 0.7 * i,
                "StarRating": np.linspace(1.5 + 0.5 * i, 4.5 + 0.5 * i, 7),
                "TopTagIds": np.array([1 + (i % 5), 6 + (i % 7)]),
            }
        )
    pd.DataFrame(rows).to_parquet(root / "metadata.parquet")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--sets", type=int, default=8)
    ap.add_argument("--root", default="/tmp/mmrs_convergence")
    ap.add_argument("--output", default="/tmp/convergence_run")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--variations", type=int, default=8)
    ap.add_argument("--max-length", type=int, default=2048)
    ap.add_argument("--config", default="default",
                    help="train recipe to run (e.g. v8_packed for the packed production recipe)")
    ap.add_argument("--cpu", action="store_true", help="tiny model on CPU (CI smoke)")
    ap.add_argument(
        "--corpus", action="store_true",
        help="fixture cycles the 16-map perf corpus (all four game modes, "
        "densities, lengths) instead of copies of the bundled std map - "
        "trains the multi-mode parser/tokenizer paths end to end",
    )
    # unknown key=value args pass through as config overrides (e.g.
    # from_pretrained=... for the staged-lineage legs)
    ns, extra_overrides = ap.parse_known_args(argv)
    for x in extra_overrides:
        if "=" not in x or x.startswith("-"):
            ap.error(f"unrecognized argument: {x}")

    root = Path(ns.root)
    if not (root / "metadata.parquet").exists():
        build_dataset(root, ns.sets, corpus=ns.corpus)
        print(f"built {ns.sets}-set real-beatmap MMRS fixture at {root}"
              + (" (perf-corpus maps, all modes)" if ns.corpus else ""))

    overrides = [
        f"dataset.train_dataset_paths=[{root}]",
        f"dataset.test_dataset_paths=[{root}]",
        f"dataset.train_metadata_variations={ns.variations}",
        "dataset.test_metadata_variations=8",
        "dataset.cycle_length=4",
        f"training.max_steps={ns.steps}",
        f"training.per_device_train_batch_size={ns.batch_size}",
        f"training.per_device_eval_batch_size={ns.batch_size}",
        "training.gradient_accumulation_steps=1",
        "training.optim=muon",
        "training.learning_rate=4.0e-4",
        f"training.logging_steps={max(1, min(10, ns.steps // 10))}",
        f"training.eval_steps={ns.steps * 10}",
        "training.max_eval_batches=2",
        f"training.save_steps={ns.steps * 10}",
        "training.load_best_model_at_end=false",
        "training.overwrite_output_dir=true",
        "training.num_workers=2",
        f"training.output_dir={ns.output}",
        f"processor.default_kwargs.beatmap_kwargs.max_length={ns.max_length}",
    ]
    config = ns.config
    if ns.cpu:
        # only default to the smoke recipe; an explicit --config wins and
        # keeps its own labels (v6_mask/v7 need masked_lm, v7_classifier
        # needs ranked_classification — labels=none is smoke-only)
        if config == "default":
            config = "smoke"
            overrides += ["dataset.labels=none"]
        overrides += ["dataset.synthetic=false", "attn_impl=xla"]

    cmd = [sys.executable, str(REPO / "train.py"), "--config-name", config]
    if ns.cpu:
        cmd.append("--cpu")
    cmd += overrides + extra_overrides
    print("running:", " ".join(cmd))
    res = subprocess.run(cmd, cwd=REPO)
    if res.returncode != 0:
        sys.exit(res.returncode)

    log = Path(ns.output) / "train_log.jsonl"
    losses = []
    for line in log.read_text().splitlines():
        rec = json.loads(line)
        if "loss" in rec:
            losses.append((rec["step"], rec["loss"]))
    if not losses:
        sys.exit("no loss records found")
    k = max(1, len(losses) // 10)
    first = float(np.mean([l for _, l in losses[:k]]))
    last = float(np.mean([l for _, l in losses[-k:]]))
    summary = {
        "steps": losses[-1][0],
        "first_loss_mean": round(first, 4),
        "last_loss_mean": round(last, 4),
        "min_loss": round(min(l for _, l in losses), 4),
        "decreased": last < first,
        "curve": [(s, round(l, 3)) for s, l in losses],
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "curve"}))
    (Path(ns.output) / "convergence_summary.json").write_text(json.dumps(summary, indent=1))
    if not summary["decreased"]:
        sys.exit("loss did not decrease")


if __name__ == "__main__":
    main()
