"""Measure the REFERENCE's host-side extraction pipeline on this CPU.

VERDICT r2 "next" #1: the honest vs_baseline needs an *evidenced* reference
end-to-end rate, not just a device-FLOPs derivation. The reference's
extraction defaults are `--batch-size 4 --dataloader-num-workers 0`
(/root/reference/extract_beatmap_embeddings.py:61-62): the processor
(parse -> tokenize -> Whisper mel -> window split) runs in the MAIN process,
serialized with the GPU forward. Its host cost per window is therefore a
hard lower bound on its end-to-end seconds/window at the shipped defaults,
and host_rate x N bounds any N-worker configuration.

This tool runs the actual reference processor (over the functional slider
shim the parity suites use) on the bundled beatmap + synthesized audio at
the published 16 s embedding granularity (/root/reference/README.md:34),
mirroring BeatmapFilesDataset's exact call
(/root/reference/utils/beatmap_files_dataset.py:253-266: include_metadata
False, padding MAX_LENGTH, return_tensors pt), and compares our processor
on identical input. Prints one JSON blob; numbers feed
bench.reference_rate_derivation() and BASELINE.md.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

BEATMAP = str(
    REPO
    / "resources"
    / "Denkishiki Karen Ongaku Shuudan - Aoki Kotou no Anguis (OliBomby) [Ardens Spes].osu"
)
SAMPLING_RATE = 16000


def synth_audio(seconds: float) -> np.ndarray:
    t = np.arange(int(seconds * SAMPLING_RATE), dtype=np.float32) / SAMPLING_RATE
    # broadband-ish deterministic content so the mel path does real work
    return (
        0.4 * np.sin(2 * np.pi * 220.0 * t)
        + 0.3 * np.sin(2 * np.pi * 1337.0 * t)
        + 0.1 * np.sin(2 * np.pi * 7000.0 * t)
    ).astype(np.float32)


def build_reference_processor():
    import slider_shim

    slider_shim.install()
    sys.path.append("/root/reference")  # APPEND: reference modules (validate_dataset, train, config, ...) must never shadow ours
    from transformers import WhisperFeatureExtractor

    from cm3p.parsing_cm3p import CM3PBeatmapParser
    from cm3p.processing_cm3p import CM3PProcessor as RefProcessor
    from cm3p.tokenization_cm3p import CM3PBeatmapTokenizer, CM3PMetadataTokenizer

    import ref_compat

    ref_compat.install(CM3PBeatmapParser, CM3PBeatmapTokenizer, CM3PMetadataTokenizer)

    return RefProcessor(
        WhisperFeatureExtractor(),
        CM3PBeatmapParser(),
        CM3PBeatmapTokenizer(),
        CM3PMetadataTokenizer(modes={0: "osu"}, mappers={0: "OliBomby"}),
    )


def time_processor(call, warmups: int = 1, iters: int = 5):
    for _ in range(warmups):
        out = call()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call()
    dt = (time.perf_counter() - t0) / iters
    n_windows = len(out["input_ids"])
    return dt, n_windows


def main():
    audio = synth_audio(255.0)  # the bundled map is ~255 s

    # ---- reference processor, extraction-shaped call ----------------------
    ref_proc = build_reference_processor()

    def ref_call():
        from transformers.utils import PaddingStrategy

        return ref_proc(
            metadata=None,
            beatmap=BEATMAP,
            audio=audio,
            audio_sampling_rate=SAMPLING_RATE,
            speed=1.0,
            multiply_metadata=False,
            populate_metadata=False,
            metadata_dropout_prob=0.0,
            metadata_variations=1,
            window_length_sec=16.0,
            window_stride_sec=16.0,
            padding=PaddingStrategy.MAX_LENGTH,
            return_tensors="pt",
        )

    ref_dt, ref_windows = time_processor(ref_call)

    # no-audio variant isolates parse+tokenize from the mel front end
    def ref_call_noaudio():
        from transformers.utils import PaddingStrategy

        return ref_proc(
            metadata=None,
            beatmap=BEATMAP,
            audio=None,
            speed=1.0,
            multiply_metadata=False,
            populate_metadata=False,
            metadata_variations=1,
            window_length_sec=16.0,
            window_stride_sec=16.0,
            padding=PaddingStrategy.MAX_LENGTH,
            return_tensors="pt",
        )

    ref_dt_na, _ = time_processor(ref_call_noaudio)

    # ---- our processor, same input / same granularity ---------------------
    from cm3p_tpu.processing import CM3PProcessor

    ours = CM3PProcessor()

    def our_call():
        return ours(
            beatmap=BEATMAP,
            audio=audio,
            audio_sampling_rate=SAMPLING_RATE,
            window_length_sec=16.0,
            window_stride_sec=16.0,
            padding="max_length",
        )

    our_dt, our_windows = time_processor(our_call)

    result = {
        "metric": "reference_host_pipeline",
        "beatmap": Path(BEATMAP).name,
        "audio_seconds": 255.0,
        "reference": {
            "sec_per_beatmap": round(ref_dt, 4),
            "sec_per_beatmap_noaudio": round(ref_dt_na, 4),
            "windows": ref_windows,
            "windows_per_sec_host": round(ref_windows / ref_dt, 2),
            "call": "processing_cm3p.CM3PProcessor, BeatmapFilesDataset-shaped "
            "(include_metadata=False, MAX_LENGTH, pt)",
        },
        "ours": {
            "sec_per_beatmap": round(our_dt, 4),
            "windows": our_windows,
            "windows_per_sec_host": round(our_windows / our_dt, 2),
        },
        "host_speedup": round(ref_dt / our_dt, 2),
        "note": "single process, this machine's 1 CPU core; the reference's "
        "shipped extraction default is dataloader-num-workers=0, i.e. this "
        "host work serializes with the device forward",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
