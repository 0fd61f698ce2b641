"""Mel-wire quantization verdict: int8 vs bf16 on real windows (TPU).

VERDICT r2 next #2 lists the int8 mel wire as the remaining drain lever
(the compact bf16 transfer is ~264 MB per 1024 windows and bounds the
drain stage once the loader has cores). This measures, on the real chip:

1. drift: embeddings from the int8 wire (per-window symmetric scale,
   on-device dequant) vs the bf16 wire on real 16 s windows of the bundled
   map with synthesized audio — cos_min / drift_max, same protocol as
   tools/bench_int8_drift.py.
2. device-side cost: per-flush time of extract_packed_compact vs _q at the
   production flush shape (the dequant multiply is HBM-trivial; the win is
   the halved transfer, visible through the relay as fetch latency).

    python tools/bench_mel_wire.py [--windows 128]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from cm3p_tpu.utils.profiling import probe_link  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=128)
    ap.add_argument("--iters", type=int, default=6)
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import BEATMAP_FIXTURE
    from cm3p_tpu.configs import CM3PConfig
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.processing import CM3PProcessor
    from cm3p_tpu.processing.packing import pack_windows
    from cm3p_tpu.utils.platform import resolve_attn_impl

    proc = CM3PProcessor()
    sr = 16000
    t = np.arange(int(sr * 255.0), dtype=np.float32) / sr
    audio = (
        0.4 * np.sin(2 * np.pi * 220.0 * t)
        + 0.3 * np.sin(2 * np.pi * 1337.0 * t)
        + 0.1 * np.sin(2 * np.pi * 7000.0 * t)
    ).astype(np.float32)
    out = proc(
        beatmap=BEATMAP_FIXTURE, audio=audio, audio_sampling_rate=sr,
        window_length_sec=16.0, window_stride_sec=16.0, padding="longest",
        compact_tail=True,
    )
    out_pcm = proc(
        beatmap=BEATMAP_FIXTURE, audio=audio, audio_sampling_rate=sr,
        window_length_sec=16.0, window_stride_sec=16.0, padding="longest",
        pcm_wire=True,
    )
    ids = np.asarray(out["input_ids"])
    lengths = np.asarray(out["attention_mask"]).sum(axis=1)
    feats = np.asarray(out["input_features"], np.float32)  # (w, 80, f_cap)
    tails = np.asarray(out["input_features_tail"], np.float32)
    pcm_all = np.asarray(out_pcm["input_features_pcm"], np.float32)
    seqs = [ids[i, : lengths[i]] for i in range(len(ids))]
    reps = -(-ns.windows // len(seqs))
    order = list(range(len(seqs))) * reps
    order = order[: ns.windows]
    seqs = [seqs[i] for i in order]
    feats = feats[order]
    tails = tails[order]
    pcm_all = pcm_all[order]

    cfg = CM3PConfig()
    from cm3p_tpu.tokenize import BeatmapTokenizer

    cfg.beatmap_config.vocab_size = BeatmapTokenizer().vocab_size
    model = CM3PModule(cfg, dtype=jnp.bfloat16, attn_impl=resolve_attn_impl("pallas"))

    seq_len = 4096
    packed = pack_windows(seqs, seq_len, pad_id=proc.beatmap_tokenizer.pad_token_id)
    rows = packed["input_ids"].shape[0]
    w = len(seqs)
    msp = proc.default_kwargs["audio_kwargs"].get("max_source_positions", 3000)

    batch = {
        "input_ids": jnp.asarray(packed["input_ids"], jnp.int32),
        "segment_ids": jnp.asarray(packed["segment_ids"], jnp.int32),
        "window_rows": jnp.asarray(packed["window_to_row"], jnp.int32),
        "window_segments": jnp.asarray(packed["window_segment"], jnp.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=batch["input_ids"][:1],
        attention_mask=jnp.ones((1, seq_len), jnp.int32),
        input_features=jnp.zeros((1, 80, 32), jnp.float32),
        return_loss=False,
    )

    def compact_body(params, b, dense, tail):
        wn, n_mels, f_cap = dense.shape
        full = jnp.concatenate(
            [dense, jnp.broadcast_to(tail[:, None, None].astype(dense.dtype), (wn, n_mels, msp - f_cap))],
            axis=2,
        )
        return model.apply(
            params, method=CM3PModule.get_packed_beatmap_features,
            input_ids=b["input_ids"], segment_ids=b["segment_ids"],
            window_rows=b["window_rows"], window_segments=b["window_segments"],
            input_features=full, normalize=True,
        )

    bf16_fn = jax.jit(compact_body)

    @jax.jit
    def int8_fn(params, b, dense_i8, scale, tail):
        dense = dense_i8.astype(jnp.bfloat16) * scale[:, None, None].astype(jnp.bfloat16)
        return compact_body(params, b, dense, tail)

    dense_bf16 = jnp.asarray(feats, jnp.bfloat16)
    tails_bf16 = jnp.asarray(tails, jnp.bfloat16)
    scales = (np.abs(feats).max(axis=(1, 2)) / 127.0).astype(np.float32)
    scales[scales == 0] = 1.0
    dense_i8 = jnp.asarray(
        np.clip(np.rint(feats / scales[:, None, None]), -127, 127).astype(np.int8)
    )
    scales_j = jnp.asarray(scales)

    e_bf16 = np.asarray(bf16_fn(params, batch, dense_bf16, tails_bf16), np.float32)[:w]
    e_int8 = np.asarray(int8_fn(params, batch, dense_i8, scales_j, tails_bf16), np.float32)[:w]
    cos = np.sum(e_bf16 * e_int8, axis=1) / (
        np.linalg.norm(e_bf16, axis=1) * np.linalg.norm(e_int8, axis=1) + 1e-12
    )
    drift = np.abs(e_bf16 - e_int8).max()

    def timed(fn, params, b, *host_arrays):
        # the wire arrays enter as HOST numpy and convert INSIDE the timed
        # region, so the host->device transfer is part of the measurement
        # (the r13 arm-A run passed device-resident arrays and therefore
        # timed only compute — all three wires tied at ~1.09 s)
        def once():
            return np.asarray(fn(params, b, *(jnp.asarray(a) for a in host_arrays)))

        once()
        t0 = time.perf_counter()
        for _ in range(ns.iters):
            once()
        return (time.perf_counter() - t0) / ns.iters

    from cm3p_tpu.audio.device_mel import DeviceLogMel

    fe = proc.audio_feature_extractor
    dm = DeviceLogMel(fe.feature_size, fe.sampling_rate, fe.hop_length, fe.n_fft)

    @jax.jit
    def pcm_fn(params, b, pcm):
        dense, tail = dm(pcm)
        return compact_body(params, b, dense.astype(jnp.bfloat16), tail.astype(jnp.bfloat16))

    pcm_j = jnp.asarray(pcm_all)
    e_pcm = np.asarray(pcm_fn(params, batch, pcm_j), np.float32)[:w]
    cos_pcm = np.sum(e_bf16 * e_pcm, axis=1) / (
        np.linalg.norm(e_bf16, axis=1) * np.linalg.norm(e_pcm, axis=1) + 1e-12
    )

    dense_host = np.asarray(feats).astype(jnp.bfloat16)
    tails_host = np.asarray(tails).astype(jnp.bfloat16)
    i8_host = np.asarray(dense_i8)
    t_bf16 = timed(bf16_fn, params, batch, dense_host, tails_host)
    t_int8 = timed(int8_fn, params, batch, i8_host, scales, tails_host)
    t_pcm = timed(pcm_fn, params, batch, pcm_all)

    print(json.dumps({
        "metric": "mel_wire_int8_verdict",
        "windows": w,
        "rows": rows,
        "cos_min": round(float(cos.min()), 6),
        "drift_max": round(float(drift), 6),
        "cos_min_pcm": round(float(cos_pcm.min()), 6),
        "flush_sec_bf16": round(t_bf16, 4),
        "flush_sec_int8": round(t_int8, 4),
        "flush_sec_pcm": round(t_pcm, 4),
        "wire_mb_bf16": round(feats.size * 2 / 1e6, 1),
        "wire_mb_int8": round(feats.size * 1 / 1e6, 1),
        "wire_mb_pcm_f32": round(pcm_all.size * 4 / 1e6, 1),
        "device": str(jax.devices()[0]),
        # wire-tier verdicts are only comparable at a known link speed
        # (VERDICT r3 item 6; the relay link swings ~2x intra-day)
        "link_probe": probe_link(),
    }))


if __name__ == "__main__":
    main()
