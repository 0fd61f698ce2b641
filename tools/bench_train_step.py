"""Pretrain step-time benchmark (BASELINE.md protocol #2).

Times one full contrastive train step (forward + backward + Muon update) on
the flagship model at a v7-like configuration: batch 8, 2048-token windows
with fused audio, 256 metadata variations, remat on, Pallas attention.

    python tools/bench_train_step.py [--batch-size 8] [--variations 256]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

V5E_BF16_PEAK = 197e12


def meta_tower_flops(variations: int, meta_len: int) -> float:
    """Useful fwd FLOPs for ONE window's metadata-variations encode.

    6 layers x hidden 256 / intermediate 512 (configs): per token
    2*(Wqkv 256x768 + Wo 256x256 + Wi 256x1024 + Wout 512x256); attention
    at L=24 is negligible but included (4*L*L*H per layer)."""
    dense = 2 * (256 * 768 + 256 * 256 + 256 * 1024 + 512 * 256)
    attn = 4 * meta_len * meta_len * 256
    return float(variations * 6 * (meta_len * dense + attn))


def audio_encoder_flops(mel_frames: int) -> float:
    """Whisper-style encoder: conv x2 (stride 2) then 6 layers x hidden 512
    over mel_frames/2 tokens, + the 4x projector."""
    tokens = mel_frames // 2
    dense = 2 * (512 * 1536 + 512 * 512 + 512 * 2048 + 1024 * 512)
    attn = 4 * tokens * tokens * 512
    convs = 2 * mel_frames * 80 * 512 * 3 + 2 * tokens * 512 * 512 * 3
    proj = 2 * (tokens // 4) * (4 * 512) * 768
    return float(convs + 6 * (tokens * dense + attn) + proj)


def train_mfu(fwd_flops: float, dt: float, remat: str) -> tuple[float, float]:
    """(train_flops, mfu): backward ~= 2x forward for matmul-dominated
    stacks; full remat re-runs the forward once more inside the backward."""
    mult = 4.0 if remat == "full" else 3.0
    total = mult * fwd_flops
    return total, total / dt / V5E_BF16_PEAK


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--seq-len", type=int, default=2048)
    parser.add_argument("--mel-frames", type=int, default=1600)
    parser.add_argument("--variations", type=int, default=256)
    parser.add_argument("--meta-len", type=int, default=24)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--optim", default="muon")
    parser.add_argument("--remat", default="full", choices=["full", "dots", "none"],
                        help="layer remat policy: full recompute, dots-saveable, or off")
    parser.add_argument("--packed", action="store_true", help="packed-window contrastive step (no audio)")
    parser.add_argument(
        "--max-windows", type=int, default=0,
        help="pad the packed window table to this size — the SHAPE the "
        "training collator actually compiles (training.packed_max_windows; "
        "dummy slots still run the metadata tower). 0 = legacy bench shape "
        "ceil16(w), which UNDERSTATES the shipped max_windows=64 cost.",
    )
    ns = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from cm3p_tpu.configs import CM3PConfig
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.train.muon import muon
    from cm3p_tpu.train.train_state import create_train_state, make_train_step

    cfg = CM3PConfig()

    if ns.packed:
        from bench import real_window_sequences
        from cm3p_tpu.processing.packing import pack_windows

        rngp = np.random.default_rng(0)
        b, v, ml = ns.batch_size, ns.variations, ns.meta_len
        seq_len = 4096
        seqs, vocab = real_window_sequences(b * 16)
        cfg.beatmap_config.vocab_size = vocab
        remat = {"full": True, "dots": "dots", "none": False}[ns.remat]
        model = CM3PModule(cfg, dtype=jnp.bfloat16, attn_impl="pallas", remat=remat)
        packed = pack_windows(seqs, seq_len, pad_id=0)
        while packed["input_ids"].shape[0] > b or (ns.max_windows and len(seqs) > ns.max_windows):
            seqs = seqs[: int(len(seqs) * 0.95)]
            packed = pack_windows(seqs, seq_len, pad_id=0)
        w = len(seqs)
        w_pad = ns.max_windows or -(-w // 16) * 16
        window_rows = np.zeros(w_pad, np.int32)
        window_segments = np.full(w_pad, -1, np.int32)
        window_valid = np.zeros(w_pad, np.int32)
        window_rows[:w] = packed["window_to_row"]
        window_segments[:w] = packed["window_segment"]
        window_valid[:w] = 1
        rows_ids = np.zeros((b, seq_len), np.int32)
        rows_segs = np.zeros((b, seq_len), np.int32)
        rows_ids[: packed["input_ids"].shape[0]] = packed["input_ids"]
        rows_segs[: packed["segment_ids"].shape[0]] = packed["segment_ids"]
        classes = np.full((w_pad, v), 1, np.int32)
        classes[:, 0] = 0
        batch = {
            "input_ids": jnp.asarray(rows_ids),
            "segment_ids": jnp.asarray(rows_segs),
            "window_rows": jnp.asarray(window_rows),
            "window_segments": jnp.asarray(window_segments),
            "window_valid": jnp.asarray(window_valid),
            "metadata_ids": jnp.asarray(rngp.integers(0, 900, (w_pad, v, ml)), jnp.int32),
            "metadata_attention_mask": jnp.ones((w_pad, v, ml), jnp.int32),
            "metadata_variation_classes": jnp.asarray(classes),
        }
        tx = muon(4e-4) if ns.optim == "muon" else optax.adamw(1e-4)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), batch, method=CM3PModule.forward_packed)
        step = jax.jit(make_train_step(model, tx, method=CM3PModule.forward_packed), donate_argnums=(0,))
        drng = jax.random.PRNGKey(1)
        state, metrics = step(state, batch, drng)
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(ns.iters):
            state, metrics = step(state, batch, drng)
            loss = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / ns.iters
        from bench import window_flops

        fwd = sum(window_flops(len(s)) for s in seqs) + w * meta_tower_flops(v, ml)
        total_flops, mfu = train_mfu(fwd, dt, ns.remat)
        print(
            json.dumps(
                {
                    "metric": "pretrain_step_time_packed",
                    "value": round(dt, 4),
                    "unit": "s/step",
                    "train_mfu": round(mfu, 4),
                    "detail": {
                        "windows_per_sec": round(w / dt, 2),
                        "rows": b,
                        "windows": w,
                        "window_table": int(w_pad),
                        "seq_len": seq_len,
                        "variations": v,
                        "loss": round(loss, 4),
                        "optim": ns.optim,
                        "remat": ns.remat,
                        "train_fused_rope": __import__("os").environ.get("CM3P_TRAIN_FUSED_ROPE", "0"),
                        "fwd_flops": round(fwd / 1e12, 3),
                        "flops_model": "bench.window_flops + meta_tower_flops; "
                        "bwd=2x fwd, +1 fwd if full remat",
                        "device": str(jax.devices()[0]),
                    },
                }
            )
        )
        return

    model = CM3PModule(cfg, dtype=jnp.bfloat16, attn_impl="pallas", remat=True)
    rng = np.random.default_rng(0)
    b, l, v, ml = ns.batch_size, ns.seq_len, ns.variations, ns.meta_len
    n_audio = ns.mel_frames // 8
    ids = rng.integers(5, 3000, (b, l))
    ids[:, 0] = cfg.beatmap_config.audio_sos_token_id
    ids[:, 1 : 1 + n_audio] = cfg.beatmap_config.audio_token_id
    classes = np.ones((b, v), np.int32)
    classes[:, 0] = 0
    batch = {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.ones((b, l), jnp.int32),
        "input_features": jnp.asarray(rng.standard_normal((b, 80, ns.mel_frames)), jnp.bfloat16),
        "metadata_ids": jnp.asarray(rng.integers(0, 900, (b, v, ml)), jnp.int32),
        "metadata_attention_mask": jnp.ones((b, v, ml), jnp.int32),
        "metadata_variation_classes": jnp.asarray(classes),
    }

    tx = muon(4e-4) if ns.optim == "muon" else optax.adamw(1e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))
    drng = jax.random.PRNGKey(1)

    state, metrics = step(state, batch, drng)
    float(metrics["loss"])  # sync
    t0 = time.perf_counter()
    for _ in range(ns.iters):
        state, metrics = step(state, batch, drng)
        loss = float(metrics["loss"])  # forces execution each iter
    dt = (time.perf_counter() - t0) / ns.iters

    from bench import window_flops

    fwd = b * (window_flops(l) + meta_tower_flops(v, ml) + audio_encoder_flops(ns.mel_frames))
    total_flops, mfu = train_mfu(fwd, dt, "full")
    print(
        json.dumps(
            {
                "metric": "pretrain_step_time",
                "value": round(dt, 4),
                "unit": "s/step",
                "train_mfu": round(mfu, 4),
                "detail": {
                    "samples_per_sec": round(b / dt, 2),
                    "tokens_per_sec": round(b * l / dt, 0),
                    "loss": round(loss, 4),
                    "batch_size": b,
                    "seq_len": l,
                    "variations": v,
                    "optim": ns.optim,
                    "fwd_flops": round(fwd / 1e12, 3),
                    "flops_model": "bench.window_flops + meta_tower_flops + "
                    "audio_encoder_flops; bwd=2x fwd, +1 fwd (full remat)",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
