"""Headline benchmark: beatmap-embedding extraction throughput per chip.

Measures the ``extract_beatmap_embeddings``-equivalent workload (BASELINE.md
protocol #1): full-size CM3P beatmap tower + audio encoder + projection,
bf16, Pallas local-attention kernels, one 16-second window -> one embedding.
Prints ONE JSON line for the driver.

``vs_baseline``: the reference publishes no benchmark numbers
(BASELINE.json: "published": {}); the denominator is our FLOPs-derived
estimate of the reference's single-GPU (A100, FA2, bf16) extraction rate —
~100 windows/s for the 22-layer/768-hidden tower at 4k tokens with the
6-layer audio encoder. Treat it as a stable yardstick, not a measurement.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np

REFERENCE_SINGLE_GPU_EST = 100.0  # windows/s, see module docstring


def build_batch(cfg, batch_size: int, seq_len: int, mel_frames: int):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    num_audio_tokens = mel_frames // 8
    ids = rng.integers(5, 3000, (batch_size, seq_len))
    ids[:, 0] = cfg.audio_sos_token_id
    ids[:, 1 : 1 + num_audio_tokens] = cfg.audio_token_id
    ids[:, 1 + num_audio_tokens] = cfg.audio_eos_token_id
    mask = np.ones((batch_size, seq_len), np.int32)
    mask[:, -seq_len // 8 :] = 0  # realistic padding tail
    return {
        "input_ids": jnp.asarray(ids, jnp.int32),
        "attention_mask": jnp.asarray(mask),
        "input_features": jnp.asarray(
            rng.standard_normal((batch_size, cfg.audio_config.n_mels, mel_frames)) * 0.5, jnp.bfloat16
        ),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true", help="tiny config on CPU for smoke testing")
    parser.add_argument("--batch-size", type=int, default=0, help="0 = auto-scan")
    parser.add_argument("--seq-len", type=int, default=4096)
    parser.add_argument("--mel-frames", type=int, default=1600)  # 16 s windows
    parser.add_argument("--iters", type=int, default=20)
    args = parser.parse_args()

    if args.tiny:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax
    import jax.numpy as jnp

    from cm3p_tpu.configs import BeatmapConfig, tiny_cm3p_config
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.configs import CM3PConfig

    if args.tiny:
        cfg = tiny_cm3p_config()
        cfg.beatmap_config.audio_token_id = 500
        cfg.beatmap_config.audio_sos_token_id = 498
        cfg.beatmap_config.audio_eos_token_id = 499
        args.seq_len = 256
        args.mel_frames = 64
        candidates = [2]
        args.iters = 3
    else:
        cfg = CM3PConfig()
        candidates = [args.batch_size] if args.batch_size else [16, 32, 64]

    model = CM3PModule(cfg, dtype=jnp.bfloat16, attn_impl="pallas")

    @jax.jit
    def extract(params, batch):
        return model.apply(
            params,
            method=CM3PModule.get_beatmap_features,
            input_ids=batch["input_ids"],
            input_features=batch["input_features"],
            attention_mask=batch["attention_mask"],
            normalize=True,
        )

    best_rate = 0.0
    best_bs = 0
    params = None
    for bs in candidates:
        batch = build_batch(cfg.beatmap_config, bs, args.seq_len, args.mel_frames)
        if params is None:
            params = model.init(
                jax.random.PRNGKey(0),
                input_ids=batch["input_ids"][:1],
                input_features=batch["input_features"][:1],
                attention_mask=batch["attention_mask"][:1],
                return_loss=False,
            )
        np.asarray(extract(params, batch))  # warmup/compile
        np.asarray(extract(params, batch))
        # force a host fetch every iteration: on the remote-relay backend
        # block_until_ready alone can return before execution completes
        t0 = time.perf_counter()
        for _ in range(args.iters):
            np.asarray(extract(params, batch))
        dt = (time.perf_counter() - t0) / args.iters
        rate = bs / dt
        if rate > best_rate:
            best_rate, best_bs = rate, bs

    print(
        json.dumps(
            {
                "metric": "beatmap_embeddings_per_sec_per_chip",
                "value": round(best_rate, 2),
                "unit": "embeddings/s/chip",
                "vs_baseline": round(best_rate / REFERENCE_SINGLE_GPU_EST, 3),
                "detail": {
                    "batch_size": best_bs,
                    "seq_len": args.seq_len,
                    "mel_frames": args.mel_frames,
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
