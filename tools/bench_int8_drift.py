"""End-to-end embedding drift of the int8 extraction gates vs the bf16 path.

The kernel-level W8A8 tests bound per-layer quantization error
(tests/test_fused_ln_matmul.py::TestW8A8); this tool answers the question
that actually gates flipping the defaults: after 22 encoder layers +
projection + L2-normalization, how far do the PACKED-WORKLOAD embeddings
drift from the bf16 path? BASELINE.md's parity budget is cosine drift
< 1e-3 vs the reference — the int8 gates must spend well under that to be
eligible as extraction defaults.

Runs the exact bench.py packed workload (real windows of the bundled
beatmap, first-fit packed) once per gate combination and prints per-window
cosine stats vs the all-bf16 run. TPU-intended (the int8 kernels are the
production path there); works on CPU via --tiny for plumbing smoke.

Caveat: params are random-init (no trained checkpoint ships in this image —
zero egress). Random init gives near-Gaussian activations, a reasonable
but not conservative proxy for trained-weight quantization error; re-run
against a converted reference checkpoint before shipping int8 as a default
for trained models.

Usage:  python tools/bench_int8_drift.py [--rows 128] [--tiny]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [
    # (name, {module attr -> value}). The int8 QKV kernel only runs when the
    # attention pre-LN is handed to SelfAttention (FUSED_LNMM_QKV), and the
    # int8 attn-Wo only when the residual is (FUSED_LNMM_WO / FUSED_WO) — the
    # LNMM master default is OFF since the -30% headline A/B, so each arm
    # must force the sub-gates its int8 path rides on.
    ("w8a8", {"W8A8": True, "FUSED_LNMM_QKV": True}),
    ("w8a8_wo", {"W8A8": True, "W8A8_WO": True,
                 "FUSED_LNMM_QKV": True, "FUSED_LNMM_WO": True}),
    ("wo_q", {"FUSED_WO": True, "FUSED_WO_Q": True}),
    ("all_int8", {"W8A8": True, "W8A8_WO": True, "FUSED_WO": True,
                  "FUSED_WO_Q": True, "FUSED_LNMM_QKV": True}),
]


def set_gates(flags: dict) -> None:
    from cm3p_tpu.ops import flash_attention as fa
    from cm3p_tpu.ops import fused_ffn as ffn
    from cm3p_tpu.ops import fused_ln_matmul as lnmm

    lnmm.W8A8_ENABLED = flags.get("W8A8", False)
    lnmm.FUSED_LNMM_QKV_ENABLED = flags.get("FUSED_LNMM_QKV", False)
    lnmm.FUSED_LNMM_WO_ENABLED = flags.get("FUSED_LNMM_WO", False)
    lnmm.FUSED_LNMM_ENABLED = (
        lnmm.FUSED_LNMM_QKV_ENABLED or lnmm.FUSED_LNMM_WO_ENABLED
    )
    ffn.W8A8_WO_ENABLED = flags.get("W8A8_WO", False)
    fa.FUSED_WO_ENABLED = flags.get("FUSED_WO", False)
    fa.FUSED_WO_Q = flags.get("FUSED_WO_Q", False)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=128)
    parser.add_argument("--seq-len", type=int, default=4096)
    parser.add_argument("--tiny", action="store_true", help="tiny config on CPU (plumbing smoke)")
    args = parser.parse_args()

    if args.tiny:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax
    import jax.numpy as jnp

    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench import real_window_sequences
    from cm3p_tpu.configs import CM3PConfig, tiny_cm3p_config
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.processing.packing import pack_windows
    from cm3p_tpu.utils.platform import resolve_attn_impl

    if args.tiny:
        cfg = tiny_cm3p_config()
        args.rows, args.seq_len = 4, 256
    else:
        cfg = CM3PConfig()
    from cm3p_tpu.tokenize import BeatmapTokenizer

    cfg.beatmap_config.vocab_size = BeatmapTokenizer().vocab_size

    model = CM3PModule(cfg, dtype=jnp.bfloat16, attn_impl=resolve_attn_impl("pallas"))

    seqs, _ = real_window_sequences(args.rows * 16)
    packed = pack_windows(seqs, args.seq_len, pad_id=0)
    while packed["input_ids"].shape[0] > args.rows:
        seqs = seqs[: int(len(seqs) * 0.95)]
        packed = pack_windows(seqs, args.seq_len, pad_id=0)
    batch = {
        "input_ids": jnp.asarray(packed["input_ids"], jnp.int32),
        "segment_ids": jnp.asarray(packed["segment_ids"], jnp.int32),
        "window_rows": jnp.asarray(packed["window_to_row"], jnp.int32),
        "window_segments": jnp.asarray(packed["window_segment"], jnp.int32),
    }

    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=batch["input_ids"][:1, :256],
        attention_mask=jnp.ones((1, 256), jnp.int32),
        return_loss=False,
    )

    def run() -> np.ndarray:
        # fresh jit per gate configuration: the gates are trace-time globals
        fn = jax.jit(
            lambda p, b: model.apply(
                p,
                method=CM3PModule.get_packed_beatmap_features,
                input_ids=b["input_ids"],
                segment_ids=b["segment_ids"],
                window_rows=b["window_rows"],
                window_segments=b["window_segments"],
                normalize=True,
            )
        )
        return np.asarray(fn(params, batch), np.float64)

    set_gates({})
    base = run()
    results = {}
    for name, flags in CONFIGS:
        set_gates(flags)
        emb = run()
        cos = (base * emb).sum(axis=-1) / (
            np.linalg.norm(base, axis=-1) * np.linalg.norm(emb, axis=-1)
        )
        results[name] = {
            "cos_min": round(float(cos.min()), 6),
            "cos_mean": round(float(cos.mean()), 6),
            "drift_max": round(float(1.0 - cos.min()), 6),
            "within_1e-3": bool((1.0 - cos.min()) < 1e-3),
        }
        print(f"{name:10s} cos_min={cos.min():.6f} cos_mean={cos.mean():.6f}", flush=True)
    set_gates({})
    print(json.dumps({"windows": len(seqs), "drift": results}))


if __name__ == "__main__":
    main()
