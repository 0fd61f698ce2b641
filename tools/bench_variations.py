"""Prove the test-time 1000-variation eval shape on the real chip.

The reference evaluates with 1000 metadata variations per sample
(``/root/reference/configs/train/default.yaml:147``); our config carries the
same value (configs/train/default.yaml) but round 1 never compiled that
shape (VERDICT r1 missing #6). This runs the FULL dual-tower forward at the
full-size config with metadata_ids (B, 1000, L) — the metadata tower
flattens to (B*1000, L) — plus the 3-D contrastive logits and the zero-shot
ranking metric, and prints one timing line for BASELINE.md.

Usage: python tools/bench_variations.py [--batch 8] [--variations 1000]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--variations", type=int, default=1000)
    ap.add_argument("--seq-len", type=int, default=4096)
    ap.add_argument("--meta-len", type=int, default=24)
    ap.add_argument("--meta-pack", type=int, default=0,
                    help="pack G metadata variations per encoder row (0 = off)")
    ap.add_argument("--tiny", action="store_true")
    ns = ap.parse_args()

    if ns.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from cm3p_tpu.utils.cache import enable_compilation_cache

    if not ns.tiny:
        enable_compilation_cache()

    from cm3p_tpu.configs import CM3PConfig, tiny_cm3p_config
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.train.metrics import MetricAccumulator

    if ns.tiny:
        cfg = tiny_cm3p_config()
        ns.batch, ns.variations, ns.seq_len = 2, 16, 256
    else:
        cfg = CM3PConfig()

    model = CM3PModule(cfg, dtype=jnp.bfloat16, attn_impl="pallas", meta_pack=ns.meta_pack)
    rng = np.random.default_rng(0)
    B, V, L, ML = ns.batch, ns.variations, ns.seq_len, ns.meta_len
    classes = np.zeros((B, V), np.int32)
    classes[:, 1:] = rng.integers(1, 5, (B, V - 1))
    classes[:, -V // 8:] = -1  # padding variations, like the generator emits
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, cfg.beatmap_config.vocab_size - 10, (B, L)), jnp.int32),
        "attention_mask": jnp.ones((B, L), jnp.int32),
        "metadata_ids": jnp.asarray(rng.integers(0, cfg.metadata_config.vocab_size, (B, V, ML)), jnp.int32),
        "metadata_attention_mask": jnp.ones((B, V, ML), jnp.int32),
        "metadata_variation_classes": jnp.asarray(classes),
    }

    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=batch["input_ids"][:1],
        metadata_ids=batch["metadata_ids"][:1, :2],
        return_loss=False,
    )

    @jax.jit
    def eval_forward(params, batch):
        out = model.apply(params, **batch, return_loss=True, deterministic=True)
        return out.loss, out.logits_per_beatmap

    t0 = time.perf_counter()
    loss, logits = eval_forward(params, batch)
    logits_np = np.asarray(logits, np.float32)
    compile_and_run = time.perf_counter() - t0

    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        loss, logits = eval_forward(params, batch)
        logits_np = np.asarray(logits, np.float32)
    dt = (time.perf_counter() - t0) / iters

    acc = MetricAccumulator()
    acc.update_zero_shot(logits_np, np.asarray(batch["metadata_variation_classes"]))
    metrics = {k: v for k, v in acc.result().items() if v is not None}

    hbm = "n/a"
    try:
        stats = jax.devices()[0].memory_stats()
        hbm = f"{stats['peak_bytes_in_use'] / 2**30:.2f} GiB"
    except Exception:
        pass
    print(
        f"variations-eval OK: B={B} V={V} L={L} logits={logits_np.shape} "
        f"loss={float(loss):.4f} step={dt:.3f}s (first={compile_and_run:.1f}s) "
        f"peak_hbm={hbm} metrics={sorted(metrics)} backend={jax.default_backend()}"
    )


if __name__ == "__main__":
    main()
