"""Decompose the packed pretrain step (BASELINE protocol #2) by ablation.

The extraction forward has a measured component budget (docs/ROADMAP.md
"speed-of-light accounting"); the TRAIN step does not — this tool produces
one. Each variant is a separately-jitted function over the same packed v8
batch; subtracting bracketing variants isolates a component:

    full            fwd + bwd + Muon update        (the shipped step)
    grad            fwd + bwd, no optimizer        full - grad = Muon
    fwd             loss value only                grad - fwd  = backward
    grad_bm         bwd through the beatmap tower only (metadata + loss DCE'd)
    grad_bm_noattn  grad_bm with the flash kernels stubbed to a
                    v-passthrough (drops attention AND its in-path rope);
                    grad_bm - grad_bm_noattn = attention + rope IN SITU
                    (derived: bm_attention_and_rope_in_situ)
    grad_meta       bwd through the metadata tower only
    grad_v64        full grad at 64 variations     variation-count scaling

Relay-safe timing: one host fetch per iteration (block_until_ready can
return early through the relay, CLAUDE.md).

    python tools/bench_train_decompose.py [--rows 8] [--variations 256]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_packed_batch(cfg, rows: int, seq_len: int, variations: int, meta_len: int):
    import jax.numpy as jnp

    from bench import real_window_sequences
    from cm3p_tpu.processing.packing import pack_windows

    rng = np.random.default_rng(0)
    seqs, vocab = real_window_sequences(rows * 16)
    cfg.beatmap_config.vocab_size = vocab
    packed = pack_windows(seqs, seq_len, pad_id=0)
    while packed["input_ids"].shape[0] > rows:
        seqs = seqs[: int(len(seqs) * 0.95)]
        packed = pack_windows(seqs, seq_len, pad_id=0)
    w = len(seqs)
    w_pad = -(-w // 16) * 16
    window_rows = np.zeros(w_pad, np.int32)
    window_segments = np.full(w_pad, -1, np.int32)
    window_valid = np.zeros(w_pad, np.int32)
    window_rows[:w] = packed["window_to_row"]
    window_segments[:w] = packed["window_segment"]
    window_valid[:w] = 1
    rows_ids = np.zeros((rows, seq_len), np.int32)
    rows_segs = np.zeros((rows, seq_len), np.int32)
    rows_ids[: packed["input_ids"].shape[0]] = packed["input_ids"]
    rows_segs[: packed["segment_ids"].shape[0]] = packed["segment_ids"]
    classes = np.full((w_pad, variations), 1, np.int32)
    classes[:, 0] = 0
    return {
        "input_ids": jnp.asarray(rows_ids),
        "segment_ids": jnp.asarray(rows_segs),
        "window_rows": jnp.asarray(window_rows),
        "window_segments": jnp.asarray(window_segments),
        "window_valid": jnp.asarray(window_valid),
        # bounded by the config's metadata vocab — OOB embedding ids are
        # silent NaN on TPU (CLAUDE.md) and tiny_cm3p_config has vocab 256
        "metadata_ids": jnp.asarray(
            rng.integers(0, cfg.metadata_config.vocab_size,
                         (w_pad, variations, meta_len)),
            jnp.int32,
        ),
        "metadata_attention_mask": jnp.ones((w_pad, variations, meta_len), jnp.int32),
        "metadata_variation_classes": jnp.asarray(classes),
    }, w


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--rows", type=int, default=8)
    parser.add_argument("--seq-len", type=int, default=4096)
    parser.add_argument("--variations", type=int, default=256)
    parser.add_argument("--meta-len", type=int, default=24)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--remat", default="none", choices=["full", "dots", "none"],
                        help="v8_packed ships remat: false")
    parser.add_argument("--meta-pack", type=int, default=0,
                        help="pack G metadata variations per encoder row (0 = off)")
    parser.add_argument("--tiny", action="store_true", help="tiny config on CPU (plumbing smoke)")
    ns = parser.parse_args(argv)

    if ns.tiny:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax
    import jax.numpy as jnp

    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from cm3p_tpu.configs import CM3PConfig, tiny_cm3p_config
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.train.muon import muon
    from cm3p_tpu.train.train_state import create_train_state, make_train_step

    if ns.tiny:
        cfg = tiny_cm3p_config()
        ns.rows, ns.seq_len, ns.variations, ns.meta_len, ns.iters = 2, 256, 4, 8, 1
    else:
        cfg = CM3PConfig()
    batch, w = build_packed_batch(cfg, ns.rows, ns.seq_len, ns.variations, ns.meta_len)
    remat = {"full": True, "dots": "dots", "none": False}[ns.remat]
    model = CM3PModule(
        cfg, dtype=jnp.bfloat16, attn_impl="pallas", remat=remat, meta_pack=ns.meta_pack
    )

    tx = muon(4e-4)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch, method=CM3PModule.forward_packed)
    params = state.params["params"]
    drng = jax.random.PRNGKey(1)

    def apply_packed(p, b, **over):
        kw = dict(b)
        kw.update(over)
        return model.apply(
            {"params": p}, **kw, deterministic=False, rngs={"dropout": drng},
            method=CM3PModule.forward_packed,
        )

    full_step = jax.jit(make_train_step(model, tx, method=CM3PModule.forward_packed))

    @jax.jit
    def fwd(p, b):
        return apply_packed(p, b).loss

    @jax.jit
    def grad(p, b):
        def loss_fn(q):
            return apply_packed(q, b).loss

        loss, grads = jax.value_and_grad(loss_fn)(p)
        import optax

        return loss, optax.global_norm(grads)

    @jax.jit
    def grad_bm(p, b):
        def loss_fn(q):
            out = apply_packed(
                q, b, metadata_ids=None, metadata_attention_mask=None,
                metadata_variation_classes=None, return_loss=False,
            )
            return out.beatmap_embeds.astype(jnp.float32).sum()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        import optax

        return loss, optax.global_norm(grads)

    @jax.jit
    def grad_meta(p, b):
        def loss_fn(q):
            feats = model.apply(
                {"params": q},
                metadata_ids=b["metadata_ids"],
                metadata_attention_mask=b["metadata_attention_mask"],
                deterministic=False, rngs={"dropout": drng},
                method=CM3PModule.get_metadata_features,
            )
            return feats.astype(jnp.float32).sum()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        import optax

        return loss, optax.global_norm(grads)

    batch_v64 = dict(batch)
    batch_v64["metadata_ids"] = batch["metadata_ids"][:, :64]
    batch_v64["metadata_attention_mask"] = batch["metadata_attention_mask"][:, :64]
    batch_v64["metadata_variation_classes"] = batch["metadata_variation_classes"][:, :64]

    def time_fn(fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + sync
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(ns.iters):
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / ns.iters

    results = {}
    results["fwd"] = time_fn(fwd, params, batch)
    print(f"fwd          {results['fwd']:.4f}s", flush=True)
    results["grad"] = time_fn(grad, params, batch)
    print(f"grad         {results['grad']:.4f}s", flush=True)
    results["grad_bm"] = time_fn(grad_bm, params, batch)
    print(f"grad_bm      {results['grad_bm']:.4f}s", flush=True)
    # grad_bm with attention stubbed to a v-passthrough: the dense
    # (embed/LN/QKV/Wo/GeGLU) share of the beatmap backward. The stub drops
    # the kernel AND its in-path rope, so grad_bm - grad_bm_noattn =
    # attention + rope in situ (the metadata ablation showed ISOLATED
    # attention chains mislead via layout thrash — subtract, don't isolate).
    from cm3p_tpu.ops import flash_attention as fa

    def _stub(q_, k_, v_, **kw):
        if kw.get("wo") is not None:
            return kw["out_residual"] + jnp.dot(
                v_.reshape(*v_.shape[:2], -1), kw["wo"].astype(v_.dtype)
            )
        return v_

    _real_flash = fa.flash_attention
    fa.flash_attention = _stub
    try:
        # fresh lambda, NOT jax.jit(grad_bm.__wrapped__): jit keys its trace
        # cache on function identity, so re-jitting the same function object
        # silently reuses the already-compiled REAL graph and the patch
        # never applies (measured: the broken form timed 0.4356 s == real,
        # the fresh trace times 0.2004 s)
        grad_bm_noattn = jax.jit(lambda p, b: grad_bm.__wrapped__(p, b))
        results["grad_bm_noattn"] = time_fn(grad_bm_noattn, params, batch)
    finally:
        fa.flash_attention = _real_flash
    print(f"grad_bm_noat {results['grad_bm_noattn']:.4f}s", flush=True)
    results["grad_meta"] = time_fn(grad_meta, params, batch)
    print(f"grad_meta    {results['grad_meta']:.4f}s", flush=True)
    results["grad_v64"] = time_fn(grad, params, batch_v64)
    print(f"grad_v64     {results['grad_v64']:.4f}s", flush=True)
    # full last: donation-free variant so `state` stays reusable
    results["full"] = time_fn(lambda s, b, r: full_step(s, b, r)[1]["loss"], state, batch, drng)
    print(f"full         {results['full']:.4f}s", flush=True)

    derived = {
        "muon_update": round(results["full"] - results["grad"], 4),
        "backward": round(results["grad"] - results["fwd"], 4),
        "loss_and_interaction": round(
            results["grad"] - results["grad_bm"] - results["grad_meta"], 4
        ),
        "variation_scaling_v256_vs_v64": round(results["grad"] - results["grad_v64"], 4),
        "bm_attention_and_rope_in_situ": round(
            results["grad_bm"] - results["grad_bm_noattn"], 4
        ),
    }
    print(
        json.dumps(
            {
                "metric": "pretrain_step_decomposition",
                "unit": "s",
                "components": {k: round(v, 4) for k, v in results.items()},
                "derived": derived,
                "detail": {
                    "rows": ns.rows,
                    "windows": w,
                    "seq_len": ns.seq_len,
                    "variations": ns.variations,
                    "remat": ns.remat,
                    "meta_pack": ns.meta_pack,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
