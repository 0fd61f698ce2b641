"""Variant of bench_decompose: ablates rope and q-scale instead of kernels.

Monkeypatches cm3p_tpu.ops.flash_attention.flash_attention with identity
variants to attribute time to local layers, global layers, and the rest of
the stack. SelfAttention imports the symbol per-call, so patching the module
attribute reroutes everything.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3p_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import cm3p_tpu.ops.flash_attention as fa_mod  # noqa: E402
from cm3p_tpu.configs import CM3PConfig  # noqa: E402
from cm3p_tpu.models import CM3PModule  # noqa: E402
from cm3p_tpu.processing.packing import pack_windows  # noqa: E402

import bench  # noqa: E402  (repo-root bench.py: real_window_sequences)

ROWS = 64
SEQ = 4096
REAL_FA = fa_mod.flash_attention


def make_variant(skip_local: bool, skip_global: bool):
    def fa(q, k, v, bias=None, key_mask=None, window=None, segment_ids=None, **kw):
        if window is not None and skip_local:
            return v
        if window is None and skip_global:
            return v
        return REAL_FA(q, k, v, bias=bias, key_mask=key_mask, window=window,
                       segment_ids=segment_ids, **kw)

    return fa


def main():
    cfg = CM3PConfig()
    from cm3p_tpu.tokenize import BeatmapTokenizer

    cfg.beatmap_config.vocab_size = BeatmapTokenizer().vocab_size
    model = CM3PModule(cfg, dtype=jnp.bfloat16, attn_impl="pallas")

    seqs, _ = bench.real_window_sequences(ROWS * 16)
    packed = pack_windows(seqs, SEQ, pad_id=0)
    while packed["input_ids"].shape[0] > ROWS:
        seqs = seqs[: int(len(seqs) * 0.95)]
        packed = pack_windows(seqs, SEQ, pad_id=0)
    batch = {
        "input_ids": jnp.asarray(packed["input_ids"], jnp.int32),
        "segment_ids": jnp.asarray(packed["segment_ids"], jnp.int32),
        "window_rows": jnp.asarray(packed["window_to_row"], jnp.int32),
        "window_segments": jnp.asarray(packed["window_segment"], jnp.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=batch["input_ids"][:1],
        return_loss=False,
    )

    def timed(tag):
        @jax.jit
        def run(params, batch):
            return model.apply(
                params,
                method=CM3PModule.get_packed_beatmap_features,
                input_ids=batch["input_ids"],
                segment_ids=batch["segment_ids"],
                window_rows=batch["window_rows"],
                window_segments=batch["window_segments"],
                normalize=True,
            )

        np.asarray(run(params, batch))
        np.asarray(run(params, batch))
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            np.asarray(run(params, batch))
        dt = (time.perf_counter() - t0) / iters
        print(f"{tag:24s}: {dt*1e3:8.1f} ms")
        return dt

    import cm3p_tpu.models.modernbert as mb

    t_full = timed("full forward")
    real_rope = mb.apply_rope
    mb.apply_rope = lambda q, k, cos, sin: (q, k)
    t_nr = timed("rope stubbed")
    mb.apply_rope = real_rope
    print(f"rope cost : {1e3*(t_full-t_nr):8.1f} ms")


if __name__ == "__main__":
    main()
