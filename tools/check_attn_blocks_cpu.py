"""Interpret-mode parity check for non-default attention block shapes (CPU).

Run before the TPU block sweep: verifies every (block_q, block_k) combo in
tools/bench_attn_blocks.py computes the same outputs/grads as the dense XLA
reference, including bk > bq and bk < bq (the public API clamps bk <= bq, so
these paths only see exercise here).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


import functools

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

import cm3p_tpu.ops.flash_attention as fa  # noqa: E402
import cm3p_tpu.ops.flash_attention_bwd as fab  # noqa: E402

pl_call = functools.partial(pl.pallas_call, interpret=True)
fa.pl.pallas_call = pl_call
fab.pl.pallas_call = pl_call

B, H, L, D = 2, 4, 1024, 64


def packed_segments(b, l, seg_len=300):
    seg = np.zeros((b, l), np.int32)
    for r in range(b):
        pos, s = 0, 1
        while pos < l:
            n = min(seg_len, l - pos)
            seg[r, pos : pos + n] = s
            pos += n
            s += 1
    return seg


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.float32)
    seg = jnp.asarray(packed_segments(B, L))

    for window, combos in [
        (None, [(256, 256), (256, 512), (512, 512), (512, 256), (256, 1024)]),
        (64, [(256, 256), (256, 128), (512, 128), (128, 128), (512, 256)]),
    ]:
        ref = fa._xla_reference(q, k, v, seg, seg, window, H)
        dref = jax.grad(
            lambda q_, k_, v_: jnp.sum(fa._xla_reference(q_, k_, v_, seg, seg, window, H) * 1e-2),
            argnums=(0, 1, 2),
        )(q, k, v)
        for bq, bk in combos:
            out = fa._flash_attention(q, k, v, seg, seg, window, bq, bk, H, None)
            err = float(jnp.max(jnp.abs(out - ref)))
            d = jax.grad(
                lambda q_, k_, v_: jnp.sum(fa._flash_attention(q_, k_, v_, seg, seg, window, bq, bk, H, None) * 1e-2),
                argnums=(0, 1, 2),
            )(q, k, v)
            derr = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(d, dref))
            status = "OK " if err < 2e-3 and derr < 2e-3 else "BAD"
            print(f"window={window} bq={bq:4d} bk={bk:4d}: fwd {err:.2e} bwd {derr:.2e} {status}")


if __name__ == "__main__":
    main()
