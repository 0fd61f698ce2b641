"""Block-size sweep for the Pallas attention kernels on real TPU.

The flash kernels' cost model (BASELINE.md, ROADMAP.md) says per-step
overhead and VPU work set the floor, so block shape is the cheapest lever:
wider key blocks cut grid steps for the packed-global kernel; narrower key
blocks cut visited keys for the windowed kernel (bq=256/bk=128 visits 512
keys per 256-row block vs 768 at 256/256).

Times N dependent calls inside one jit (the relay adds ~30 ms per host
fetch, so per-call timing is latency-dominated otherwise).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from cm3p_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from cm3p_tpu.ops.flash_attention import _flash_attention  # noqa: E402

import os
B, H, L, D = int(os.environ.get("BENCH_B", "16")), 12, 4096, 64
CHAIN = 8


def packed_segments(b: int, l: int, seg_len: int = 1300) -> np.ndarray:
    seg = np.zeros((b, l), np.int32)
    for r in range(b):
        pos, s = 0, 1
        while pos < l:
            n = min(seg_len, l - pos)
            seg[r, pos : pos + n] = s
            pos += n
            s += 1
    return seg


def timed(fn, args, iters=4):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:8])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(jax.tree.leaves(fn(*args))[0].ravel()[:8])
    return (time.perf_counter() - t0) / iters / CHAIN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["global", "local", "both"], default="both")
    ap.add_argument("--bwd", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.bfloat16)
    seg = jnp.asarray(packed_segments(B, L))

    def make_fn(window, bq, bk, with_seg, bwd):
        def one(q, k, v):
            s = seg if with_seg else jnp.ones((B, L), jnp.int32)
            return _flash_attention(q, k, v, s, s, window, bq, bk, H, None)

        if bwd:
            def loss(q, k, v):
                return jnp.sum(one(q, k, v).astype(jnp.float32) * 1e-3)

            g = jax.grad(loss, argnums=(0, 1, 2))

            @jax.jit
            def run(q, k, v):
                x = q
                for _ in range(CHAIN):
                    dq, dk, dv = g(x, k, v)
                    x = x + dq * 1e-6
                return x

            return run

        @jax.jit
        def run(q, k, v):
            x = q
            for _ in range(CHAIN):
                o = one(x, k, v)
                x = x + o * 1e-6
            return x

        return run

    combos_global = [(256, 256), (256, 512), (512, 512), (512, 256), (256, 1024)]
    combos_local = [(256, 256), (256, 128), (512, 128), (128, 128), (512, 256)]

    if args.mode in ("global", "both"):
        print(f"== global packed segments (B{B} H{H} L{L}) {'fwd+bwd' if args.bwd else 'fwd'}")
        for bq, bk in combos_global:
            try:
                t = timed(make_fn(None, bq, bk, True, args.bwd), (q, k, v))
                print(f"  bq={bq:4d} bk={bk:4d}: {t*1e3:7.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"  bq={bq:4d} bk={bk:4d}: FAIL {type(e).__name__}: {str(e)[:120]}")
    if args.mode in ("local", "both"):
        print(f"== local window=64 (B{B} H{H} L{L}) {'fwd+bwd' if args.bwd else 'fwd'}")
        for bq, bk in combos_local:
            try:
                t = timed(make_fn(64, bq, bk, True, args.bwd), (q, k, v))
                print(f"  bq={bq:4d} bk={bk:4d}: {t*1e3:7.2f} ms")
            except Exception as e:  # noqa: BLE001
                print(f"  bq={bq:4d} bk={bk:4d}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
