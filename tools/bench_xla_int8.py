"""Micro A/B: XLA-lowered int8 matmul vs bf16 at the production shapes.

Answers (on real v5e, before the end-to-end arm runs): does XLA lower
int8 x int8 -> int32 `lax.dot_general` to the MXU's 2x int8 rate at our
shapes, and does the quant/dequant elementwise chain fuse — WITHOUT a
Pallas boundary (the thing that sank the lnmm int8 arms, BASELINE.md
round-2c)? Shapes: the four dense projections of the beatmap tower at the
B123-packed row count (ops/xla_int8.py covers QKV + attn Wo; the FFN pair
is in-kernel via ops/fused_ffn.py gates).

Timing: one host fetch per iteration (`np.asarray`) — block_until_ready
can return before execution through the relay (CLAUDE.md).

    python tools/bench_xla_int8.py [--rows 32768] [--iters 8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32768)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from cm3p_tpu.ops.xla_int8 import int8_dot
    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    R = args.rows
    shapes = [  # (tag, D, N) — beatmap-tower projections
        ("qkv 768->2304", 768, 2304),
        ("attn_wo 768->768", 768, 768),
        ("ffn_wi 768->2304", 768, 2304),
        ("ffn_wo 1152->768", 1152, 768),
    ]

    def bench(fn, x, w):
        out = fn(x, w)  # compile + warm
        _ = np.asarray(out[0, :8], np.float32)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(x, w)
            _ = np.asarray(out[0, :8], np.float32)
        return (time.perf_counter() - t0) / args.iters

    results = {}
    rng = np.random.default_rng(0)
    for tag, d, n in shapes:
        x = jnp.asarray(rng.normal(size=(R, d)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(d, n)) * 0.02, jnp.float32)

        bf16 = jax.jit(lambda x_, w_: jnp.dot(x_, w_.astype(x_.dtype)))
        i8 = jax.jit(int8_dot)

        t_bf16 = bench(bf16, x, w)
        t_i8 = bench(i8, x, w)
        flops = 2.0 * R * d * n
        results[tag] = {
            "bf16_ms": round(t_bf16 * 1e3, 3),
            "int8_ms": round(t_i8 * 1e3, 3),
            "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
            "int8_tflops": round(flops / t_i8 / 1e12, 1),
            "speedup": round(t_bf16 / t_i8, 3),
        }
        print(f"{tag:20s} bf16 {t_bf16*1e3:8.3f} ms ({results[tag]['bf16_tflops']:6.1f} TF/s)"
              f"  int8 {t_i8*1e3:8.3f} ms ({results[tag]['int8_tflops']:6.1f} TF/s)"
              f"  x{results[tag]['speedup']}")

    print(json.dumps({
        "metric": "xla_int8_micro",
        "rows": R,
        "device": jax.devices()[0].device_kind,
        "results": results,
    }))


if __name__ == "__main__":
    main()
