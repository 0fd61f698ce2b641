"""Fused LN+GeGLU FFN kernel microbench: block_rows sweep + fp32 viability.

Chains 22 dependent kernel calls inside one jit (relay host fetches cost
~33 ms, ROADMAP measurement note) and times with a host fetch.

    python tools/bench_ffn_kernel.py [--rows 503808]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=123 * 4096)
    ap.add_argument("--layers", type=int, default=22)
    ap.add_argument("--iters", type=int, default=5)
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from cm3p_tpu.ops.fused_ffn import _pallas_ln_ffn, reference_ln_ffn
    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    d, f = 768, 1152
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((ns.rows, d)).astype(np.float32) * 0.5, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, d).astype(np.float32))
    bias = jnp.zeros((d,), jnp.float32)
    wi = jnp.asarray(rng.standard_normal((d, 2 * f)).astype(np.float32) * 0.02)
    wo = jnp.asarray(rng.standard_normal((f, d)).astype(np.float32) * 0.02)

    def chain(fn):
        def run(x):
            for _ in range(ns.layers):
                x = fn(x)
            return x

        return jax.jit(run)

    results = {}
    for block_rows in (128, 256, 512, 1024):
        try:
            fn = chain(lambda x: _pallas_ln_ffn(
                x, scale, bias, wi, wo, eps=1e-5, residual=True, block_rows=block_rows))
            out = fn(x); np.asarray(out[0])
            t0 = time.perf_counter()
            for _ in range(ns.iters):
                out = fn(x)
            np.asarray(out[0])
            dt = (time.perf_counter() - t0) / ns.iters
            results[f"pallas_b{block_rows}"] = round(dt / ns.layers * 1000, 3)
        except Exception as e:  # noqa: BLE001
            results[f"pallas_b{block_rows}"] = f"FAIL {type(e).__name__}"
        print(f"block_rows={block_rows}: {results[f'pallas_b{block_rows}']}", flush=True)

    # XLA composition baseline
    fn = chain(lambda x: reference_ln_ffn(x, scale, bias, wi, wo, eps=1e-5))
    out = fn(x); np.asarray(out[0])
    t0 = time.perf_counter()
    for _ in range(ns.iters):
        out = fn(x)
    np.asarray(out[0])
    results["xla"] = round((time.perf_counter() - t0) / ns.iters / ns.layers * 1000, 3)
    print("xla:", results["xla"], flush=True)

    # fp32 viability at the beatmap shape (crashed at block_rows=256)
    x32 = x.astype(jnp.float32)
    for block_rows in (64, 128):
        try:
            fn = chain(lambda x, _br=block_rows: _pallas_ln_ffn(
                x, scale, bias, wi, wo, eps=1e-5, residual=True, block_rows=_br))
            out = fn(x32); np.asarray(out[0])
            results[f"fp32_b{block_rows}"] = "OK"
        except Exception as e:  # noqa: BLE001
            results[f"fp32_b{block_rows}"] = f"FAIL {type(e).__name__}"
        print(f"fp32 block_rows={block_rows}: {results[f'fp32_b{block_rows}']}", flush=True)

    print(json.dumps({"metric": "ffn_kernel_ms_per_layer", "value": results, "unit": "ms",
                      "detail": {"rows": ns.rows, "layers": ns.layers}}))


if __name__ == "__main__":
    main()
