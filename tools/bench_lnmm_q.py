"""A/B the W8A8 LN->int8 matmul kernel vs the bf16 LNMM kernel on real TPU.

Production QKV shape: rows = 128 packed rows x 4096 = 524288 tokens,
d=768 -> n=2304. Prints per-variant ms (host-fetch timed, chained matmuls
inside one jit to amortize the ~33 ms relay fetch) and the int8 path's
cosine vs the f32 reference.

Usage: python tools/bench_lnmm_q.py [--rows 524288] [--iters 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=524288)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--d", type=int, default=768)
    ap.add_argument("--n", type=int, default=2304)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cm3p_tpu.ops.fused_ln_matmul import (
        _pallas_ln_matmul,
        _pallas_ln_matmul_q,
        quantize_weight_int8,
        reference_ln_matmul,
    )
    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    R, D, N = args.rows, args.d, args.n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, D)).astype(np.float32) * 0.7, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, D).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((D, N)).astype(np.float32) * 0.02)

    flops = 2.0 * R * D * N

    def chain(fn, k):
        # feed a slice of the output back into x's first D columns so the
        # k invocations are data-dependent (relay can't reorder/elide)
        def body(x):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                out = fn(x)
                acc = acc + jnp.sum(out[:1, :1].astype(jnp.float32))
                x = x + out[:, :D].astype(x.dtype) * 1e-6
            return acc

        return jax.jit(body)

    variants = {
        "xla bf16": lambda x: reference_ln_matmul(x, scale, None, w, None, eps=1e-5, with_ln=True),
        "pallas bf16": lambda x: _pallas_ln_matmul(x, scale, None, w, None, eps=1e-5, with_ln=True),
    }
    wq, sw = quantize_weight_int8(w)
    variants["pallas w8a8"] = lambda x: _pallas_ln_matmul_q(
        x, scale, None, wq, sw, eps=1e-5, with_ln=True
    )

    K = args.iters
    for name, fn in variants.items():
        f = chain(fn, K)
        _ = float(np.asarray(f(x)))  # compile + warm
        t0 = time.perf_counter()
        _ = float(np.asarray(f(x)))
        dt = (time.perf_counter() - t0) / K
        print(f"{name:14s} {dt*1e3:8.2f} ms  {flops/dt/1e12:7.1f} TF/s", flush=True)

    # FFN kernel A/B at the beatmap-tower shape (d=768, f=1152)
    from cm3p_tpu.ops.fused_ffn import _pallas_ln_ffn

    f_ff = 1152
    wi = jnp.asarray(rng.standard_normal((D, 2 * f_ff)).astype(np.float32) * 0.02)
    wo = jnp.asarray(rng.standard_normal((f_ff, D)).astype(np.float32) * 0.02)
    bias = jnp.zeros((D,), jnp.float32)
    ffn_flops = 2.0 * R * D * 2 * f_ff + 2.0 * R * f_ff * D
    for name, w8, w8wo in (
        ("ffn bf16", False, False),
        ("ffn w8a8", True, False),
        ("ffn w8a8+wo", True, True),
    ):
        def ffn(x, _w8=w8, _w8wo=w8wo):
            return _pallas_ln_ffn(
                x, scale, bias, wi, wo, eps=1e-5, residual=True, block_rows=512,
                w8a8=_w8, w8a8_wo=_w8wo,
            )

        fc = chain(ffn, K)
        _ = float(np.asarray(fc(x)))
        t0 = time.perf_counter()
        _ = float(np.asarray(fc(x)))
        dt = (time.perf_counter() - t0) / K
        print(f"{name:14s} {dt*1e3:8.2f} ms  {ffn_flops/dt/1e12:7.1f} TF/s", flush=True)

    # accuracy: int8 vs f32 exact on a 8k-row slice
    xs = x[:8192]
    exact = np.asarray(
        reference_ln_matmul(xs.astype(jnp.float32), scale, None, w, None, eps=1e-5, with_ln=True),
        np.float32,
    )
    q8 = np.asarray(
        _pallas_ln_matmul_q(xs, scale, None, wq, sw, eps=1e-5, with_ln=True), np.float32
    )
    b16 = np.asarray(
        _pallas_ln_matmul(xs, scale, None, w, None, eps=1e-5, with_ln=True), np.float32
    )
    for nm, got in (("w8a8", q8), ("bf16", b16)):
        cos = float(np.sum(got * exact) / (np.linalg.norm(got) * np.linalg.norm(exact)))
        rmse = float(np.sqrt(np.mean((got - exact) ** 2)) / np.sqrt(np.mean(exact**2)))
        print(f"{nm} vs f32: cosine={cos:.6f} rel_rmse={rmse:.5f}", flush=True)


if __name__ == "__main__":
    main()
