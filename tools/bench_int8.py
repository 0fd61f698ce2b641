"""Microbenchmark: int8 vs bf16 matmul throughput on the real TPU.

Validates the premise for a quantized extraction path: v5e's MXU lists int8
at 2x bf16 peak (394 vs 197 T*/s). The relay adds ~30 ms per host fetch, so
each measurement chains ``CHAIN`` dependent matmuls inside one jit and
fetches once; per-matmul time = (t_loop - t_empty) / CHAIN.
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

CHAIN = 64


def timeit(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(out[0, :8])
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(fn(*args)[0, :8])
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    M = 64 * 4096  # B64 x L4096 tokens
    K = 768
    a = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, K)) * 0.05, jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 128, (K, K)), jnp.int8)
    wscale = jnp.full((K,), 0.05 / 127.0, jnp.float32)

    @jax.jit
    def empty(a):
        return a * 1.0001

    @jax.jit
    def bf16_chain(a, w):
        def body(i, x):
            y = jnp.dot(x, w)
            return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-6))

        return jax.lax.fori_loop(0, CHAIN, body, a)

    @jax.jit
    def dynq_chain(a, w8, wscale):
        def body(i, x):
            amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
            ascale = jnp.maximum(amax, 1e-6) / 127.0
            x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / ascale), -127, 127).astype(jnp.int8)
            acc = jax.lax.dot_general(
                x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            y = (acc.astype(jnp.float32) * ascale * wscale[None, :]).astype(jnp.bfloat16)
            return y * (1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1e-6))

        return jax.lax.fori_loop(0, CHAIN, body, a)

    @jax.jit
    def int8_chain(a, w8):
        # pure int8 dot, reusing the int8 result as next input (no quant cost)
        def body(i, x8):
            acc = jax.lax.dot_general(
                x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            return jnp.clip(acc >> 8, -127, 127).astype(jnp.int8)

        return jax.lax.fori_loop(0, CHAIN, body, jnp.clip(a * 100, -127, 127).astype(jnp.int8))

    t_e = timeit(empty, a)
    t_bf = (timeit(bf16_chain, a, w) - t_e) / CHAIN
    t_i8 = (timeit(int8_chain, a, w8) - t_e) / CHAIN
    t_dq = (timeit(dynq_chain, a, w8, wscale) - t_e) / CHAIN
    flops = 2 * M * K * K
    print(f"backend={jax.default_backend()} M={M} K=N={K} overhead={t_e*1e3:.1f} ms")
    print(
        f"bf16 {t_bf*1e3:6.2f} ms ({flops/t_bf/1e12:5.1f} T) | "
        f"int8 {t_i8*1e3:6.2f} ms ({flops/t_i8/1e12:5.1f} T) | "
        f"dynq {t_dq*1e3:6.2f} ms ({flops/t_dq/1e12:5.1f} T) | "
        f"dynq speedup {t_bf/t_dq:4.2f}x"
    )


if __name__ == "__main__":
    main()
