"""What MXU efficiency can XLA reach per matmul shape on this v5e?

The dense (non-attention) stack runs at ~55% MXU (bare-matmul measured,
tools/bench_int8.py). If bigger K/N reach much higher, a custom GEMM or
shape rework could pay; if everything sits ~55-60%, that's the toolchain
ceiling and the stack is already at it.
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

CHAIN = 32


def main():
    rng = np.random.default_rng(0)
    for M, K, N in [
        (262144, 768, 768),
        (262144, 768, 2304),
        (262144, 1152, 768),
        (262144, 1024, 1024),
        (262144, 2048, 2048),
        (65536, 4096, 4096),
        (8192, 8192, 8192),
    ]:
        a = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((K, N)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((N, K)) * 0.05, jnp.bfloat16)

        @jax.jit
        def chain(a, w1, w2):
            def body(i, x):
                y = jnp.dot(x, w1)
                return jnp.dot(y, w2) * 0.01

            return jax.lax.fori_loop(0, CHAIN // 2, body, a)

        np.asarray(chain(a, w1, w2)[0, :8])
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(chain(a, w1, w2)[0, :8])
        t = (time.perf_counter() - t0) / 3
        t = (t - 0.033) / CHAIN  # relay fetch ~33 ms
        fl = 2 * M * K * N
        print(f"M={M:7d} K={K:5d} N={N:5d}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF ({fl/t/1.97e14*100:4.1f}% MXU)")


if __name__ == "__main__":
    main()
