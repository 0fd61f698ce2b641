"""Standalone repro of the 'global seg WO fp32 rope' smoke failure.

The combination segment_ids + window=None + fp32 + rope_theta + wo/out_residual
fails remote compile deterministically (3 attempts across 2 runs, HTTP 500
helper crash) at L=4096, while every 3-way subset of the combination passes.
At this length ``wo_fusable`` declines and the program is just the plain
seg-unrolled kernel (which passes alone) + an XLA dot + add — so the crash is
in whole-program compilation, not the Pallas kernel.

Prints the FULL exception (the relay appends its stderr diagnostic — scoped
vmem, AOT PJRT error, etc. — which the smoke tool truncates to 100 chars),
then bisects: no-residual, bf16-dot epilogue, separate jits.
"""
from __future__ import annotations

import os
import sys
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cm3p_tpu.ops.flash_attention import _flash_attention, flash_attention
    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    B, L, H, D = 2, 4096, 12, 64
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, L, H, D)).astype(np.float32) * 0.3)
        for _ in range(3)
    )
    seg_np = np.zeros((B, L), np.int32)
    pos, s = 0, 1
    while pos < L - 50:
        ln = int(rng.integers(150, 400))
        seg_np[:, pos : pos + ln] = s
        pos += ln
        s += 1
    seg = jnp.asarray(seg_np)
    wo = jnp.asarray(rng.standard_normal((H * D, H * D)).astype(np.float32) * 0.05)
    res = jnp.asarray(rng.standard_normal((B, L, H * D)).astype(np.float32))

    def attempt(tag, fn):
        try:
            out = fn()
            val = float(np.asarray(jnp.sum(jnp.abs(out.astype(jnp.float32)))))
            print(f"[{tag}] PASS finite={np.isfinite(val)}", flush=True)
        except Exception:
            print(f"[{tag}] FAIL — full traceback:", flush=True)
            traceback.print_exc()
            print(f"[{tag}] end traceback", flush=True)

    # 1. the exact failing composition
    attempt("exact", lambda: jax.jit(
        lambda q, k, v, seg, wo, res: flash_attention(
            q, k, v, segment_ids=seg, window=None, rope_theta=10000.0,
            wo=wo, out_residual=res,
        )
    )(q, k, v, seg, wo, res))

    # 2. same program without the residual add
    attempt("no-res-add", lambda: jax.jit(
        lambda q, k, v, seg, wo: jnp.dot(
            _flash_attention(
                q.reshape(B, L, H * D), k.reshape(B, L, H * D),
                v.reshape(B, L, H * D), seg, seg, None, 256, 256, H, 10000.0,
            ),
            wo,
        )
    )(q, k, v, seg, wo))

    # 3. kernel alone (passes in the smoke; confirms cache/repro parity)
    attempt("kernel-only", lambda: jax.jit(
        lambda q, k, v, seg: _flash_attention(
            q.reshape(B, L, H * D), k.reshape(B, L, H * D),
            v.reshape(B, L, H * D), seg, seg, None, 256, 256, H, 10000.0,
        )
    )(q, k, v, seg))

    # 4. bf16 dot epilogue on the fp32 kernel output
    attempt("bf16-dot", lambda: jax.jit(
        lambda q, k, v, seg, wo, res: res + jnp.dot(
            _flash_attention(
                q.reshape(B, L, H * D), k.reshape(B, L, H * D),
                v.reshape(B, L, H * D), seg, seg, None, 256, 256, H, 10000.0,
            ).astype(jnp.bfloat16),
            wo.astype(jnp.bfloat16),
        ).astype(jnp.float32)
    )(q, k, v, seg, wo, res))


if __name__ == "__main__":
    main()
