"""Isolate per-step costs of the fused local attention kernel on real TPU.

The decomposition bench (tools/bench_decompose.py) shows both kernel classes
running ~3x above their compute+DMA ideal. This strips the single-pass
windowed kernel body down variant by variant, same grid/blocks/DMA pattern:

  dma    - body writes a constant; measures grid + DMA overhead only
  copy   - out = first v block; adds one VMEM read/write
  mm     - score + pv matmuls only, no mask/softmax
  nosfm  - matmuls + mask bias, p = s (no exp2/max/sum)
  full   - the real kernel math

Self-contained copies of the kernel scaffolding; does not touch product code.
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cm3p_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

NEG_INF = -1e30
B, H, L, D = 64, 12, 4096, 64
WINDOW = 64
BQ = BK = 256
CHAIN = 8


def _cdiv(a, b):
    return -(-a // b)


def make_kernel(variant: str, nblocks: int, num_kb: int, hg: int):
    def kernel(q_ref, *rest):
        k_refs = rest[:nblocks]
        v_refs = rest[nblocks:2 * nblocks]
        out_ref = rest[2 * nblocks]

        if variant == "dma":
            out_ref[0] = jnp.zeros_like(out_ref[0])
            return
        if variant == "copy":
            out_ref[0] = v_refs[0][0]
            return

        qi = pl.program_id(1)
        start_kb = jnp.clip((qi * BQ - WINDOW) // BK, 0, num_kb - nblocks)
        q = q_ref[0]
        acc_t = jnp.bfloat16
        rows = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
        col0 = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)

        if variant == "mm":
            acc = None
            for j in range(nblocks):
                s = jax.lax.dot_general(
                    q, k_refs[j][0], (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
                ).astype(acc_t)
                pv = jax.lax.dot_general(
                    s, v_refs[j][0], (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
                )
                acc = pv if acc is None else acc + pv
            out_ref[0] = (acc * 1e-4).astype(out_ref.dtype)
            return

        ss, ms = [], []
        for j in range(nblocks):
            s = jax.lax.dot_general(
                q, k_refs[j][0], (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            ).astype(acc_t)
            cols = (start_kb + j) * BK + col0
            mask2d = jnp.abs(rows - cols) <= WINDOW
            s = s + jnp.where(mask2d, 0.0, NEG_INF).astype(acc_t)[None, :, :]
            ss.append(s)
            if variant == "full":
                ms.append(jnp.max(s, axis=-1).astype(jnp.float32))

        if variant == "nosfm":
            acc = None
            for j in range(nblocks):
                pv = jax.lax.dot_general(
                    ss[j], v_refs[j][0], (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
                )
                acc = pv if acc is None else acc + pv
            out_ref[0] = (acc * 1e-4).astype(out_ref.dtype)
            return

        m = ms[0]
        for j in range(1, nblocks):
            m = jnp.maximum(m, ms[j])
        m_safe = jnp.where(m < NEG_INF * 0.5, 0.0, m)
        l_sum = None
        acc = None
        for j in range(nblocks):
            p = jnp.exp2(ss[j] - m_safe[:, :, None].astype(acc_t))
            lj = jnp.sum(p, axis=-1, dtype=jnp.float32)
            pv = jax.lax.dot_general(
                p.astype(v_refs[j].dtype), v_refs[j][0], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            l_sum = lj if l_sum is None else l_sum + lj
            acc = pv if acc is None else acc + pv
        l_sum = jnp.maximum(l_sum, 1e-30)
        out_ref[0] = (acc / l_sum[:, :, None]).astype(out_ref.dtype)

    return kernel


def build(variant: str, hg: int):
    num_kb = L // BK
    nq = L // BQ
    nblocks = min(num_kb, _cdiv(BQ + 2 * WINDOW, BK) + 1)
    g = H // hg
    bg = B * g

    def kix(j):
        return lambda bgi, qi, _j=j: (
            bgi, 0, jnp.clip((qi * BQ - WINDOW) // BK, 0, num_kb - nblocks) + _j, 0
        )

    in_specs = [pl.BlockSpec((1, hg, BQ, D), lambda bgi, qi: (bgi, 0, qi, 0), memory_space=pltpu.VMEM)]
    for j in range(nblocks):
        in_specs.append(pl.BlockSpec((1, hg, BK, D), kix(j), memory_space=pltpu.VMEM))
    for j in range(nblocks):
        in_specs.append(pl.BlockSpec((1, hg, BK, D), kix(j), memory_space=pltpu.VMEM))

    kern = make_kernel(variant, nblocks, num_kb, hg)

    def fa(q, k, v):
        qf = (q * (math.log2(math.e) / math.sqrt(D))).reshape(bg, hg, L, D)
        kf = k.reshape(bg, hg, L, D)
        vf = v.reshape(bg, hg, L, D)
        args = [qf] + [kf] * nblocks + [vf] * nblocks
        out = pl.pallas_call(
            kern,
            grid=(bg, nq),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, hg, BQ, D), lambda bgi, qi: (bgi, 0, qi, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bg, hg, L, D), q.dtype),
            compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
        )(*args)
        return out.reshape(B, H, L, D)

    @jax.jit
    def run(q, k, v):
        x = q
        for _ in range(CHAIN):
            x = x + fa(x, k, v) * 1e-6
        return x

    return run


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)) * 0.3, jnp.bfloat16)

    for hg in (4, 6, 12):
        if H % hg:
            continue
        for variant in ("dma", "copy", "mm", "nosfm", "full"):
            try:
                run = build(variant, hg)
                out = run(q, k, v)
                np.asarray(out.ravel()[:8])
                t0 = time.perf_counter()
                for _ in range(3):
                    np.asarray(run(q, k, v).ravel()[:8])
                t = (time.perf_counter() - t0) / 3 / CHAIN
                steps = B * (H // hg) * (L // BQ)
                print(f"hg={hg:2d} {variant:6s}: {t*1e3:7.2f} ms  ({t/steps*1e6:5.2f} us/step)")
            except Exception as e:  # noqa: BLE001
                print(f"hg={hg:2d} {variant:6s}: FAIL {type(e).__name__} {str(e)[:100]}")


if __name__ == "__main__":
    main()
