"""Prototype: head-minor (B, L, H*D) fused local attention kernel.

The DMA bench (tools/bench_dma.py) shows head-major (B, H, L, 64) blocks cap
at ~170 GB/s (minor dim 64 half-fills the 128-lane VMEM tiles; per-head
strides fragment DMAs) while head-minor (B, L, H*D) blocks stream at
~640 GB/s. The attention kernels are ~92% DMA (tools/bench_kernel_anatomy.py),
so this prototypes the fused windowed kernel reading q/k/v as (1, bq, H*D)
blocks and lane-slicing heads in-kernel (each head's 64 lanes sit inside a
single 128-lane tile, so slices never cross tiles).

Usage: --check (CPU interpret parity) or --bench (TPU timing).
"""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


import argparse
import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
WINDOW = 64
BQ = BK = 256


def _cdiv(a, b):
    return -(-a // b)


def hm_kernel(q_ref, *rest, nblocks: int, num_kb: int, heads: int, d: int, seq_len: int,
              variant: str = "full", block_q: int = BQ, block_k: int = BK):
    k_refs = rest[:nblocks]
    v_refs = rest[nblocks:2 * nblocks]
    out_ref = rest[2 * nblocks]

    if variant == "dma":
        out_ref[0] = v_refs[0][0]
        return

    if variant == "batched":
        # in-kernel relayout to (heads, bq, d) + the batched-head math the
        # head-major kernel uses; measures Mosaic relayout cost
        qi = pl.program_id(1)
        start_kb = jnp.clip((qi * block_q - WINDOW) // block_k, 0, num_kb - nblocks)
        rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        col0 = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        q = jnp.moveaxis(q_ref[0].reshape(block_q, heads, d), 1, 0)  # (h, bq, d)
        ss, ms = [], []
        for j in range(nblocks):
            kh = jnp.moveaxis(k_refs[j][0].reshape(block_k, heads, d), 1, 0)
            s = jax.lax.dot_general(
                q, kh, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
            cols = (start_kb + j) * block_k + col0
            mask2d = jnp.abs(rows - cols) <= WINDOW
            s = s + jnp.where(mask2d, 0.0, NEG_INF).astype(jnp.bfloat16)[None]
            ss.append(s)
            ms.append(jnp.max(s, axis=-1).astype(jnp.float32))
        m = ms[0]
        for j in range(1, nblocks):
            m = jnp.maximum(m, ms[j])
        m_safe = jnp.where(m < NEG_INF * 0.5, 0.0, m)
        l_sum = None
        acc = None
        for j in range(nblocks):
            p = jnp.exp2(ss[j] - m_safe[:, :, None].astype(jnp.bfloat16))
            lj = jnp.sum(p, axis=-1, dtype=jnp.float32)
            vh = jnp.moveaxis(v_refs[j][0].reshape(block_k, heads, d), 1, 0)
            pv = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
            )
            l_sum = lj if l_sum is None else l_sum + lj
            acc = pv if acc is None else acc + pv
        l_sum = jnp.maximum(l_sum, 1e-30)
        o = (acc / l_sum[:, :, None]).astype(out_ref.dtype)  # (h, bq, d)
        out_ref[0] = jnp.moveaxis(o, 0, 1).reshape(block_q, heads * d)
        return

    qi = pl.program_id(1)
    start_kb = jnp.clip((qi * block_q - WINDOW) // block_k, 0, num_kb - nblocks)
    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    masks = []
    for j in range(nblocks):
        cols = (start_kb + j) * block_k + col0
        mask2d = jnp.abs(rows - cols) <= WINDOW
        if seq_len % block_k:
            mask2d = jnp.logical_and(mask2d, cols < seq_len)
        masks.append(jnp.where(mask2d, 0.0, NEG_INF).astype(jnp.bfloat16))

    q = q_ref[0]  # (bq, H*D) pre-scaled
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl]
        ss = []
        for j in range(nblocks):
            kh = k_refs[j][0][:, sl]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)
            ss.append(s + masks[j])
        m = jnp.max(ss[0], axis=-1)
        for j in range(1, nblocks):
            m = jnp.maximum(m, jnp.max(ss[j], axis=-1))
        m = m.astype(jnp.float32)
        m_safe = jnp.where(m < NEG_INF * 0.5, 0.0, m)
        l_sum = None
        acc = None
        for j in range(nblocks):
            p = jnp.exp2(ss[j] - m_safe[:, None].astype(jnp.bfloat16))
            lj = jnp.sum(p, axis=-1, dtype=jnp.float32)
            vh = v_refs[j][0][:, sl]
            pv = jax.lax.dot_general(
                p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            l_sum = lj if l_sum is None else l_sum + lj
            acc = pv if acc is None else acc + pv
        l_sum = jnp.maximum(l_sum, 1e-30)
        out_ref[0, :, sl] = (acc / l_sum[:, None]).astype(out_ref.dtype)


def hm_attention(q, k, v, heads: int, variant: str = "full", block_q: int = BQ, block_k: int = BK):
    """q/k/v: (B, L, H*D) head-minor. Window WINDOW, no segments (prototype)."""
    b, l, hd = q.shape
    d = hd // heads
    q = q * jnp.asarray(math.log2(math.e) / math.sqrt(d), q.dtype)
    num_kb = l // block_k
    nq = l // block_q
    nblocks = min(num_kb, _cdiv(block_q + 2 * WINDOW, block_k) + 1)

    def kix(j):
        return lambda bi, qi, _j=j: (
            bi, jnp.clip((qi * block_q - WINDOW) // block_k, 0, num_kb - nblocks) + _j, 0
        )

    in_specs = [pl.BlockSpec((1, block_q, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM)]
    args = [q]
    for j in range(nblocks):
        in_specs.append(pl.BlockSpec((1, block_k, hd), kix(j), memory_space=pltpu.VMEM))
        args.append(k)
    for j in range(nblocks):
        in_specs.append(pl.BlockSpec((1, block_k, hd), kix(j), memory_space=pltpu.VMEM))
        args.append(v)

    return pl.pallas_call(
        functools.partial(hm_kernel, nblocks=nblocks, num_kb=num_kb, heads=heads, d=d, seq_len=l,
                          variant=variant, block_q=block_q, block_k=block_k),
        grid=(b, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(*args)


def reference(q, k, v, heads):
    b, l, hd = q.shape
    d = hd // heads
    qh = q.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, l, heads, d).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32) / math.sqrt(d)
    idx = jnp.arange(l)
    mask = jnp.abs(idx[:, None] - idx[None, :]) <= WINDOW
    s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, l, hd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--bench", action="store_true")
    args = ap.parse_args()

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        global pl
        import types

        orig = pl.pallas_call
        pl = types.SimpleNamespace(**{**pl.__dict__, "pallas_call": functools.partial(orig, interpret=True)})
        B, H, L, D = 2, 4, 1024, 64
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.float32)
        ref = reference(q, k, v, H)
        for variant, bq, bk in [("full", 256, 256), ("batched", 256, 256), ("full", 512, 256), ("full", 128, 128)]:
            out = hm_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16), H,
                               variant=variant, block_q=bq, block_k=bk)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
            print(f"{variant:8s} bq={bq} bk={bk} parity max err: {err:.2e} {'OK' if err < 2e-2 else 'BAD'}")
        return

    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, H, L, D = 64, 12, 4096, 64
    CHAIN = 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.bfloat16)

    for variant, bq, bk in [
        ("dma", 256, 256), ("full", 256, 256), ("batched", 256, 256),
        ("full", 512, 256), ("full", 128, 128), ("batched", 512, 256),
    ]:
        def make_run(variant=variant, bq=bq, bk=bk):
            @jax.jit
            def run(q, k, v):
                x = q
                for _ in range(CHAIN):
                    x = x + hm_attention(x, k, v, H, variant=variant, block_q=bq, block_k=bk) * 1e-6
                return x
            return run

        try:
            run = make_run()
            np.asarray(run(q, k, v).ravel()[:8])
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(run(q, k, v).ravel()[:8])
            t = (time.perf_counter() - t0) / 3 / CHAIN
            print(f"headmin {variant:8s} bq={bq:3d} bk={bk:3d} (B{B} H{H} L{L}): {t*1e3:6.2f} ms/layer")
        except Exception as e:  # noqa: BLE001
            print(f"headmin {variant:8s} bq={bq:3d} bk={bk:3d}: FAIL {type(e).__name__} {str(e)[:100]}")


if __name__ == "__main__":
    main()
