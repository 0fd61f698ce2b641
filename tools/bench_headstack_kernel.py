"""Prototype: batch per-head VPU work by stacking scores along sublanes.

The fused local kernel issues ~170 small VPU ops per grid step (12 heads x
per-head bias/exp2/sum chains). This prototypes stacking per-head score
matrices into one (G*bq, bk) buffer per key block (sublane concat IS
supported, unlike lane concat) so the bias+exp2+sum run as single wide ops,
with G-head groups to bound the transient buffer.

Variants:
  perhead - current product structure (baseline)
  stackG  - G heads stacked per elementwise pass (G in {4, 6, 12})
  mm      - matmuls only, no softmax: bounds what op-batching can save

Usage: --check (CPU interpret parity) / --bench (TPU timing).
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
SHIFT = 16.0
CLAMP = 100.0


def _cdiv(a, b):
    return -(-a // b)


def kernel(q_ref, *rest, heads: int, d: int, num_kb: int, nblocks: int, seq_len: int,
           variant: str, group: int):
    k_refs = rest[:nblocks]
    v_refs = rest[nblocks:2 * nblocks]
    pos = 2 * nblocks
    qseg_ref = kstripe_ref = None
    kseg_refs = [None] * nblocks
    if variant == "perhead_seg":
        qseg_ref = rest[pos]
        kseg_refs = rest[pos + 1:pos + 1 + nblocks]
        pos += 1 + nblocks
    elif variant == "perhead_segstripe":
        qseg_ref = rest[pos]
        kstripe_ref = rest[pos + 1]
        pos += 2
    out_ref = rest[pos]

    qi = pl.program_id(1)
    start_kb = jnp.clip((qi * BQ - WINDOW) // BK, 0, num_kb - nblocks)
    q = q_ref[0]
    rows = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)
    biases = []
    for j in range(nblocks):
        cols = (start_kb + j) * BK + col0
        mask2d = jnp.abs(rows - cols) <= WINDOW
        if seq_len % BK:
            mask2d = jnp.logical_and(mask2d, cols < seq_len)
        if qseg_ref is not None:
            qseg = qseg_ref[0, 0]
            kseg = kseg_refs[j][0, 0] if kstripe_ref is None else kstripe_ref[0, 0, j * BK:(j + 1) * BK]
            mask2d = jnp.logical_and(
                mask2d, jnp.logical_and(kseg[None, :] > 0, qseg[:, None] == kseg[None, :])
            )
        biases.append(jnp.where(mask2d, -SHIFT, NEG_INF).astype(jnp.bfloat16))
    if variant in ("perhead_seg", "perhead_segstripe"):
        variant = "perhead"

    if variant == "mm":
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            acc = None
            for j in range(nblocks):
                s = jax.lax.dot_general(
                    q[:, sl], k_refs[j][0][:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                pv = jax.lax.dot_general(
                    s, v_refs[j][0][:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = pv if acc is None else acc + pv
            out_ref[0, :, sl] = (acc * 1e-4).astype(out_ref.dtype)
        return

    if variant == "perhead":
        for h in range(heads):
            sl = slice(h * d, (h + 1) * d)
            ss = []
            for j in range(nblocks):
                s = jax.lax.dot_general(
                    q[:, sl], k_refs[j][0][:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                ss.append(s + biases[j])
            l_sum = None
            acc = None
            for j in range(nblocks):
                p = jnp.exp2(jnp.minimum(ss[j], CLAMP - SHIFT))
                lj = jnp.sum(p, axis=-1, dtype=jnp.float32)
                pv = jax.lax.dot_general(
                    p.astype(v_refs[j].dtype), v_refs[j][0][:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                l_sum = lj if l_sum is None else l_sum + lj
                acc = pv if acc is None else acc + pv
            l_sum = jnp.maximum(l_sum, 1e-30)
            out_ref[0, :, sl] = (acc / l_sum[:, None]).astype(out_ref.dtype)
        return

    # stacked: G-head groups; scores per group stacked along sublanes
    for g0 in range(0, heads, group):
        hs = list(range(g0, min(g0 + group, heads)))
        ps = []  # per block: (G*bq, bk) probabilities
        for j in range(nblocks):
            s_list = []
            for h in hs:
                sl = slice(h * d, (h + 1) * d)
                s = jax.lax.dot_general(
                    q[:, sl], k_refs[j][0][:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(jnp.bfloat16)
                s_list.append(s)
            s_all = jnp.concatenate(s_list, axis=0)  # sublane concat: supported
            bias_t = jnp.concatenate([biases[j]] * len(hs), axis=0)
            ps.append(jnp.exp2(jnp.minimum(s_all + bias_t, CLAMP - SHIFT)))
        l_all = None
        for j in range(nblocks):
            lj = jnp.sum(ps[j], axis=-1, dtype=jnp.float32)  # (G*bq,)
            l_all = lj if l_all is None else l_all + lj
        l_all = jnp.maximum(l_all, 1e-30)
        for gi, h in enumerate(hs):
            sl = slice(h * d, (h + 1) * d)
            row = slice(gi * BQ, (gi + 1) * BQ)
            acc = None
            for j in range(nblocks):
                pv = jax.lax.dot_general(
                    ps[j][row].astype(v_refs[j].dtype), v_refs[j][0][:, sl],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                )
                acc = pv if acc is None else acc + pv
            out_ref[0, :, sl] = (acc / l_all[row][:, None]).astype(out_ref.dtype)


def attention(q, k, v, heads, variant, group=4, seg=None):
    b, l, hd = q.shape
    d = hd // heads
    q = q * jnp.asarray(math.log2(math.e) / math.sqrt(d), q.dtype)
    num_kb = l // BK
    nq = l // BQ
    nblocks = min(num_kb, _cdiv(BQ + 2 * WINDOW, BK) + 1)

    def kix(j):
        return lambda bi, qi, _j=j: (
            bi, jnp.clip((qi * BQ - WINDOW) // BK, 0, num_kb - nblocks) + _j, 0
        )

    in_specs = [pl.BlockSpec((1, BQ, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM)]
    args = [q]
    for j in range(nblocks):
        in_specs.append(pl.BlockSpec((1, BK, hd), kix(j), memory_space=pltpu.VMEM))
        args.append(k)
    for j in range(nblocks):
        in_specs.append(pl.BlockSpec((1, BK, hd), kix(j), memory_space=pltpu.VMEM))
        args.append(v)
    if variant == "perhead_seg":
        segi = seg.astype(jnp.int32)[:, None, :]
        in_specs.append(pl.BlockSpec((1, 1, BQ), lambda bi, qi: (bi, 0, qi), memory_space=pltpu.VMEM))
        args.append(segi)
        for j in range(nblocks):
            in_specs.append(pl.BlockSpec(
                (1, 1, BK),
                lambda bi, qi, _j=j: (bi, 0, jnp.clip((qi * BQ - WINDOW) // BK, 0, num_kb - nblocks) + _j),
                memory_space=pltpu.VMEM))
            args.append(segi)
    elif variant == "perhead_segstripe":
        segi = seg.astype(jnp.int32)[:, None, :]
        in_specs.append(pl.BlockSpec((1, 1, BQ), lambda bi, qi: (bi, 0, qi), memory_space=pltpu.VMEM))
        args.append(segi)
        # precompute (B, nq, nblocks*BK) kseg stripes outside the kernel
        nq_ = l // BQ
        starts = np.clip((np.arange(nq_) * BQ - WINDOW) // BK, 0, num_kb - nblocks) * BK
        stripes = jnp.stack([
            jax.lax.dynamic_slice_in_dim(seg.astype(jnp.int32), int(s), nblocks * BK, axis=1)
            for s in starts
        ], axis=1)  # (B, nq, nblocks*BK)
        in_specs.append(pl.BlockSpec((1, 1, nblocks * BK), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM))
        args.append(stripes)

    return pl.pallas_call(
        functools.partial(kernel, heads=heads, d=d, num_kb=num_kb, nblocks=nblocks,
                          seq_len=l, variant=variant, group=group),
        grid=(b, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, BQ, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(*args)


def reference(q, k, v, heads):
    b, l, hd = q.shape
    d = hd // heads
    qh = q.reshape(b, l, heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, k.reshape(b, l, heads, d), preferred_element_type=jnp.float32) / math.sqrt(d)
    idx = jnp.arange(l)
    mask = jnp.abs(idx[:, None] - idx[None, :]) <= WINDOW
    s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.reshape(b, l, heads, d)).reshape(b, l, hd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    if args.check:
        jax.config.update("jax_platforms", "cpu")
        import types
        global pl
        orig = pl.pallas_call
        pl = types.SimpleNamespace(**{**pl.__dict__, "pallas_call": functools.partial(orig, interpret=True)})
        B, H, L = 2, 4, 1024
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, L, H * 64)) * 0.3, jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, L, H * 64)) * 0.3, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, L, H * 64)) * 0.3, jnp.float32)
        ref = reference(q, k, v, H)
        for variant, g in [("perhead", 0), ("stack", 2), ("stack", 4)]:
            out = attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                            H, variant, group=g)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
            print(f"{variant}{g} parity max err: {err:.2e} {'OK' if err < 2e-2 else 'BAD'}")
        return

    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, H, L = 64, 12, 4096
    CHAIN = 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H * 64)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, H * 64)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, H * 64)) * 0.3, jnp.bfloat16)

    seg_np = np.zeros((B, L), np.int32)
    for r in range(B):
        p0, sgi = 0, 1
        while p0 < L:
            n = min(1300, L - p0)
            seg_np[r, p0:p0 + n] = sgi
            p0 += n
            sgi += 1
    seg = jnp.asarray(seg_np)

    for variant, g in [("perhead", 0), ("perhead_seg", 0), ("perhead_segstripe", 0)]:
        def make(variant=variant, g=g):
            @jax.jit
            def run(q, k, v):
                x = q
                for _ in range(CHAIN):
                    x = x + attention(x, k, v, H, variant, group=g, seg=seg) * 1e-6
                return x
            return run

        try:
            run = make()
            np.asarray(run(q, k, v).ravel()[:8])
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(run(q, k, v).ravel()[:8])
            t = (time.perf_counter() - t0) / 3 / CHAIN
            print(f"{variant}{g:3d}: {t*1e3:6.2f} ms/layer")
        except Exception as e:  # noqa: BLE001
            print(f"{variant}{g:3d}: FAIL {type(e).__name__} {str(e)[:100]}")


if __name__ == "__main__":
    main()
