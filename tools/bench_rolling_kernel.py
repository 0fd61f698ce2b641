"""Prototype: rolling-buffer manual-DMA windowed attention kernel.

The fused local kernel fetches each k/v block 3x (once per neighboring
query block) and the Pallas auto-pipeline does not overlap DMA with compute
on this toolchain (tools/bench_kernel_anatomy.py), so the local layers run
~4x above their byte floor. This kernel:

* keeps k/v in HBM (memory_space=ANY) and rolls a 4-slot VMEM buffer:
  each grid step manually DMAs ONE new 256-row k/v block (the window
  advances one block per query block) — each byte fetched once;
* prefetches the NEXT step's block before computing the current step, so
  the copy overlaps compute by construction.

Grid (b, nq) iterates sequentially on the single v5e core; slots persist
across steps, re-primed at qi == 0.

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
NSLOT = 4


def _cdiv(a, b):
    return -(-a // b)


def rolling_kernel(
    q_ref, k_hbm, v_hbm, out_ref,
    k_buf, v_buf, sem_k, sem_v,
    *, heads: int, d: int, num_kb: int, nq: int, seq_len: int,
):
    """Window kernel over 3 rolling slots; block kb lives in slot kb % 4."""
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    start_kb = jnp.clip(qi - 1, 0, num_kb - 3)

    def copy_block(kb):
        slot = jax.lax.rem(kb, NSLOT)
        ck = pltpu.make_async_copy(
            k_hbm.at[bi, pl.ds(kb * BK, BK), :], k_buf.at[pl.ds(slot * BK, BK), :], sem_k
        )
        cv = pltpu.make_async_copy(
            v_hbm.at[bi, pl.ds(kb * BK, BK), :], v_buf.at[pl.ds(slot * BK, BK), :], sem_v
        )
        return ck, cv

    @pl.when(qi == 0)
    def _prime():
        # blocking fetch of blocks 0..2 (start_kb==0 at qi==0)
        for kb in range(3):
            ck, cv = copy_block(jnp.int32(kb))
            ck.start()
            ck.wait()
            cv.start()
            cv.wait()

    # prefetch the block the NEXT step needs (start_kb advances by <=1):
    # next step's span is [qi, qi+2] -> new block qi+2
    nxt = jnp.clip(qi + 2, 0, num_kb - 1)
    do_prefetch = jnp.logical_and(qi + 2 <= num_kb - 1, qi + 1 <= nq - 1)
    ckn, cvn = copy_block(nxt)

    @pl.when(do_prefetch)
    def _start_prefetch():
        ckn.start()
        cvn.start()

    q = q_ref[0]  # (bq, hd) pre-scaled
    acc_t = jnp.bfloat16 if q.dtype == jnp.bfloat16 else jnp.float32
    rows = qi * BQ + jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (BQ, BK), 1)

    ks, vs, biases = [], [], []
    for j in range(3):
        kb = start_kb + j
        slot = jax.lax.rem(kb, NSLOT)
        ks.append(k_buf[pl.ds(slot * BK, BK), :])
        vs.append(v_buf[pl.ds(slot * BK, BK), :])
        cols = kb * BK + col0
        mask2d = jnp.abs(rows - cols) <= WINDOW
        if seq_len % BK:
            mask2d = jnp.logical_and(mask2d, cols < seq_len)
        biases.append(jnp.where(mask2d, 0.0, NEG_INF).astype(acc_t))

    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl]
        ss, ms = [], []
        for j in range(3):
            s = jax.lax.dot_general(
                qh, ks[j][:, sl], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(acc_t)
            s = s + biases[j]
            ss.append(s)
            ms.append(jnp.max(s, axis=-1).astype(jnp.float32))
        m = jnp.maximum(jnp.maximum(ms[0], ms[1]), ms[2])
        m_safe = jnp.where(m < NEG_INF * 0.5, 0.0, m)
        l_sum = None
        acc = None
        for j in range(3):
            p = jnp.exp2(ss[j] - m_safe[:, None].astype(acc_t))
            lj = jnp.sum(p, axis=-1, dtype=jnp.float32)
            pv = jax.lax.dot_general(
                p.astype(vs[j].dtype), vs[j][:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_sum = lj if l_sum is None else l_sum + lj
            acc = pv if acc is None else acc + pv
        l_sum = jnp.maximum(l_sum, 1e-30)
        out_ref[0, :, sl] = (acc / l_sum[:, None]).astype(out_ref.dtype)

    # wait for the prefetch so the pipeline's slot writes are ordered
    @pl.when(do_prefetch)
    def _wait_prefetch():
        ckn.wait()
        cvn.wait()


def rolling_attention(q, k, v, heads: int):
    b, l, hd = q.shape
    d = hd // heads
    q = q * jnp.asarray(math.log2(math.e) / math.sqrt(d), q.dtype)
    l_pad = _cdiv(l, BQ) * BQ
    if l_pad != l:
        q = jnp.pad(q, [(0, 0), (0, l_pad - l), (0, 0)])
        k = jnp.pad(k, [(0, 0), (0, l_pad - l), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, l_pad - l), (0, 0)])
    nq = l_pad // BQ
    num_kb = l_pad // BK

    out = pl.pallas_call(
        functools.partial(rolling_kernel, heads=heads, d=d, num_kb=num_kb, nq=nq, seq_len=l),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, BQ, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, BQ, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((NSLOT * BK, hd), k.dtype),
            pltpu.VMEM((NSLOT * BK, hd), v.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(q, k, v)
    return out[:, :l, :]


def reference(q, k, v, heads):
    b, l, hd = q.shape
    d = hd // heads
    qh = q.reshape(b, l, heads, d)
    kh = k.reshape(b, l, heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32) / math.sqrt(d)
    idx = jnp.arange(l)
    mask = jnp.abs(idx[:, None] - idx[None, :]) <= WINDOW
    s = jnp.where(mask[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v.reshape(b, l, heads, d))
    return o.reshape(b, l, hd)


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
        B, H, L, D = 2, 4, 1024, 64
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.float32)
        out = rolling_attention(q, k, v, H)
        ref = reference(q, k, v, H)
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"parity max err: {err:.2e} {'OK' if err < 2e-3 else 'BAD'}")
        return

    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, H, L, D = 64, 12, 4096, 64
    CHAIN = 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, H * D)) * 0.3, jnp.bfloat16)

    @jax.jit
    def run(q, k, v):
        x = q
        for _ in range(CHAIN):
            x = x + rolling_attention(x, k, v, H) * 1e-6
        return x

    np.asarray(run(q, k, v).ravel()[:8])
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(run(q, k, v).ravel()[:8])
    t = (time.perf_counter() - t0) / 3 / CHAIN
    print(f"rolling manual-DMA local fwd (B{B} H{H} L{L}): {t*1e3:.2f} ms/layer (chain-amortized)")


if __name__ == "__main__":
    main()
