"""Pallas backward kernels for flash attention.

Standard two-kernel flash backward (dKV accumulates over query blocks, dQ
over key blocks), recomputing probabilities from saved logsumexp residuals
instead of materializing the O(L²) score matrix the XLA-recompute fallback
needs. Window / padding / segment masks mirror the forward kernel's
2-D-bias construction; block ranges are the window-intersection logic with
q/k roles swapped for dKV.

Math (q' = q / sqrt(d) is pre-scaled; the forward kernel works in base-2
for exp2 throughput, so its saved residual is log2-sum-exp2 — the prologue
converts it to natural units once (lse = lse2 · ln2) and these kernels stay
in natural space, sidestepping a Mosaic codegen crash exp2 triggers here):
    p  = exp(q'·kᵀ + bias - lse)
    dv = pᵀ · do
    ds = p ∘ (do·vᵀ - delta),  delta = rowsum(do ∘ out)
    dk = dsᵀ · q'
    dq = (ds · k) / sqrt(d)
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _mask_bias2d(q_start, k_start, block_q, block_k, window, qseg, kseg, seq_len, need_bound, acc_t):
    """(block_q, block_k) additive bias folding window/segment/bound masks."""
    mask2d = None
    if window is not None:
        rows = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask2d = jnp.abs(rows - cols) <= window
    if kseg is not None:
        seg_ok = jnp.logical_and(kseg[None, :] > 0, qseg[:, None] == kseg[None, :])
        mask2d = seg_ok if mask2d is None else jnp.logical_and(mask2d, seg_ok)
    elif need_bound:
        cols = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        bound = cols < seq_len
        mask2d = bound if mask2d is None else jnp.logical_and(mask2d, bound)
    if mask2d is None:
        return None
    return jnp.where(mask2d, 0.0, NEG_INF).astype(acc_t)


def _dkv_kernel(
    start_ref, count_ref,
    qs_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, window, block_q, block_k, num_qb, nq_grid, seq_len, groups_per_batch,
):
    ki = pl.program_id(1)
    qj = pl.program_id(2)
    bi = pl.program_id(0) // groups_per_batch
    cnt = count_ref[bi, ki]
    qb = start_ref[bi, ki] + jnp.minimum(qj, jnp.maximum(cnt - 1, 0))

    @pl.when(qj == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(qj < cnt)
    def _accumulate():
        qs = qs_ref[0]  # (hg, bq, D) pre-scaled
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]  # (hg, bq) fp32
        delta = delta_ref[0]
        acc_t = jnp.float32 if qs.dtype == jnp.float32 else jnp.bfloat16
        s = jax.lax.dot_general(qs, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        bias2d = _mask_bias2d(
            qb * block_q, ki * block_k, block_q, block_k, window,
            qseg_ref[0, 0] if qseg_ref is not None else None,
            kseg_ref[0, 0] if kseg_ref is not None else None,
            seq_len, kseg_ref is None, jnp.float32,
        )
        if bias2d is not None:
            s_b = s + bias2d[None, :, :]
        else:
            s_b = s
        p = jnp.exp(s_b - lse[:, :, None]).astype(acc_t)  # (hg, bq, bk)

        # dv += pᵀ · do : contract over bq
        dv_scr[:] = dv_scr[:] + jax.lax.dot_general(
            p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        # dp = do · vᵀ : (hg, bq, bk)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        ds = (p.astype(jnp.float32) * (dp - delta[:, :, None])).astype(acc_t)
        # dk += dsᵀ · q' : contract over bq
        dk_scr[:] = dk_scr[:] + jax.lax.dot_general(
            ds, qs, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )

    @pl.when(qj == jnp.maximum(cnt, 1) - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _dq_kernel(
    start_ref, count_ref,
    qs_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dq_ref, dq_scr,
    *, window, block_q, block_k, num_kb, nk_grid, seq_len, groups_per_batch,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    bi = pl.program_id(0) // groups_per_batch
    cnt = count_ref[bi, qi]
    kb = start_ref[bi, qi] + jnp.minimum(kj, jnp.maximum(cnt - 1, 0))

    @pl.when(kj == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(kj < cnt)
    def _accumulate():
        qs = qs_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]
        delta = delta_ref[0]
        acc_t = jnp.float32 if qs.dtype == jnp.float32 else jnp.bfloat16
        s = jax.lax.dot_general(qs, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        bias2d = _mask_bias2d(
            qi * block_q, kb * block_k, block_q, block_k, window,
            qseg_ref[0, 0] if qseg_ref is not None else None,
            kseg_ref[0, 0] if kseg_ref is not None else None,
            seq_len, kseg_ref is None, jnp.float32,
        )
        if bias2d is not None:
            s_b = s + bias2d[None, :, :]
        else:
            s_b = s
        p = jnp.exp(s_b - lse[:, :, None])
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, :, None])).astype(acc_t)
        # dq += ds · k : contract over bk (ds dim 2, k dim 1)
        dq_scr[:] = dq_scr[:] + jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )

    @pl.when(kj == jnp.maximum(cnt, 1) - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dq_fused_kernel(
    qs_ref, *rest,
    window: int, block_q: int, block_k: int, num_kb: int, nblocks: int,
    seq_len: int, has_seg: bool,
):
    """Single-pass dQ for windowed layers: all key blocks in one grid step.

    Same rationale as the forward's _window_fused_kernel — at w=64 only 3
    key blocks are visited per query block, so unrolling removes 2/3 of the
    grid steps and the scratch accumulate/read chain.
    Ref layout: qs, k*n, v*n, do, lse, delta[, qseg, kseg*n], dq.
    """
    k_refs = rest[:nblocks]
    v_refs = rest[nblocks:2 * nblocks]
    do_ref, lse_ref, delta_ref = rest[2 * nblocks:2 * nblocks + 3]
    if has_seg:
        qseg_ref = rest[2 * nblocks + 3]
        kseg_refs = rest[2 * nblocks + 4:3 * nblocks + 4]
        dq_ref = rest[3 * nblocks + 4]
    else:
        qseg_ref, kseg_refs = None, [None] * nblocks
        dq_ref = rest[2 * nblocks + 3]

    qi = pl.program_id(1)
    start_kb = jnp.clip((qi * block_q - window) // block_k, 0, num_kb - nblocks)
    qs = qs_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    acc_t = jnp.float32 if qs.dtype == jnp.float32 else jnp.bfloat16

    dq = None
    for j in range(nblocks):
        k = k_refs[j][0]
        v = v_refs[j][0]
        s = jax.lax.dot_general(qs, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        bias2d = _mask_bias2d(
            qi * block_q, (start_kb + j) * block_k, block_q, block_k, window,
            qseg_ref[0, 0] if has_seg else None,
            kseg_refs[j][0, 0] if has_seg else None,
            seq_len, not has_seg, jnp.float32,
        )
        if bias2d is not None:
            s = s + bias2d[None, :, :]
        p = jnp.exp(s - lse[:, :, None])
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, :, None])).astype(acc_t)
        contrib = jax.lax.dot_general(
            ds, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dq = contrib if dq is None else dq + contrib
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _dkv_fused_kernel(
    k_ref, v_ref, *rest,
    window: int, block_q: int, block_k: int, num_qb: int, nblocks: int,
    seq_len: int, has_seg: bool,
):
    """Single-pass dK/dV for windowed layers (q blocks unrolled).

    Ref layout: k, v, qs*n, do*n, lse*n, delta*n[, qseg*n, kseg], dk, dv.
    """
    qs_refs = rest[:nblocks]
    do_refs = rest[nblocks:2 * nblocks]
    lse_refs = rest[2 * nblocks:3 * nblocks]
    delta_refs = rest[3 * nblocks:4 * nblocks]
    if has_seg:
        qseg_refs = rest[4 * nblocks:5 * nblocks]
        kseg_ref = rest[5 * nblocks]
        dk_ref, dv_ref = rest[5 * nblocks + 1:5 * nblocks + 3]
    else:
        qseg_refs, kseg_ref = [None] * nblocks, None
        dk_ref, dv_ref = rest[4 * nblocks:4 * nblocks + 2]

    ki = pl.program_id(1)
    start_qb = jnp.clip((ki * block_k - window) // block_q, 0, num_qb - nblocks)
    k = k_ref[0]
    v = v_ref[0]

    dk = None
    dv = None
    for j in range(nblocks):
        qs = qs_refs[j][0]
        do = do_refs[j][0]
        lse = lse_refs[j][0]
        delta = delta_refs[j][0]
        acc_t = jnp.float32 if qs.dtype == jnp.float32 else jnp.bfloat16
        s = jax.lax.dot_general(qs, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        bias2d = _mask_bias2d(
            (start_qb + j) * block_q, ki * block_k, block_q, block_k, window,
            qseg_refs[j][0, 0] if has_seg else None,
            kseg_ref[0, 0] if has_seg else None,
            seq_len, not has_seg, jnp.float32,
        )
        if bias2d is not None:
            s = s + bias2d[None, :, :]
        p = jnp.exp(s - lse[:, :, None]).astype(acc_t)
        dvj = jax.lax.dot_general(
            p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        ds = (p.astype(jnp.float32) * (dp - delta[:, :, None])).astype(acc_t)
        dkj = jax.lax.dot_general(
            ds, qs, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dk = dkj if dk is None else dk + dkj
        dv = dvj if dv is None else dv + dvj
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _window_fused_bwd(qs, k, v, dout, lse, delta, qseg, kseg, window, block_q, block_k, hg, l, l_pad):
    """Single-pass windowed backward dispatcher (both passes, grid (bg, n))."""
    b, h = qs.shape[0], qs.shape[1]
    d = qs.shape[3]
    g = h // hg
    bg = b * g

    def r4(x):
        return x.reshape(bg, hg, l_pad, d)

    def r3(x):
        return x.reshape(bg, hg, l_pad)

    qsf, kf, vf, dof = r4(qs), r4(k), r4(v), r4(dout)
    lsef, deltaf = r3(lse), r3(delta)
    nq = l_pad // block_q
    nk = l_pad // block_k
    nkb = min(nk, _cdiv(block_q + 2 * window, block_k) + 1)
    nqb = min(nq, _cdiv(block_k + 2 * window, block_q) + 1)
    has_seg = qseg is not None

    def kix(j):
        return lambda bgi, qi, _j=j: (
            bgi, 0, jnp.clip((qi * block_q - window) // block_k, 0, nk - nkb) + _j, 0
        )

    def kix3(j, _g=g):
        return lambda bgi, qi, _j=j: (
            bgi // _g, 0, jnp.clip((qi * block_q - window) // block_k, 0, nk - nkb) + _j
        )

    def qix_dkv(j):
        return lambda bgi, ki, _j=j: (
            bgi, 0, jnp.clip((ki * block_k - window) // block_q, 0, nq - nqb) + _j, 0
        )

    def qix3_dkv(j, _g=g):
        return lambda bgi, ki, _j=j: (
            bgi, 0, jnp.clip((ki * block_k - window) // block_q, 0, nq - nqb) + _j
        )

    # ---- dQ pass: grid (bg, nq)
    specs = [pl.BlockSpec((1, hg, block_q, d), lambda bgi, qi: (bgi, 0, qi, 0), memory_space=pltpu.VMEM)]
    args = [qsf]
    for j in range(nkb):
        specs.append(pl.BlockSpec((1, hg, block_k, d), kix(j), memory_space=pltpu.VMEM))
        args.append(kf)
    for j in range(nkb):
        specs.append(pl.BlockSpec((1, hg, block_k, d), kix(j), memory_space=pltpu.VMEM))
        args.append(vf)
    specs += [
        pl.BlockSpec((1, hg, block_q, d), lambda bgi, qi: (bgi, 0, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_q), lambda bgi, qi: (bgi, 0, qi), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_q), lambda bgi, qi: (bgi, 0, qi), memory_space=pltpu.VMEM),
    ]
    args += [dof, lsef, deltaf]
    if has_seg:
        specs.append(pl.BlockSpec((1, 1, block_q), lambda bgi, qi, _g=g: (bgi // _g, 0, qi), memory_space=pltpu.VMEM))
        args.append(qseg.astype(jnp.int32)[:, None, :])
        ksegf = kseg.astype(jnp.int32)[:, None, :]
        for j in range(nkb):
            specs.append(pl.BlockSpec((1, 1, block_k), kix3(j), memory_space=pltpu.VMEM))
            args.append(ksegf)
    dq = pl.pallas_call(
        functools.partial(
            _dq_fused_kernel, window=window, block_q=block_q, block_k=block_k,
            num_kb=nk, nblocks=nkb, seq_len=l, has_seg=has_seg,
        ),
        grid=(bg, nq),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, hg, block_q, d), lambda bgi, qi: (bgi, 0, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bg, hg, l_pad, d), qs.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(*args)

    # ---- dKV pass: grid (bg, nk)
    specs = [
        pl.BlockSpec((1, hg, block_k, d), lambda bgi, ki: (bgi, 0, ki, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_k, d), lambda bgi, ki: (bgi, 0, ki, 0), memory_space=pltpu.VMEM),
    ]
    args = [kf, vf]
    for j in range(nqb):
        specs.append(pl.BlockSpec((1, hg, block_q, d), qix_dkv(j), memory_space=pltpu.VMEM))
        args.append(qsf)
    for j in range(nqb):
        specs.append(pl.BlockSpec((1, hg, block_q, d), qix_dkv(j), memory_space=pltpu.VMEM))
        args.append(dof)
    for j in range(nqb):
        specs.append(pl.BlockSpec((1, hg, block_q), qix3_dkv(j), memory_space=pltpu.VMEM))
        args.append(lsef)
    for j in range(nqb):
        specs.append(pl.BlockSpec((1, hg, block_q), qix3_dkv(j), memory_space=pltpu.VMEM))
        args.append(deltaf)
    if has_seg:
        qsegf = qseg.astype(jnp.int32)[:, None, :]
        for j in range(nqb):
            specs.append(pl.BlockSpec(
                (1, 1, block_q),
                lambda bgi, ki, _j=j, _g=g: (
                    bgi // _g, 0, jnp.clip((ki * block_k - window) // block_q, 0, nq - nqb) + _j,
                ),
                memory_space=pltpu.VMEM))
            args.append(qsegf)
        specs.append(pl.BlockSpec((1, 1, block_k), lambda bgi, ki, _g=g: (bgi // _g, 0, ki), memory_space=pltpu.VMEM))
        args.append(kseg.astype(jnp.int32)[:, None, :])
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_fused_kernel, window=window, block_q=block_q, block_k=block_k,
            num_qb=nq, nblocks=nqb, seq_len=l, has_seg=has_seg,
        ),
        grid=(bg, nk),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((1, hg, block_k, d), lambda bgi, ki: (bgi, 0, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, block_k, d), lambda bgi, ki: (bgi, 0, ki, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bg, hg, l_pad, d), qs.dtype),
            jax.ShapeDtypeStruct((bg, hg, l_pad, d), qs.dtype),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(*args)
    return dq, dk, dv


def flash_attention_bwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    qseg: Optional[jnp.ndarray],
    kseg: Optional[jnp.ndarray],
    out: jnp.ndarray,
    lse: jnp.ndarray,
    dout: jnp.ndarray,
    window: Optional[int],
    block_q: int,
    block_k: int,
    head_group: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute (dq, dk, dv) with the two-kernel flash backward."""
    b, h, l, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qs = q * jnp.asarray(scale, q.dtype)
    lse = lse * math.log(2.0)  # forward residual is base-2; convert once

    if window is None and qseg is None:
        # Mosaic (libtpu 2026-xx) crashes in ApplyVectorLayout compiling the
        # mask-free global variant of these kernels; all-ones segments are
        # semantically identical and take the (stable) segmented codepath
        qseg = kseg = jnp.ones((b, l), jnp.int32)

    delta = jnp.sum(dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (b, h, l)

    block = max(block_q, block_k)
    l_pad = _cdiv(l, block) * block
    if l_pad != l:
        pad4 = [(0, 0), (0, 0), (0, l_pad - l), (0, 0)]
        pad3 = [(0, 0), (0, 0), (0, l_pad - l)]
        qs = jnp.pad(qs, pad4)
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
        dout = jnp.pad(dout, pad4)
        lse = jnp.pad(lse, pad3)
        delta = jnp.pad(delta, pad3)
        if qseg is not None:
            qseg = jnp.pad(qseg, [(0, 0), (0, l_pad - l)])
            kseg = jnp.pad(kseg, [(0, 0), (0, l_pad - l)])

    hg = head_group
    g = h // hg
    bg = b * g

    if window is not None and _cdiv(block_q + 2 * window, block_k) + 1 <= 4 \
            and _cdiv(block_k + 2 * window, block_q) + 1 <= 4:
        dq, dk, dv = _window_fused_bwd(
            qs, k, v, dout, lse, delta, qseg, kseg, window, block_q, block_k, hg, l, l_pad
        )

        def unpack_f(x):
            return x.reshape(b, h, l_pad, d)[:, :, :l, :]

        return unpack_f(dq) * jnp.asarray(scale, q.dtype), unpack_f(dk), unpack_f(dv)

    def r4(x):
        return x.reshape(bg, hg, l_pad, d)

    def r3(x):
        return x.reshape(bg, hg, l_pad)

    qsf, kf, vf, dof = r4(qs), r4(k), r4(v), r4(dout)
    lsef, deltaf = r3(lse), r3(delta)

    nq = l_pad // block_q
    nk = l_pad // block_k
    if window is not None:
        nk_grid = min(nk, _cdiv(block_q + 2 * window, block_k) + 1)
        nq_grid = min(nq, _cdiv(block_k + 2 * window, block_q) + 1)
    else:
        nk_grid = nk
        nq_grid = nq

    # ---- dKV pass: grid (bg, nk, nq_grid); per-k-block q ranges (roles
    # swapped: interval intersection is symmetric)
    from .flash_attention import _block_ranges

    kv_start, kv_count = _block_ranges(b, nk, nq, nq_grid, block_k, block_q, window, kseg, qseg)

    def q_index_dkv(bgi, ki, qj, start_ref, count_ref):
        cnt = count_ref[bgi // g, ki]
        qb = start_ref[bgi // g, ki] + jnp.minimum(qj, jnp.maximum(cnt - 1, 0))
        return (bgi, 0, qb, 0)

    def q_index3_dkv(bgi, ki, qj, *s):
        idx = q_index_dkv(bgi, ki, qj, *s)
        return (idx[0], 0, idx[2])

    def k_index_dkv(bgi, ki, qj, *_):
        return (bgi, 0, ki, 0)

    dkv_specs = [
        pl.BlockSpec((1, hg, block_q, d), q_index_dkv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_k, d), k_index_dkv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_k, d), k_index_dkv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_q, d), q_index_dkv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_q), q_index3_dkv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_q), q_index3_dkv, memory_space=pltpu.VMEM),
    ]
    dkv_args = [qsf, kf, vf, dof, lsef, deltaf]
    if qseg is not None:
        dkv_specs.append(
            pl.BlockSpec((1, 1, block_q), lambda bgi, ki, qj, *s, _g=g: (bgi // _g, 0, q_index_dkv(bgi, ki, qj, *s)[2]), memory_space=pltpu.VMEM)
        )
        dkv_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda bgi, ki, qj, *_s, _g=g: (bgi // _g, 0, ki), memory_space=pltpu.VMEM)
        )
        dkv_args += [qseg.astype(jnp.int32)[:, None, :], kseg.astype(jnp.int32)[:, None, :]]
        dkv_kernel = functools.partial(
            _dkv_kernel, window=window, block_q=block_q, block_k=block_k,
            num_qb=nq, nq_grid=nq_grid, seq_len=l, groups_per_batch=g,
        )
    else:
        base = functools.partial(
            _dkv_kernel, window=window, block_q=block_q, block_k=block_k,
            num_qb=nq, nq_grid=nq_grid, seq_len=l, groups_per_batch=g,
        )
        dkv_kernel = lambda s0, c0, a, b_, c, d_, e, f, *rest: base(s0, c0, a, b_, c, d_, e, f, None, None, *rest)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bg, nk, nq_grid),
            in_specs=dkv_specs,
            out_specs=(
                pl.BlockSpec((1, hg, block_k, d), k_index_dkv, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hg, block_k, d), k_index_dkv, memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((hg, block_k, d), jnp.float32),
                pltpu.VMEM((hg, block_k, d), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bg, hg, l_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bg, hg, l_pad, d), q.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kv_start, kv_count, *dkv_args)

    # ---- dQ pass: grid (bg, nq, nk_grid)
    q_start, q_count = _block_ranges(b, nq, nk, nk_grid, block_q, block_k, window, qseg, kseg)

    def k_index_dq(bgi, qi, kj, start_ref, count_ref):
        cnt = count_ref[bgi // g, qi]
        kb = start_ref[bgi // g, qi] + jnp.minimum(kj, jnp.maximum(cnt - 1, 0))
        return (bgi, 0, kb, 0)

    def q_index_dq(bgi, qi, kj, *_):
        return (bgi, 0, qi, 0)

    def q_index3_dq(bgi, qi, kj, *_):
        return (bgi, 0, qi)

    dq_specs = [
        pl.BlockSpec((1, hg, block_q, d), q_index_dq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_k, d), k_index_dq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_k, d), k_index_dq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_q, d), q_index_dq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_q), q_index3_dq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_q), q_index3_dq, memory_space=pltpu.VMEM),
    ]
    dq_args = [qsf, kf, vf, dof, lsef, deltaf]
    if qseg is not None:
        dq_specs.append(
            pl.BlockSpec((1, 1, block_q), lambda bgi, qi, kj, *_s, _g=g: (bgi // _g, 0, qi), memory_space=pltpu.VMEM)
        )
        dq_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda bgi, qi, kj, *s, _g=g: (bgi // _g, 0, k_index_dq(bgi, qi, kj, *s)[2]), memory_space=pltpu.VMEM)
        )
        dq_args += [qseg.astype(jnp.int32)[:, None, :], kseg.astype(jnp.int32)[:, None, :]]
        dq_kernel = functools.partial(
            _dq_kernel, window=window, block_q=block_q, block_k=block_k,
            num_kb=nk, nk_grid=nk_grid, seq_len=l, groups_per_batch=g,
        )
    else:
        base_q = functools.partial(
            _dq_kernel, window=window, block_q=block_q, block_k=block_k,
            num_kb=nk, nk_grid=nk_grid, seq_len=l, groups_per_batch=g,
        )
        dq_kernel = lambda s0, c0, a, b_, c, d_, e, f, *rest: base_q(s0, c0, a, b_, c, d_, e, f, None, None, *rest)

    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bg, nq, nk_grid),
            in_specs=dq_specs,
            out_specs=pl.BlockSpec((1, hg, block_q, d), q_index_dq, memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((hg, block_q, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((bg, hg, l_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q_start, q_count, *dq_args)

    def unpack(x):
        return x.reshape(b, h, l_pad, d)[:, :, :l, :]

    dq = unpack(dq) * jnp.asarray(scale, q.dtype)  # undo the q pre-scaling chain rule
    return dq, unpack(dk), unpack(dv)
