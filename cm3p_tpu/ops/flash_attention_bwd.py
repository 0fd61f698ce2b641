"""Pallas backward kernels for flash attention (head-minor layout).

Standard two-kernel flash backward (dKV accumulates over query blocks, dQ
over key blocks), recomputing probabilities from saved logsumexp residuals
instead of materializing the O(L²) score matrix the XLA-recompute fallback
needs. Window / padding / segment masks mirror the forward kernel's
2-D-bias construction; block ranges are the window-intersection logic with
q/k roles swapped for dKV.

Layout matches the forward: q/k/v/do blocks are head-minor (1, block, H·D)
(contiguous, 128-lane-aligned DMAs — see flash_attention.py), heads are
lane-sliced in an unrolled in-kernel loop; lse/delta ride as (1, H, block).

Math (the forward saves a log2-sum-exp2 residual; by default the backward
also runs base-2 — q' = q · log2(e)/sqrt(d), p = exp2(q'·kᵀ + bias - lse2),
dk corrected by 1/log2(e) — exp2 is ~1.5x exp on the VPU and the head-minor
kernel structure no longer triggers the Mosaic crash the old layout did;
CM3P_BWD_EXP2=0 falls back to natural exp with lse converted once):
    p  = exp(q'·kᵀ + bias - lse)      [base-e form]
    dv = pᵀ · do
    ds = p ∘ (do·vᵀ - delta),  delta = rowsum(do ∘ out)
    dk = dsᵀ · q'
    dq = (ds · k) / sqrt(d)
"""
from __future__ import annotations

import functools
import os
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# The original (head-major) backward kernels SIGABRTed Mosaic when using
# exp2; the head-minor rewrite compiles and runs it fine on real v5e —
# measured fwd+bwd: global 28.5 -> 22.8 ms, local 11.9 -> 10.8 ms (B16).
# Base-2 backward: q pre-scaled by log2(e)/sqrt(d), lse kept base-2, dk
# rescaled by 1/log2(e); p is bit-equivalent math either way.
# CM3P_BWD_EXP2=0 restores the natural-exp form for A/B debugging.
BWD_EXP2 = os.environ.get("CM3P_BWD_EXP2", "1") != "0"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ------------------------------------------------------------ fused rope bwd
# Trainable in-kernel rope (VERDICT r2 next #4): with ``rope_theta`` the
# kernels receive RAW q/k plus the same cos/sin block tables the forward
# kernels use, rotate on load (q tables carry the score scale, so ``qs``
# pre-scaling is skipped), and counter-rotate dq/dk at finalize — deleting
# the XLA rope passes + rotated-copy HBM round trips the differentiated
# path paid in both directions. Math: with u = a·R_q(q), a = scale·log2(e)
# (or scale for BWD_EXP2=0) folded into the q tables, the kernel's
# X = p∘(dp−delta) is exactly dL/dŝ (natural-score gradient), so
#   dL/dq = scale·R_qᵀ(X·k_rot)   = counter_q(dq_scr) / log2(e)   [exp2]
#   dL/dk = scale·R_kᵀ(Xᵀ·u)     = counter_k(dk_scr) / log2(e)   [exp2]
# (counter_q uses the SCALED q tables, contributing the extra ``a``; the
# outer fixes become 1/log2(e), or exactly 1 in the natural-exp form).
# Rᵀ = −R for the rotate-half permutation and the sin table repeats across
# halves, so the transpose is y∘c − (y@R)∘s with the forward's own tables.


def _counter_rotate_store(acc, ct, st, r2, heads: int, d: int, out_ref):
    """Store ``counter_rotate(acc)`` per head: out = y∘c − (y@R_d)∘s.

    ``acc`` is the fp32 (block, H·D) accumulator; tables are (block, 2d)
    with identical halves, so the per-head (block, d) slices use the first
    half. Per-head 64-lane ops mirror the load path's lane slicing (a
    cross-head concat would need a lane-merging reshape Mosaic rejects)."""
    ct_h = ct[:, :d]
    st_h = st[:, :d]
    r_h = r2[:d, :d]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        y = acc[:, sl].astype(out_ref.dtype)
        yr = jax.lax.dot_general(
            y, r_h, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(y.dtype)
        out_ref[0, :, sl] = (y * ct_h - yr * st_h).astype(out_ref.dtype)


def _mask_bias2d(q_start, k_start, block_q, block_k, window, qseg, kseg, seq_len, need_bound):
    """(block_q, block_k) additive fp32 bias folding window/segment/bound masks."""
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
    return jnp.where(mask2d, 0.0, NEG_INF).astype(jnp.float32)


def _head_bwd_terms(qs_h, k_h, v_h, do_h, lse_h, delta_h, bias2d, acc_t):
    """Shared per-head backward math: returns (p, ds) as acc_t (bq, bk).

    With BWD_EXP2 the caller pre-scales q by log2(e)/sqrt(d) and keeps lse
    base-2, so scores land in log2 space and the transcendental is exp2
    (~1.5x exp on the VPU); p is identical either way."""
    s = jax.lax.dot_general(
        qs_h, k_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias2d is not None:
        s = s + bias2d
    if BWD_EXP2:
        p = jnp.exp2(s - lse_h[:, None])  # fp32 (bq, bk)
    else:
        p = jnp.exp(s - lse_h[:, None])  # fp32 (bq, bk)
    dp = jax.lax.dot_general(
        do_h, v_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta_h[:, None])).astype(acc_t)
    return p.astype(acc_t), ds


def _dkv_kernel(
    start_ref, count_ref,
    qs_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dk_ref, dv_ref, dk_scr, dv_scr,
    *, window, block_q, block_k, seq_len, heads, head_dim,
):
    bi = pl.program_id(0)
    ki = pl.program_id(1)
    qj = pl.program_id(2)
    cnt = count_ref[bi, ki]
    qb = start_ref[bi, ki] + jnp.minimum(qj, jnp.maximum(cnt - 1, 0))

    @pl.when(qj == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(qj < cnt)
    def _accumulate():
        qs = qs_ref[0]  # (bq, H*D) pre-scaled
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]  # (H, bq) fp32, natural units
        delta = delta_ref[0]
        acc_t = jnp.float32 if qs.dtype == jnp.float32 else jnp.bfloat16
        bias2d = _mask_bias2d(
            qb * block_q, ki * block_k, block_q, block_k, window,
            qseg_ref[0, 0] if qseg_ref is not None else None,
            kseg_ref[0, 0] if kseg_ref is not None else None,
            seq_len, kseg_ref is None,
        )
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            p, ds = _head_bwd_terms(qs[:, sl], k[:, sl], v[:, sl], do[:, sl], lse[h], delta[h], bias2d, acc_t)
            # dv += pᵀ · do : contract over bq
            dv_scr[:, sl] = dv_scr[:, sl] + jax.lax.dot_general(
                p, do[:, sl], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            # dk += dsᵀ · q' : contract over bq
            dk_scr[:, sl] = dk_scr[:, sl] + jax.lax.dot_general(
                ds, qs[:, sl], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

    @pl.when(qj == jnp.maximum(cnt, 1) - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _dq_kernel(
    start_ref, count_ref,
    qs_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, qseg_ref, kseg_ref,
    dq_ref, dq_scr,
    *, window, block_q, block_k, seq_len, heads, head_dim,
):
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
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
        bias2d = _mask_bias2d(
            qi * block_q, kb * block_k, block_q, block_k, window,
            qseg_ref[0, 0] if qseg_ref is not None else None,
            kseg_ref[0, 0] if kseg_ref is not None else None,
            seq_len, kseg_ref is None,
        )
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            _, ds = _head_bwd_terms(qs[:, sl], k[:, sl], v[:, sl], do[:, sl], lse[h], delta[h], bias2d, acc_t)
            # dq += ds · k : contract over bk
            dq_scr[:, sl] = dq_scr[:, sl] + jax.lax.dot_general(
                ds, k[:, sl], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

    @pl.when(kj == jnp.maximum(cnt, 1) - 1)
    def _finalize():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


# inner blocks per grid step in the unrolled global kernels
UNROLL = int(os.environ.get("CM3P_FA_UNROLL", "4"))


def _dq_unrolled_kernel(
    start_ref, count_ref,
    qs_ref, *rest,
    block_q: int, block_k: int, seq_len: int, heads: int, head_dim: int, unroll: int,
    fuse_rope: bool = False,
):
    """dQ for global/packed layers, ``unroll`` key blocks per grid step.

    Same rationale as the forward's _seg_unrolled_kernel: per-block steps pay
    ~3 dozen tiny per-head VPU ops; unrolling divides steps and the per-head
    scratch read-modify-writes by U. Blocks past ``count`` are clamped
    duplicates, excluded via the (t*U + j < count) mask term.
    Ref layout: qs, k*U, v*U, do, lse, delta, qseg, kseg*U
    [, qct, qst, kct*U, kst*U, r2], dq, dq_scr.
    """
    k_refs = rest[:unroll]
    v_refs = rest[unroll:2 * unroll]
    do_ref, lse_ref, delta_ref, qseg_ref = rest[2 * unroll:2 * unroll + 4]
    kseg_refs = rest[2 * unroll + 4:3 * unroll + 4]
    pos = 3 * unroll + 4
    if fuse_rope:
        qct_ref, qst_ref = rest[pos:pos + 2]
        kct_refs = rest[pos + 2:pos + 2 + unroll]
        kst_refs = rest[pos + 2 + unroll:pos + 2 + 2 * unroll]
        r2_ref = rest[pos + 2 + 2 * unroll]
        pos += 3 + 2 * unroll
    dq_ref = rest[pos]
    dq_scr = rest[pos + 1]

    bi = pl.program_id(0)
    qi = pl.program_id(1)
    t = pl.program_id(2)
    cnt = count_ref[bi, qi]
    outer = (cnt + unroll - 1) // unroll

    @pl.when(t == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(t < outer)
    def _accumulate():
        qs = qs_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]
        delta = delta_ref[0]
        acc_t = jnp.float32 if qs.dtype == jnp.float32 else jnp.bfloat16
        qseg = qseg_ref[0, 0]
        if fuse_rope:
            from .flash_attention import _rope_rotate_groups

            ngroups = heads // 2
            qrots = _rope_rotate_groups(qs, qct_ref[...], qst_ref[...], r2_ref, ngroups, head_dim)
            krots = [
                _rope_rotate_groups(k_refs[j][0], kct_refs[j][...], kst_refs[j][...], r2_ref, ngroups, head_dim)
                for j in range(unroll)
            ]

            def _qh(h):
                g, half = divmod(h, 2)
                return qrots[g][:, half * head_dim:(half + 1) * head_dim]

            def _kh(j, h):
                g, half = divmod(h, 2)
                return krots[j][g][:, half * head_dim:(half + 1) * head_dim]
        else:
            def _qh(h):
                return qs[:, h * head_dim:(h + 1) * head_dim]

            def _kh(j, h):
                return k_refs[j][0][:, h * head_dim:(h + 1) * head_dim]

        biases = []
        for j in range(unroll):
            kseg = kseg_refs[j][0, 0]
            seg_ok = jnp.logical_and(kseg[None, :] > 0, qseg[:, None] == kseg[None, :])
            valid = t * unroll + j < cnt
            biases.append(jnp.where(jnp.logical_and(seg_ok, valid), 0.0, NEG_INF).astype(jnp.float32))
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            dq = None
            for j in range(unroll):
                _, ds = _head_bwd_terms(
                    _qh(h), _kh(j, h), v_refs[j][0][:, sl], do[:, sl],
                    lse[h], delta[h], biases[j], acc_t,
                )
                contrib = jax.lax.dot_general(
                    ds, _kh(j, h), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                dq = contrib if dq is None else dq + contrib
            dq_scr[:, sl] = dq_scr[:, sl] + dq

    @pl.when(t == jnp.maximum(outer, 1) - 1)
    def _finalize():
        if fuse_rope:
            _counter_rotate_store(
                dq_scr[:], qct_ref[...], qst_ref[...], r2_ref[...], heads, head_dim, dq_ref
            )
        else:
            dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _dkv_unrolled_kernel(
    start_ref, count_ref,
    k_ref, v_ref, *rest,
    block_q: int, block_k: int, seq_len: int, heads: int, head_dim: int, unroll: int,
    fuse_rope: bool = False,
):
    """dK/dV for global/packed layers, ``unroll`` query blocks per grid step.

    Ref layout: k, v, qs*U, do*U, lse*U, delta*U, qseg*U, kseg
    [, kct, kst, qct*U, qst*U, r2], dk, dv, dk_scr, dv_scr.
    """
    qs_refs = rest[:unroll]
    do_refs = rest[unroll:2 * unroll]
    lse_refs = rest[2 * unroll:3 * unroll]
    delta_refs = rest[3 * unroll:4 * unroll]
    qseg_refs = rest[4 * unroll:5 * unroll]
    kseg_ref = rest[5 * unroll]
    pos = 5 * unroll + 1
    if fuse_rope:
        kct_ref, kst_ref = rest[pos:pos + 2]
        qct_refs = rest[pos + 2:pos + 2 + unroll]
        qst_refs = rest[pos + 2 + unroll:pos + 2 + 2 * unroll]
        r2_ref = rest[pos + 2 + 2 * unroll]
        pos += 3 + 2 * unroll
    dk_ref, dv_ref = rest[pos:pos + 2]
    dk_scr, dv_scr = rest[pos + 2:pos + 4]

    bi = pl.program_id(0)
    ki = pl.program_id(1)
    t = pl.program_id(2)
    cnt = count_ref[bi, ki]
    outer = (cnt + unroll - 1) // unroll

    @pl.when(t == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    @pl.when(t < outer)
    def _accumulate():
        k = k_ref[0]
        v = v_ref[0]
        acc_t = jnp.float32 if k.dtype == jnp.float32 else jnp.bfloat16
        kseg = kseg_ref[0, 0]
        if fuse_rope:
            from .flash_attention import _rope_rotate_groups

            ngroups = heads // 2
            krots = _rope_rotate_groups(k, kct_ref[...], kst_ref[...], r2_ref, ngroups, head_dim)
            qrots = [
                _rope_rotate_groups(qs_refs[j][0], qct_refs[j][...], qst_refs[j][...], r2_ref, ngroups, head_dim)
                for j in range(unroll)
            ]

            def _kh(h):
                g, half = divmod(h, 2)
                return krots[g][:, half * head_dim:(half + 1) * head_dim]

            def _qh(j, h):
                g, half = divmod(h, 2)
                return qrots[j][g][:, half * head_dim:(half + 1) * head_dim]
        else:
            def _kh(h):
                return k[:, h * head_dim:(h + 1) * head_dim]

            def _qh(j, h):
                return qs_refs[j][0][:, h * head_dim:(h + 1) * head_dim]

        biases = []
        for j in range(unroll):
            qseg = qseg_refs[j][0, 0]
            seg_ok = jnp.logical_and(kseg[None, :] > 0, qseg[:, None] == kseg[None, :])
            valid = t * unroll + j < cnt
            biases.append(jnp.where(jnp.logical_and(seg_ok, valid), 0.0, NEG_INF).astype(jnp.float32))
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            dk = None
            dv = None
            for j in range(unroll):
                qs_h = _qh(j, h)
                do_h = do_refs[j][0][:, sl]
                p, ds = _head_bwd_terms(
                    qs_h, _kh(h), v[:, sl], do_h,
                    lse_refs[j][0][h], delta_refs[j][0][h], biases[j], acc_t,
                )
                dvj = jax.lax.dot_general(
                    p, do_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                dkj = jax.lax.dot_general(
                    ds, qs_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )
                dk = dkj if dk is None else dk + dkj
                dv = dvj if dv is None else dv + dvj
            dk_scr[:, sl] = dk_scr[:, sl] + dk
            dv_scr[:, sl] = dv_scr[:, sl] + dv

    @pl.when(t == jnp.maximum(outer, 1) - 1)
    def _finalize():
        if fuse_rope:
            _counter_rotate_store(
                dk_scr[:], kct_ref[...], kst_ref[...], r2_ref[...], heads, head_dim, dk_ref
            )
        else:
            dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _dq_fused_kernel(
    qs_ref, *rest,
    window: int, block_q: int, block_k: int, num_kb: int, nblocks: int,
    seq_len: int, has_seg: bool, heads: int, head_dim: int, fuse_rope: bool = False,
):
    """Single-pass dQ for windowed layers: all key blocks in one grid step.

    Ref layout: qs, k*n, v*n, do, lse, delta[, qseg, kseg*n]
    [, qct, qst, kct*n, kst*n, r2], dq.
    """
    k_refs = rest[:nblocks]
    v_refs = rest[nblocks:2 * nblocks]
    do_ref, lse_ref, delta_ref = rest[2 * nblocks:2 * nblocks + 3]
    pos = 2 * nblocks + 3
    if has_seg:
        qseg_ref = rest[pos]
        kseg_refs = rest[pos + 1:pos + 1 + nblocks]
        pos += 1 + nblocks
    else:
        qseg_ref, kseg_refs = None, [None] * nblocks
    if fuse_rope:
        qct_ref, qst_ref = rest[pos:pos + 2]
        kct_refs = rest[pos + 2:pos + 2 + nblocks]
        kst_refs = rest[pos + 2 + nblocks:pos + 2 + 2 * nblocks]
        r2_ref = rest[pos + 2 + 2 * nblocks]
        pos += 3 + 2 * nblocks
    dq_ref = rest[pos]

    qi = pl.program_id(1)
    start_kb = jnp.clip((qi * block_q - window) // block_k, 0, num_kb - nblocks)
    qs = qs_ref[0]
    do = do_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]
    acc_t = jnp.float32 if qs.dtype == jnp.float32 else jnp.bfloat16

    if fuse_rope:
        from .flash_attention import _rope_rotate_groups

        ngroups = heads // 2
        qrots = _rope_rotate_groups(qs, qct_ref[...], qst_ref[...], r2_ref, ngroups, head_dim)
        krots = [
            _rope_rotate_groups(k_refs[j][0], kct_refs[j][...], kst_refs[j][...], r2_ref, ngroups, head_dim)
            for j in range(nblocks)
        ]

        def _qh(h):
            g, half = divmod(h, 2)
            return qrots[g][:, half * head_dim:(half + 1) * head_dim]

        def _kh(j, h):
            g, half = divmod(h, 2)
            return krots[j][g][:, half * head_dim:(half + 1) * head_dim]
    else:
        def _qh(h):
            return qs[:, h * head_dim:(h + 1) * head_dim]

        def _kh(j, h):
            return k_refs[j][0][:, h * head_dim:(h + 1) * head_dim]

    biases = [
        _mask_bias2d(
            qi * block_q, (start_kb + j) * block_k, block_q, block_k, window,
            qseg_ref[0, 0] if has_seg else None,
            kseg_refs[j][0, 0] if has_seg else None,
            seq_len, not has_seg,
        )
        for j in range(nblocks)
    ]
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        dq = None
        for j in range(nblocks):
            _, ds = _head_bwd_terms(
                _qh(h), _kh(j, h), v_refs[j][0][:, sl], do[:, sl],
                lse[h], delta[h], biases[j], acc_t,
            )
            contrib = jax.lax.dot_general(
                ds, _kh(j, h), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dq = contrib if dq is None else dq + contrib
        if fuse_rope:
            # counter-rotate this head's dq with the (scaled) q tables
            ct_h = qct_ref[...][:, :head_dim]
            st_h = qst_ref[...][:, :head_dim]
            y = dq.astype(dq_ref.dtype)
            yr = jax.lax.dot_general(
                y, r2_ref[...][:head_dim, :head_dim], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(y.dtype)
            dq_ref[0, :, sl] = (y * ct_h - yr * st_h).astype(dq_ref.dtype)
        else:
            dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)


def _dkv_fused_kernel(
    k_ref, v_ref, *rest,
    window: int, block_q: int, block_k: int, num_qb: int, nblocks: int,
    seq_len: int, has_seg: bool, heads: int, head_dim: int, fuse_rope: bool = False,
):
    """Single-pass dK/dV for windowed layers (q blocks unrolled).

    Ref layout: k, v, qs*n, do*n, lse*n, delta*n[, qseg*n, kseg]
    [, kct, kst, qct*n, qst*n, r2], dk, dv.
    """
    qs_refs = rest[:nblocks]
    do_refs = rest[nblocks:2 * nblocks]
    lse_refs = rest[2 * nblocks:3 * nblocks]
    delta_refs = rest[3 * nblocks:4 * nblocks]
    pos = 4 * nblocks
    if has_seg:
        qseg_refs = rest[pos:pos + nblocks]
        kseg_ref = rest[pos + nblocks]
        pos += nblocks + 1
    else:
        qseg_refs, kseg_ref = [None] * nblocks, None
    if fuse_rope:
        kct_ref, kst_ref = rest[pos:pos + 2]
        qct_refs = rest[pos + 2:pos + 2 + nblocks]
        qst_refs = rest[pos + 2 + nblocks:pos + 2 + 2 * nblocks]
        r2_ref = rest[pos + 2 + 2 * nblocks]
        pos += 3 + 2 * nblocks
    dk_ref, dv_ref = rest[pos:pos + 2]

    ki = pl.program_id(1)
    start_qb = jnp.clip((ki * block_k - window) // block_q, 0, num_qb - nblocks)
    k = k_ref[0]
    v = v_ref[0]
    acc_t = jnp.float32 if k.dtype == jnp.float32 else jnp.bfloat16

    if fuse_rope:
        from .flash_attention import _rope_rotate_groups

        ngroups = heads // 2
        krots = _rope_rotate_groups(k, kct_ref[...], kst_ref[...], r2_ref, ngroups, head_dim)
        qrots = [
            _rope_rotate_groups(qs_refs[j][0], qct_refs[j][...], qst_refs[j][...], r2_ref, ngroups, head_dim)
            for j in range(nblocks)
        ]

        def _kh(h):
            g, half = divmod(h, 2)
            return krots[g][:, half * head_dim:(half + 1) * head_dim]

        def _qh(j, h):
            g, half = divmod(h, 2)
            return qrots[j][g][:, half * head_dim:(half + 1) * head_dim]
    else:
        def _kh(h):
            return k[:, h * head_dim:(h + 1) * head_dim]

        def _qh(j, h):
            return qs_refs[j][0][:, h * head_dim:(h + 1) * head_dim]

    biases = [
        _mask_bias2d(
            (start_qb + j) * block_q, ki * block_k, block_q, block_k, window,
            qseg_refs[j][0, 0] if has_seg else None,
            kseg_ref[0, 0] if has_seg else None,
            seq_len, not has_seg,
        )
        for j in range(nblocks)
    ]
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        dk = None
        dv = None
        for j in range(nblocks):
            qs_h = _qh(j, h)
            do_h = do_refs[j][0][:, sl]
            p, ds = _head_bwd_terms(
                qs_h, _kh(h), v[:, sl], do_h, lse_refs[j][0][h], delta_refs[j][0][h],
                biases[j], acc_t,
            )
            dvj = jax.lax.dot_general(
                p, do_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dkj = jax.lax.dot_general(
                ds, qs_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dk = dkj if dk is None else dk + dkj
            dv = dvj if dv is None else dv + dvj
        if fuse_rope:
            ct_h = kct_ref[...][:, :head_dim]
            st_h = kst_ref[...][:, :head_dim]
            y = dk.astype(dk_ref.dtype)
            yr = jax.lax.dot_general(
                y, r2_ref[...][:head_dim, :head_dim], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(y.dtype)
            dk_ref[0, :, sl] = (y * ct_h - yr * st_h).astype(dk_ref.dtype)
        else:
            dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _window_fused_bwd(qs, k, v, dout, lse, delta, qseg, kseg, window, block_q, block_k,
                      heads, head_dim, l, l_pad, rope=None):
    """Single-pass windowed backward dispatcher (both passes, grid (b, n)).

    lse/delta arrive (B, h_pad, l_pad) with h_pad 8-aligned; segments arrive
    (B, 1, l_pad) so every block keeps TPU-legal (8, 128) tiling.
    ``rope``: optional (qcos, qsin, kcos, ksin, r2) tables for in-kernel
    rotation of RAW q/k + counter-rotation of dq/dk (see module comment)."""
    b = qs.shape[0]
    hd = qs.shape[2]
    h_pad = lse.shape[1]
    nq = l_pad // block_q
    nk = l_pad // block_k
    nkb = min(nk, _cdiv(block_q + 2 * window, block_k) + 1)
    nqb = min(nq, _cdiv(block_k + 2 * window, block_q) + 1)
    has_seg = qseg is not None

    def kix(j):
        return lambda bi, qi, _j=j: (
            bi, jnp.clip((qi * block_q - window) // block_k, 0, nk - nkb) + _j, 0
        )

    def kix2(j):
        return lambda bi, qi, _j=j: (
            bi, 0, jnp.clip((qi * block_q - window) // block_k, 0, nk - nkb) + _j
        )

    def qix_dkv(j):
        return lambda bi, ki, _j=j: (
            bi, jnp.clip((ki * block_k - window) // block_q, 0, nq - nqb) + _j, 0
        )

    def qix3_dkv(j):
        return lambda bi, ki, _j=j: (
            bi, 0, jnp.clip((ki * block_k - window) // block_q, 0, nq - nqb) + _j
        )

    def qix2_dkv(j):
        return lambda bi, ki, _j=j: (
            bi, 0, jnp.clip((ki * block_k - window) // block_q, 0, nq - nqb) + _j
        )

    # ---- dQ pass: grid (b, nq)
    specs = [pl.BlockSpec((1, block_q, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM)]
    args = [qs]
    for j in range(nkb):
        specs.append(pl.BlockSpec((1, block_k, hd), kix(j), memory_space=pltpu.VMEM))
        args.append(k)
    for j in range(nkb):
        specs.append(pl.BlockSpec((1, block_k, hd), kix(j), memory_space=pltpu.VMEM))
        args.append(v)
    specs += [
        pl.BlockSpec((1, block_q, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_pad, block_q), lambda bi, qi: (bi, 0, qi), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_pad, block_q), lambda bi, qi: (bi, 0, qi), memory_space=pltpu.VMEM),
    ]
    args += [dout, lse, delta]
    if has_seg:
        specs.append(pl.BlockSpec((1, 1, block_q), lambda bi, qi: (bi, 0, qi), memory_space=pltpu.VMEM))
        args.append(qseg)
        for j in range(nkb):
            specs.append(pl.BlockSpec((1, 1, block_k), kix2(j), memory_space=pltpu.VMEM))
            args.append(kseg)
    if rope is not None:
        qcos, qsin, kcos, ksin, r2 = rope
        d2 = 2 * head_dim

        def ktab(j):
            return lambda bi, qi, _j=j: (
                jnp.clip((qi * block_q - window) // block_k, 0, nk - nkb) + _j, 0
            )

        for tab in (qcos, qsin):
            specs.append(pl.BlockSpec((block_q, d2), lambda bi, qi: (qi, 0), memory_space=pltpu.VMEM))
            args.append(tab)
        for tab in (kcos, ksin):
            for j in range(nkb):
                specs.append(pl.BlockSpec((block_k, d2), ktab(j), memory_space=pltpu.VMEM))
                args.append(tab)
        specs.append(pl.BlockSpec((d2, d2), lambda bi, qi: (0, 0), memory_space=pltpu.VMEM))
        args.append(r2)
    dq = pl.pallas_call(
        functools.partial(
            _dq_fused_kernel, window=window, block_q=block_q, block_k=block_k,
            num_kb=nk, nblocks=nkb, seq_len=l, has_seg=has_seg, heads=heads, head_dim=head_dim,
            fuse_rope=rope is not None,
        ),
        grid=(b, nq),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, block_q, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, hd), qs.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(*args)

    # ---- dKV pass: grid (b, nk)
    specs = [
        pl.BlockSpec((1, block_k, hd), lambda bi, ki: (bi, ki, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, hd), lambda bi, ki: (bi, ki, 0), memory_space=pltpu.VMEM),
    ]
    args = [k, v]
    for j in range(nqb):
        specs.append(pl.BlockSpec((1, block_q, hd), qix_dkv(j), memory_space=pltpu.VMEM))
        args.append(qs)
    for j in range(nqb):
        specs.append(pl.BlockSpec((1, block_q, hd), qix_dkv(j), memory_space=pltpu.VMEM))
        args.append(dout)
    for j in range(nqb):
        specs.append(pl.BlockSpec((1, h_pad, block_q), qix3_dkv(j), memory_space=pltpu.VMEM))
        args.append(lse)
    for j in range(nqb):
        specs.append(pl.BlockSpec((1, h_pad, block_q), qix3_dkv(j), memory_space=pltpu.VMEM))
        args.append(delta)
    if has_seg:
        for j in range(nqb):
            specs.append(pl.BlockSpec((1, 1, block_q), qix2_dkv(j), memory_space=pltpu.VMEM))
            args.append(qseg)
        specs.append(pl.BlockSpec((1, 1, block_k), lambda bi, ki: (bi, 0, ki), memory_space=pltpu.VMEM))
        args.append(kseg)
    if rope is not None:
        qcos, qsin, kcos, ksin, r2 = rope
        d2 = 2 * head_dim

        def qtab(j):
            return lambda bi, ki, _j=j: (
                jnp.clip((ki * block_k - window) // block_q, 0, nq - nqb) + _j, 0
            )

        for tab in (kcos, ksin):
            specs.append(pl.BlockSpec((block_k, d2), lambda bi, ki: (ki, 0), memory_space=pltpu.VMEM))
            args.append(tab)
        for tab in (qcos, qsin):
            for j in range(nqb):
                specs.append(pl.BlockSpec((block_q, d2), qtab(j), memory_space=pltpu.VMEM))
                args.append(tab)
        specs.append(pl.BlockSpec((d2, d2), lambda bi, ki: (0, 0), memory_space=pltpu.VMEM))
        args.append(r2)
    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_fused_kernel, window=window, block_q=block_q, block_k=block_k,
            num_qb=nq, nblocks=nqb, seq_len=l, has_seg=has_seg, heads=heads, head_dim=head_dim,
            fuse_rope=rope is not None,
        ),
        grid=(b, nk),
        in_specs=specs,
        out_specs=(
            pl.BlockSpec((1, block_k, hd), lambda bi, ki: (bi, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda bi, ki: (bi, ki, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l_pad, hd), qs.dtype),
            jax.ShapeDtypeStruct((b, l_pad, hd), qs.dtype),
        ),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
    )(*args)
    return dq, dk, dv


def _global_unrolled_bwd(qs, k, v, dout, lse, delta, qseg, kseg, block_q, block_k,
                         heads, head_dim, l, l_pad, rope=None):
    """Both backward passes for global/packed layers with U-unrolled steps.

    qs/k/v/dout: (B, l_pad, H·D); lse/delta (B, h_pad, l_pad) natural units;
    qseg/kseg (B, 1, l_pad) int32. ``rope``: optional
    (qcos, qsin, kcos, ksin, r2) tables — see module comment."""
    from .flash_attention import _block_ranges

    b = qs.shape[0]
    hd = qs.shape[2]
    h_pad = lse.shape[1]
    # the rope tables (~670 KB at U=4/block 256) pushed the in-situ train
    # graph 752 KB past the 16 MB scoped-vmem stack at L=4096 (r12 arm D2;
    # the standalone smoke shape fit — scoped-vmem limits are shape-
    # dependent, CLAUDE.md). One less unrolled block frees ~900 KB.
    unroll = UNROLL if rope is None else max(2, UNROLL - 1)
    nq = l_pad // block_q
    nk = l_pad // block_k
    qseg2d = qseg[:, 0, :]
    kseg2d = kseg[:, 0, :]

    # ---- dQ pass: grid (b, nq, cdiv(nk, U))
    q_start, q_count = _block_ranges(b, nq, nk, nk, block_q, block_k, None, qseg2d, kseg2d)

    def kb_index(j):
        def index(bi, qi, t, start_ref, count_ref, _j=j):
            cnt = count_ref[bi, qi]
            kb = start_ref[bi, qi] + jnp.minimum(t * unroll + _j, jnp.maximum(cnt - 1, 0))
            return (bi, kb, 0)

        return index

    def kseg_index(j):
        def index(bi, qi, t, start_ref, count_ref, _j=j):
            cnt = count_ref[bi, qi]
            kb = start_ref[bi, qi] + jnp.minimum(t * unroll + _j, jnp.maximum(cnt - 1, 0))
            return (bi, 0, kb)

        return index

    specs = [pl.BlockSpec((1, block_q, hd), lambda bi, qi, t, *_: (bi, qi, 0), memory_space=pltpu.VMEM)]
    args = [qs]
    for j in range(unroll):
        specs.append(pl.BlockSpec((1, block_k, hd), kb_index(j), memory_space=pltpu.VMEM))
        args.append(k)
    for j in range(unroll):
        specs.append(pl.BlockSpec((1, block_k, hd), kb_index(j), memory_space=pltpu.VMEM))
        args.append(v)
    specs += [
        pl.BlockSpec((1, block_q, hd), lambda bi, qi, t, *_: (bi, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_pad, block_q), lambda bi, qi, t, *_: (bi, 0, qi), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_pad, block_q), lambda bi, qi, t, *_: (bi, 0, qi), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_q), lambda bi, qi, t, *_: (bi, 0, qi), memory_space=pltpu.VMEM),
    ]
    args += [dout, lse, delta, qseg]
    for j in range(unroll):
        specs.append(pl.BlockSpec((1, 1, block_k), kseg_index(j), memory_space=pltpu.VMEM))
        args.append(kseg)
    if rope is not None:
        qcos, qsin, kcos, ksin, r2 = rope
        d2 = 2 * head_dim

        def ktab_index(j):
            def index(bi, qi, t, start_ref, count_ref, _j=j):
                cnt = count_ref[bi, qi]
                kb = start_ref[bi, qi] + jnp.minimum(t * unroll + _j, jnp.maximum(cnt - 1, 0))
                return (kb, 0)

            return index

        for tab in (qcos, qsin):
            specs.append(pl.BlockSpec((block_q, d2), lambda bi, qi, t, *_: (qi, 0), memory_space=pltpu.VMEM))
            args.append(tab)
        for tab in (kcos, ksin):
            for j in range(unroll):
                specs.append(pl.BlockSpec((block_k, d2), ktab_index(j), memory_space=pltpu.VMEM))
                args.append(tab)
        specs.append(pl.BlockSpec((d2, d2), lambda bi, qi, t, *_: (0, 0), memory_space=pltpu.VMEM))
        args.append(r2)

    dq = pl.pallas_call(
        functools.partial(
            _dq_unrolled_kernel, block_q=block_q, block_k=block_k,
            seq_len=l, heads=heads, head_dim=head_dim, unroll=unroll,
            fuse_rope=rope is not None,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nq, _cdiv(nk, unroll)),
            in_specs=specs,
            out_specs=pl.BlockSpec((1, block_q, hd), lambda bi, qi, t, *_: (bi, qi, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, hd), qs.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q_start, q_count, *args)

    # ---- dKV pass: grid (b, nk, cdiv(nq, U)); roles swapped
    kv_start, kv_count = _block_ranges(b, nk, nq, nq, block_k, block_q, None, kseg2d, qseg2d)

    def qb_index(j):
        def index(bi, ki, t, start_ref, count_ref, _j=j):
            cnt = count_ref[bi, ki]
            qb = start_ref[bi, ki] + jnp.minimum(t * unroll + _j, jnp.maximum(cnt - 1, 0))
            return (bi, qb, 0)

        return index

    def qb3_index(j):
        def index(bi, ki, t, start_ref, count_ref, _j=j):
            cnt = count_ref[bi, ki]
            qb = start_ref[bi, ki] + jnp.minimum(t * unroll + _j, jnp.maximum(cnt - 1, 0))
            return (bi, 0, qb)

        return index

    specs = [
        pl.BlockSpec((1, block_k, hd), lambda bi, ki, t, *_: (bi, ki, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, hd), lambda bi, ki, t, *_: (bi, ki, 0), memory_space=pltpu.VMEM),
    ]
    args = [k, v]
    for j in range(unroll):
        specs.append(pl.BlockSpec((1, block_q, hd), qb_index(j), memory_space=pltpu.VMEM))
        args.append(qs)
    for j in range(unroll):
        specs.append(pl.BlockSpec((1, block_q, hd), qb_index(j), memory_space=pltpu.VMEM))
        args.append(dout)
    for j in range(unroll):
        specs.append(pl.BlockSpec((1, h_pad, block_q), qb3_index(j), memory_space=pltpu.VMEM))
        args.append(lse)
    for j in range(unroll):
        specs.append(pl.BlockSpec((1, h_pad, block_q), qb3_index(j), memory_space=pltpu.VMEM))
        args.append(delta)
    for j in range(unroll):
        specs.append(pl.BlockSpec((1, 1, block_q), qb3_index(j), memory_space=pltpu.VMEM))
        args.append(qseg)
    specs.append(pl.BlockSpec((1, 1, block_k), lambda bi, ki, t, *_: (bi, 0, ki), memory_space=pltpu.VMEM))
    args.append(kseg)
    if rope is not None:
        qcos, qsin, kcos, ksin, r2 = rope
        d2 = 2 * head_dim

        def qtab_index(j):
            def index(bi, ki, t, start_ref, count_ref, _j=j):
                cnt = count_ref[bi, ki]
                qb = start_ref[bi, ki] + jnp.minimum(t * unroll + _j, jnp.maximum(cnt - 1, 0))
                return (qb, 0)

            return index

        for tab in (kcos, ksin):
            specs.append(pl.BlockSpec((block_k, d2), lambda bi, ki, t, *_: (ki, 0), memory_space=pltpu.VMEM))
            args.append(tab)
        for tab in (qcos, qsin):
            for j in range(unroll):
                specs.append(pl.BlockSpec((block_q, d2), qtab_index(j), memory_space=pltpu.VMEM))
                args.append(tab)
        specs.append(pl.BlockSpec((d2, d2), lambda bi, ki, t, *_: (0, 0), memory_space=pltpu.VMEM))
        args.append(r2)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_unrolled_kernel, block_q=block_q, block_k=block_k,
            seq_len=l, heads=heads, head_dim=head_dim, unroll=unroll,
            fuse_rope=rope is not None,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nk, _cdiv(nq, unroll)),
            in_specs=specs,
            out_specs=(
                pl.BlockSpec((1, block_k, hd), lambda bi, ki, t, *_: (bi, ki, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, hd), lambda bi, ki, t, *_: (bi, ki, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, hd), jnp.float32),
                pltpu.VMEM((block_k, hd), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l_pad, hd), qs.dtype),
            jax.ShapeDtypeStruct((b, l_pad, hd), qs.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kv_start, kv_count, *args)
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
    heads: int,
    rope_theta: Optional[float] = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compute (dq, dk, dv) with the two-kernel flash backward.

    q/k/v/out/dout: (B, L, H*D) head-minor; lse: (B, H, L) base-2.
    ``rope_theta``: q/k arrive RAW; the production kernels rotate in-kernel
    and counter-rotate dq/dk (see the fused-rope module comment); paths
    without in-kernel support fall back to an XLA rotate + counter-rotate
    with identical semantics."""
    b, l, hd = q.shape
    d = hd // heads
    scale = 1.0 / math.sqrt(d)

    # in-kernel rope applies on the window-fused and global-unrolled routes
    wf_cond = window is not None and _cdiv(block_q + 2 * window, block_k) + 1 <= 4 \
        and _cdiv(block_k + 2 * window, block_q) + 1 <= 4
    kernel_rope = (
        rope_theta is not None and d == 64 and heads % 2 == 0
        and (wf_cond or window is None)
        # fp32 + the U-unrolled global kernels + rope tables crashes Mosaic
        # (tpu_compile_helper exit 1, deterministic — r12 smoke 2026-08-20,
        # same family as the fp32 fused-FFN crash); bf16 is the production
        # training dtype and compiles fine. fp32 global falls back to the
        # XLA rotate + counter-rotate path with identical semantics.
        and not (q.dtype == jnp.float32 and window is None)
    )
    xla_rope_theta = None
    if rope_theta is not None and not kernel_rope:
        from .flash_attention import _apply_rope_xla

        q = _apply_rope_xla(q, rope_theta, d)
        k = _apply_rope_xla(k, rope_theta, d)
        xla_rope_theta = rope_theta  # counter-rotate dq/dk at the end

    if kernel_rope:
        # scale (and log2e) fold into the q rope tables; counter-rotation
        # with the scaled tables adds another factor, so dq's outer fix
        # becomes 1/log2e (exp2) or exactly 1 (natural) — see module comment
        qs = q
        dq_fix = 1.0 / math.log2(math.e) if BWD_EXP2 else 1.0
        if not BWD_EXP2:
            lse = lse * math.log(2.0)
    elif BWD_EXP2:
        # scores stay in log2 space: pre-fold log2(e) into q, keep the
        # base-2 lse; dk picks up a log2(e) factor (it contracts against
        # the scaled q), undone at the end
        qs = q * jnp.asarray(scale * math.log2(math.e), q.dtype)
        dq_fix = scale
    else:
        qs = q * jnp.asarray(scale, q.dtype)
        lse = lse * math.log(2.0)  # forward residual is base-2; convert once
        dq_fix = scale

    if window is None and qseg is None:
        # Mosaic (libtpu 2026-xx) crashes in ApplyVectorLayout compiling the
        # mask-free global variant of these kernels; all-ones segments are
        # semantically identical and take the (stable) segmented codepath
        qseg = kseg = jnp.ones((b, l), jnp.int32)

    # delta = rowsum(do ∘ out) per head: (B, H, L), head dim padded to an
    # 8-aligned sublane count so lse/delta blocks keep TPU-legal tiling
    h_pad = _cdiv(heads, 8) * 8
    delta = jnp.swapaxes(
        jnp.sum((dout.astype(jnp.float32) * out.astype(jnp.float32)).reshape(b, l, heads, d), axis=-1),
        1, 2,
    )
    if h_pad != heads:
        delta = jnp.pad(delta, [(0, 0), (0, h_pad - heads), (0, 0)])
        lse = jnp.pad(lse, [(0, 0), (0, h_pad - heads), (0, 0)])

    block = max(block_q, block_k)
    l_pad = _cdiv(l, block) * block
    if l_pad != l:
        pad3 = [(0, 0), (0, l_pad - l), (0, 0)]
        padr = [(0, 0), (0, 0), (0, l_pad - l)]
        qs = jnp.pad(qs, pad3)
        k = jnp.pad(k, pad3)
        v = jnp.pad(v, pad3)
        dout = jnp.pad(dout, pad3)
        lse = jnp.pad(lse, padr)
        delta = jnp.pad(delta, padr)
        if qseg is not None:
            qseg = jnp.pad(qseg, [(0, 0), (0, l_pad - l)])
            kseg = jnp.pad(kseg, [(0, 0), (0, l_pad - l)])
    if qseg is not None:
        # (B, 1, L) layout keeps the TPU block tiling legal: block (1, 1, Bk)
        qseg = qseg.astype(jnp.int32)[:, None, :]
        kseg = kseg.astype(jnp.int32)[:, None, :]

    rope = None
    if kernel_rope:
        from .flash_attention import _r2_matrix, _rope_tables

        a = scale * (math.log2(math.e) if BWD_EXP2 else 1.0)
        qcos, qsin = _rope_tables(l_pad, d, rope_theta, q.dtype, a)
        kcos, ksin = _rope_tables(l_pad, d, rope_theta, q.dtype, 1.0)
        rope = (qcos, qsin, kcos, ksin, _r2_matrix(d, q.dtype))

    def _finish(dq, dk, dv):
        dk_fix = 1.0 / math.log2(math.e) if BWD_EXP2 else 1.0
        dq = dq[:, :l, :] * jnp.asarray(dq_fix, q.dtype) if dq_fix != 1.0 else dq[:, :l, :]
        dk = dk[:, :l, :] * jnp.asarray(dk_fix, q.dtype) if BWD_EXP2 else dk[:, :l, :]
        if xla_rope_theta is not None:
            from .flash_attention import _counter_rotate

            dq = _counter_rotate(dq, xla_rope_theta, d)
            dk = _counter_rotate(dk, xla_rope_theta, d)
        return dq, dk, dv[:, :l, :]

    if wf_cond:
        return _finish(*_window_fused_bwd(
            qs, k, v, dout, lse, delta, qseg, kseg, window, block_q, block_k, heads, d, l, l_pad,
            rope=rope,
        ))

    if window is None:
        # global/packed path (qseg is always non-None here: the prologue
        # synthesizes all-ones segments): U-unrolled kernels
        return _finish(*_global_unrolled_bwd(
            qs, k, v, dout, lse, delta, qseg, kseg, block_q, block_k, heads, d, l, l_pad,
            rope=rope,
        ))

    nq = l_pad // block_q
    nk = l_pad // block_k
    if window is not None:
        nk_grid = min(nk, _cdiv(block_q + 2 * window, block_k) + 1)
        nq_grid = min(nq, _cdiv(block_k + 2 * window, block_q) + 1)
    else:
        nk_grid = nk
        nq_grid = nq

    # ---- dKV pass: grid (b, nk, nq_grid); per-k-block q ranges (roles
    # swapped: interval intersection is symmetric)
    from .flash_attention import _block_ranges

    kv_start, kv_count = _block_ranges(b, nk, nq, nq_grid, block_k, block_q, window, kseg, qseg)

    def q_index_dkv(bi, ki, qj, start_ref, count_ref):
        cnt = count_ref[bi, ki]
        qb = start_ref[bi, ki] + jnp.minimum(qj, jnp.maximum(cnt - 1, 0))
        return (bi, qb, 0)

    def q_index3_dkv(bi, ki, qj, *s):
        idx = q_index_dkv(bi, ki, qj, *s)
        return (idx[0], 0, idx[1])

    def k_index_dkv(bi, ki, qj, *_):
        return (bi, ki, 0)

    dkv_specs = [
        pl.BlockSpec((1, block_q, hd), q_index_dkv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, hd), k_index_dkv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, hd), k_index_dkv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, hd), q_index_dkv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_pad, block_q), q_index3_dkv, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_pad, block_q), q_index3_dkv, memory_space=pltpu.VMEM),
    ]
    dkv_args = [qs, k, v, dout, lse, delta]
    base = functools.partial(
        _dkv_kernel, window=window, block_q=block_q, block_k=block_k,
        seq_len=l, heads=heads, head_dim=d,
    )
    if qseg is not None:
        dkv_specs.append(
            pl.BlockSpec((1, 1, block_q), lambda bi, ki, qj, *s: (bi, 0, q_index_dkv(bi, ki, qj, *s)[1]), memory_space=pltpu.VMEM)
        )
        dkv_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda bi, ki, qj, *_s: (bi, 0, ki), memory_space=pltpu.VMEM)
        )
        dkv_args += [qseg, kseg]
        dkv_kernel = base
    else:
        dkv_kernel = lambda s0, c0, a, b_, c, d_, e, f, *rest: base(s0, c0, a, b_, c, d_, e, f, None, None, *rest)

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nk, nq_grid),
            in_specs=dkv_specs,
            out_specs=(
                pl.BlockSpec((1, block_k, hd), k_index_dkv, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_k, hd), k_index_dkv, memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, hd), jnp.float32),
                pltpu.VMEM((block_k, hd), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b, l_pad, hd), q.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kv_start, kv_count, *dkv_args)

    # ---- dQ pass: grid (b, nq, nk_grid)
    q_start, q_count = _block_ranges(b, nq, nk, nk_grid, block_q, block_k, window, qseg, kseg)

    def k_index_dq(bi, qi, kj, start_ref, count_ref):
        cnt = count_ref[bi, qi]
        kb = start_ref[bi, qi] + jnp.minimum(kj, jnp.maximum(cnt - 1, 0))
        return (bi, kb, 0)

    def q_index_dq(bi, qi, kj, *_):
        return (bi, qi, 0)

    def q_index3_dq(bi, qi, kj, *_):
        return (bi, 0, qi)

    dq_specs = [
        pl.BlockSpec((1, block_q, hd), q_index_dq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, hd), k_index_dq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, hd), k_index_dq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_q, hd), q_index_dq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_pad, block_q), q_index3_dq, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h_pad, block_q), q_index3_dq, memory_space=pltpu.VMEM),
    ]
    dq_args = [qs, k, v, dout, lse, delta]
    base_q = functools.partial(
        _dq_kernel, window=window, block_q=block_q, block_k=block_k,
        seq_len=l, heads=heads, head_dim=d,
    )
    if qseg is not None:
        dq_specs.append(
            pl.BlockSpec((1, 1, block_q), lambda bi, qi, kj, *_s: (bi, 0, qi), memory_space=pltpu.VMEM)
        )
        dq_specs.append(
            pl.BlockSpec((1, 1, block_k), lambda bi, qi, kj, *s: (bi, 0, k_index_dq(bi, qi, kj, *s)[1]), memory_space=pltpu.VMEM)
        )
        dq_args += [qseg, kseg]
        dq_kernel = base_q
    else:
        dq_kernel = lambda s0, c0, a, b_, c, d_, e, f, *rest: base_q(s0, c0, a, b_, c, d_, e, f, None, None, *rest)

    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nq, nk_grid),
            in_specs=dq_specs,
            out_specs=pl.BlockSpec((1, block_q, hd), q_index_dq, memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q_start, q_count, *dq_args)

    dq = dq[:, :l, :] * jnp.asarray(dq_fix, q.dtype)  # undo the q pre-scaling chain rule
    dk = dk[:, :l, :]
    if BWD_EXP2:
        dk = dk * jnp.asarray(1.0 / math.log2(math.e), q.dtype)
    if xla_rope_theta is not None:
        from .flash_attention import _counter_rotate

        dq = _counter_rotate(dq, xla_rope_theta, d)
        dk = _counter_rotate(dk, xla_rope_theta, d)
    return dq, dk, dv[:, :l, :]
