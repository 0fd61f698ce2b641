"""Pallas TPU flash attention with sliding-window and padding masks.

The compute-critical kernel of the framework (SURVEY.md §7 "Pallas
local/global attention"). Replaces the reference's flash-attn-2 varlen path
(``modeling_cm3p.py:65-134``) with a TPU-native design:

* static padded shapes + key-padding mask instead of varlen unpadding
* online-softmax streaming over key blocks (O(L) memory)
* **local layers only visit key blocks that intersect the window**: for a
  query block at rows [qs, qs+Bq) and one-sided window ``w``, only key blocks
  overlapping [qs-w, qs+Bq+w) are loaded — attention cost drops from O(L²)
  to O(L·w), which is the dominant win for ModernBERT-style encoders where
  2 of every 3 layers are local.
* fp32 accumulation and softmax statistics over bf16 inputs; head-group
  batching amortizes grid/DMA overhead at head_dim 64
* packed sequences via integer segment IDs (0 = padding), masked in-kernel
* rectangular Lq != Lk support (sequence-parallel allgather-KV shards)
* fused Pallas backward (flash_attention_bwd.py) through ``jax.custom_vjp``
  with saved logsumexp residuals; a dense XLA recompute fallback remains
  behind ``BACKWARD_MODE = "xla"``.
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


def _fa_kernel(
    start_ref,
    count_ref,
    q_ref,
    k_ref,
    v_ref,
    qseg_ref,
    kseg_ref,
    out_ref,
    lse_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    window: Optional[int],
    block_q: int,
    block_k: int,
    num_kb: int,
    nk_grid: int,
    seq_len: int,
    head_group: int,
    groups_per_batch: int,
):
    """Online-softmax attention over a group of ``head_group`` heads.

    Batching heads into one grid step amortizes grid/DMA overhead, which
    dominates at head_dim 64 (measured 4.6µs/step vs ~1µs compute on v5e).
    Block shapes: q/k/v (1, hg, block, D); scratch m/l (hg, block_q),
    acc (hg, block_q, D).

    ``start_ref``/``count_ref`` (B, nq) int32 scalar-prefetch arrays give the
    key-block range each query block must visit — the window's span for
    local layers, and the **segment-intersection span for global layers over
    packed rows**: cross-segment attention is masked anyway, so a global
    layer only needs the key blocks whose segment-id interval intersects the
    query block's. Steps past ``count`` re-fetch the previous block (the
    pipeline elides the DMA) and skip all compute.
    """
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    bi = pl.program_id(0) // groups_per_batch
    cnt = count_ref[bi, qi]
    kb = start_ref[bi, qi] + jnp.minimum(kj, jnp.maximum(cnt - 1, 0))

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(kj < cnt)
    def _accumulate():
        q = q_ref[0]  # (hg, block_q, D) — pre-scaled by 1/sqrt(D) outside
        k = k_ref[0]  # (hg, block_k, D)
        v = v_ref[0]

        # batched QK^T over the head group. Scores/probs stay in the input
        # dtype (bf16 in production): the elementwise softmax passes over
        # (hg, bq, bk) dominate this kernel's runtime, and halving their
        # width is a direct win; max/sum statistics accumulate in fp32.
        acc_t = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(acc_t)  # MXU must accumulate fp32; narrow once for the VPU chain

        # one 2-D additive bias folds every mask (window / padding /
        # segments); building it costs (bq, bk)-sized work once, and
        # applying it is a single (hg, bq, bk) pass — the VPU, not the MXU,
        # is this kernel's bottleneck at head_dim 64.
        bias2d = None
        if window is not None:
            rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask2d = jnp.abs(rows - cols) <= window
        else:
            mask2d = None
        if kseg_ref is not None:
            # segment semantics: key must be non-padding (seg > 0) and in
            # the same segment as the query; plain key-padding masks are
            # encoded as qseg=1 / kseg=mask. Padded tails have kseg=0, so
            # the cols < seq_len bound is subsumed.
            kseg = kseg_ref[0, 0]
            qseg = qseg_ref[0, 0]
            seg_ok = jnp.logical_and(kseg[None, :] > 0, qseg[:, None] == kseg[None, :])
            mask2d = seg_ok if mask2d is None else jnp.logical_and(mask2d, seg_ok)
        elif window is None:
            cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask2d = cols < seq_len
        elif seq_len % block_k != 0:
            cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask2d = jnp.logical_and(mask2d, cols < seq_len)

        if mask2d is not None:
            # select in fp32 layout, then cast: Mosaic cannot relayout an i1
            # vector from fp32 (8,128) tiling to bf16 (16,128) tiling
            bias2d = jnp.where(mask2d, 0.0, NEG_INF).astype(acc_t)
            s = s + bias2d[None, :, :]

        m_prev = m_scr[:]  # (hg, block_q) fp32
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1).astype(jnp.float32))
        # fully-masked rows have m_new <= NEG_INF (finite!): pin the shift to
        # 0 there so exp2(s - m) underflows to 0 instead of exp2(0) = 1
        m_safe = jnp.where(m_new < NEG_INF * 0.5, 0.0, m_new)
        # base-2 softmax: log2(e) is folded into the q-scale, so the VPU
        # evaluates exp2 (~1.5x the throughput of exp on TPU)
        p = jnp.exp2(s - m_safe[:, :, None].astype(acc_t))  # masked entries underflow to 0
        alpha = jnp.where(m_prev < NEG_INF * 0.5, 0.0, jnp.exp2(m_prev - m_safe))

        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=-1, dtype=jnp.float32)
        # batched PV: (hg, block_q, block_k) @ (hg, block_k, D)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # fp32 accumulate
        acc_scr[:] = acc_scr[:] * alpha[:, :, None] + pv
        m_scr[:] = m_new

    @pl.when(kj == jnp.maximum(cnt, 1) - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:], 1e-30)
        out_ref[0] = (acc_scr[:] / denom[:, :, None]).astype(out_ref.dtype)
        # log2-sum-exp2 residual for the Pallas backward; fully-masked rows
        # get a moderately negative value so exp2(s - lse) underflows to 0
        m_safe = jnp.where(m_scr[:] < NEG_INF * 0.5, 0.0, m_scr[:])
        lse_ref[0] = m_safe + jnp.log2(denom)


def _pick_head_group(h: int, block_q: int, block_k: int, d: int, itemsize: int = 2) -> int:
    """Largest head group keeping the fp32 score block under ~4.5 MB VMEM.

    fp32 inputs double the q/k/v/out block footprints (double-buffered by the
    pipeline), so the budget is halved — bf16-calibrated hg=12 at 256x256
    blocks overflows the 16 MB scoped-vmem limit by ~2 MB in fp32.
    """
    budget = 4_500_000 if itemsize <= 2 else 2_250_000
    hg = max(1, budget // (block_q * block_k * 4))
    while hg > 1 and h % hg != 0:
        hg -= 1
    return min(hg, h)



def _block_ranges(b, nq, num_kb, nk_grid, block_q, block_k, window, qseg, kseg):
    """Per-(batch, q-block) key-block [start, start+count) visit ranges.

    Local layers: the window span (count == nk_grid always). Global layers
    with segments: the span of key blocks whose segment-id interval
    intersects the query block's — sound for arbitrary segment ids (interval
    intersection over-approximates membership) and exact for the contiguous
    ascending ids that pack_windows emits. Padding (seg 0) blocks never
    intersect, so key-padding tails are skipped too. Over packed rows this
    turns the global layers' O(L^2) into O(L * max_segment_len): measured
    2.6x on the packed-extraction global layers (BASELINE.md).
    """
    if window is not None:
        qi_idx = jnp.arange(nq, dtype=jnp.int32)
        start_row = jnp.clip((qi_idx * block_q - window) // block_k, 0, num_kb - nk_grid)
        start = jnp.broadcast_to(start_row[None, :], (b, nq))
        count = jnp.full((b, nq), nk_grid, jnp.int32)
        return start.astype(jnp.int32), count
    if qseg is None:
        return (
            jnp.zeros((b, nq), jnp.int32),
            jnp.full((b, nq), num_kb, jnp.int32),
        )
    big = jnp.int32(2**30)
    qsb = qseg.reshape(b, nq, block_q)
    qmin = jnp.min(jnp.where(qsb > 0, qsb, big), axis=2)
    qmax = jnp.max(jnp.where(qsb > 0, qsb, 0), axis=2)
    ksb = kseg.reshape(b, num_kb, block_k)
    kmin = jnp.min(jnp.where(ksb > 0, ksb, big), axis=2)
    kmax = jnp.max(jnp.where(ksb > 0, ksb, 0), axis=2)
    needed = (
        (qmin[:, :, None] <= kmax[:, None, :])
        & (kmin[:, None, :] <= qmax[:, :, None])
        & (qmax[:, :, None] > 0)
        & (kmax[:, None, :] > 0)
    )  # (b, nq, num_kb)
    any_needed = needed.any(axis=2)
    first = jnp.argmax(needed, axis=2).astype(jnp.int32)
    last = (num_kb - 1) - jnp.argmax(needed[:, :, ::-1], axis=2).astype(jnp.int32)
    start = jnp.where(any_needed, first, 0)
    count = jnp.where(any_needed, last - first + 1, 0)
    return start.astype(jnp.int32), count.astype(jnp.int32)


def _window_fused_kernel(
    q_ref, *rest,
    window: int, block_q: int, block_k: int, num_kb: int,
    nblocks: int, seq_len: int, has_seg: bool,
):
    """Single-pass windowed attention: all key blocks in one grid step.

    Local layers visit only ``nblocks`` (typically 3) key blocks per query
    block, so unrolling them into one step removes the online-softmax
    rescale chain AND 2/3 of the grid steps — per-step overhead (~4.6 us)
    was ~40% of the streaming kernel's runtime at w=64 on v5e.
    Ref layout: q, k*nblocks, v*nblocks[, qseg, kseg*nblocks], out, lse.
    """
    k_refs = rest[:nblocks]
    v_refs = rest[nblocks:2 * nblocks]
    if has_seg:
        qseg_ref = rest[2 * nblocks]
        kseg_refs = rest[2 * nblocks + 1:3 * nblocks + 1]
        out_ref, lse_ref = rest[3 * nblocks + 1:3 * nblocks + 3]
    else:
        qseg_ref, kseg_refs = None, [None] * nblocks
        out_ref, lse_ref = rest[2 * nblocks:2 * nblocks + 2]

    qi = pl.program_id(1)
    start_kb = jnp.clip((qi * block_q - window) // block_k, 0, num_kb - nblocks)
    q = q_ref[0]  # (hg, bq, D) pre-scaled
    acc_t = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    ss, ms = [], []
    for j in range(nblocks):
        s = jax.lax.dot_general(
            q, k_refs[j][0], (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ).astype(acc_t)
        cols = (start_kb + j) * block_k + col0
        mask2d = jnp.abs(rows - cols) <= window
        if has_seg:
            kseg = kseg_refs[j][0, 0]
            qseg = qseg_ref[0, 0]
            mask2d = jnp.logical_and(
                mask2d, jnp.logical_and(kseg[None, :] > 0, qseg[:, None] == kseg[None, :])
            )
        elif seq_len % block_k != 0:
            mask2d = jnp.logical_and(mask2d, cols < seq_len)
        s = s + jnp.where(mask2d, 0.0, NEG_INF).astype(acc_t)[None, :, :]
        ss.append(s)
        ms.append(jnp.max(s, axis=-1).astype(jnp.float32))

    m = ms[0]
    for j in range(1, nblocks):
        m = jnp.maximum(m, ms[j])
    m_safe = jnp.where(m < NEG_INF * 0.5, 0.0, m)

    l = None
    acc = None
    for j in range(nblocks):
        p = jnp.exp2(ss[j] - m_safe[:, :, None].astype(acc_t))
        lj = jnp.sum(p, axis=-1, dtype=jnp.float32)
        pv = jax.lax.dot_general(
            p.astype(v_refs[j].dtype), v_refs[j][0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        l = lj if l is None else l + lj
        acc = pv if acc is None else acc + pv
    l = jnp.maximum(l, 1e-30)
    out_ref[0] = (acc / l[:, :, None]).astype(out_ref.dtype)
    lse_ref[0] = m_safe + jnp.log2(l)


def _window_fused_fwd(q, k, v, qseg, kseg, window, block_q, block_k, return_lse):
    """Dispatcher for the single-pass windowed kernel (lq == lk)."""
    b, h, l, d = q.shape
    q = q * jnp.asarray(math.log2(math.e) / math.sqrt(d), q.dtype)
    l_pad = _cdiv(l, block_q) * block_q
    if l_pad % block_k:
        l_pad = _cdiv(l_pad, block_k) * block_k
    if l_pad != l:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, l_pad - l), (0, 0)])
        k = jnp.pad(k, [(0, 0), (0, 0), (0, l_pad - l), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, 0), (0, l_pad - l), (0, 0)])
        if qseg is not None:
            qseg = jnp.pad(qseg, [(0, 0), (0, l_pad - l)])
            kseg = jnp.pad(kseg, [(0, 0), (0, l_pad - l)])
    num_kb = l_pad // block_k
    nq = l_pad // block_q
    nblocks = min(num_kb, _cdiv(block_q + 2 * window, block_k) + 1)

    hg = _pick_head_group(h, block_q, block_k * nblocks, d, q.dtype.itemsize)
    g = h // hg
    bg = b * g
    qf = q.reshape(bg, hg, l_pad, d)
    kf = k.reshape(bg, hg, l_pad, d)
    vf = v.reshape(bg, hg, l_pad, d)

    def kix(j):
        return lambda bgi, qi, _j=j: (
            bgi, 0, jnp.clip((qi * block_q - window) // block_k, 0, num_kb - nblocks) + _j, 0
        )

    in_specs = [pl.BlockSpec((1, hg, block_q, d), lambda bgi, qi: (bgi, 0, qi, 0), memory_space=pltpu.VMEM)]
    args = [qf]
    for j in range(nblocks):
        in_specs.append(pl.BlockSpec((1, hg, block_k, d), kix(j), memory_space=pltpu.VMEM))
        args.append(kf)
    for j in range(nblocks):
        in_specs.append(pl.BlockSpec((1, hg, block_k, d), kix(j), memory_space=pltpu.VMEM))
        args.append(vf)
    has_seg = qseg is not None
    if has_seg:
        in_specs.append(pl.BlockSpec(
            (1, 1, block_q), lambda bgi, qi, _g=g: (bgi // _g, 0, qi), memory_space=pltpu.VMEM))
        args.append(qseg.astype(jnp.int32)[:, None, :])
        ksegf = kseg.astype(jnp.int32)[:, None, :]
        for j in range(nblocks):
            in_specs.append(pl.BlockSpec(
                (1, 1, block_k),
                lambda bgi, qi, _j=j, _g=g: (
                    bgi // _g, 0,
                    jnp.clip((qi * block_q - window) // block_k, 0, num_kb - nblocks) + _j,
                ),
                memory_space=pltpu.VMEM))
            args.append(ksegf)

    kernel = functools.partial(
        _window_fused_kernel, window=window, block_q=block_q, block_k=block_k,
        num_kb=num_kb, nblocks=nblocks, seq_len=l, has_seg=has_seg,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(bg, nq),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, hg, block_q, d), lambda bgi, qi: (bgi, 0, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hg, block_q), lambda bgi, qi: (bgi, 0, qi), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bg, hg, l_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bg, hg, l_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * l_pad * nblocks * block_k * d,
            bytes_accessed=(b * h * l_pad * d * 4) * q.dtype.itemsize,
            transcendentals=b * h * l_pad * nblocks * block_k,
        ),
    )(*args)
    out = out.reshape(b, h, l_pad, d)[:, :, :l, :]
    if return_lse:
        return out, lse.reshape(b, h, l_pad)[:, :, :l], hg
    return out


def _flash_attention_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    qseg: Optional[jnp.ndarray],
    kseg: Optional[jnp.ndarray],
    window: Optional[int],
    block_q: int,
    block_k: int,
    return_lse: bool = False,
):
    b, h, lq, d = q.shape
    lk = k.shape[2]
    if window is not None and lq != lk:
        raise ValueError("windowed attention requires equal q/k lengths")
    if window is not None and _cdiv(block_q + 2 * window, block_k) + 1 <= 4:
        return _window_fused_fwd(q, k, v, qseg, kseg, window, block_q, block_k, return_lse)
    # fold both the softmax scale and log2(e) into q: scores land in log2
    # space so the kernel's transcendental is exp2, not exp
    q = q * jnp.asarray(math.log2(math.e) / math.sqrt(d), q.dtype)

    lq_pad = _cdiv(lq, block_q) * block_q
    lk_pad = _cdiv(lk, block_k) * block_k
    if window is not None:
        lq_pad = lk_pad = max(lq_pad, lk_pad)
    if lq_pad != lq:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, lq_pad - lq), (0, 0)])
        if qseg is not None:
            qseg = jnp.pad(qseg, [(0, 0), (0, lq_pad - lq)])
    if lk_pad != lk:
        pad = [(0, 0), (0, 0), (0, lk_pad - lk), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if kseg is not None:
            kseg = jnp.pad(kseg, [(0, 0), (0, lk_pad - lk)])

    hg = _pick_head_group(h, block_q, block_k, d, q.dtype.itemsize)
    groups_per_batch = h // hg
    bg = b * groups_per_batch
    qf = q.reshape(bg, hg, lq_pad, d)
    kf = k.reshape(bg, hg, lk_pad, d)
    vf = v.reshape(bg, hg, lk_pad, d)

    nq = lq_pad // block_q
    num_kb = lk_pad // block_k
    if window is not None:
        nk_grid = min(num_kb, _cdiv(block_q + 2 * window, block_k) + 1)
    else:
        nk_grid = num_kb

    kernel = functools.partial(
        _fa_kernel,
        window=window,
        block_q=block_q,
        block_k=block_k,
        num_kb=num_kb,
        nk_grid=nk_grid,
        seq_len=lk,
        head_group=hg,
        groups_per_batch=groups_per_batch,
    )

    start_arr, count_arr = _block_ranges(
        b, nq, num_kb, nk_grid, block_q, block_k, window, qseg, kseg
    )

    def k_index(bgi, qi, kj, start_ref, count_ref):
        cnt = count_ref[bgi // groups_per_batch, qi]
        kb = start_ref[bgi // groups_per_batch, qi] + jnp.minimum(kj, jnp.maximum(cnt - 1, 0))
        return (bgi, 0, kb, 0)

    in_specs = [
        pl.BlockSpec((1, hg, block_q, d), lambda bgi, qi, kj, *_: (bgi, 0, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_k, d), k_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, block_k, d), k_index, memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf]
    if qseg is not None:
        # (B, 1, L) layout keeps the TPU block tiling legal: block (1, 1, Bk)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_q),
                lambda bgi, qi, kj, *_s, _g=groups_per_batch: (bgi // _g, 0, qi),
                memory_space=pltpu.VMEM,
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_k),
                lambda bgi, qi, kj, *_s, _g=groups_per_batch: (
                    bgi // _g, 0, k_index(bgi, qi, kj, *_s)[2]
                ),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(qseg.astype(jnp.int32)[:, None, :])
        args.append(kseg.astype(jnp.int32)[:, None, :])
        wrapped = kernel
    else:
        wrapped = lambda s_ref, c_ref, q_ref, k_ref, v_ref, *rest: kernel(
            s_ref, c_ref, q_ref, k_ref, v_ref, None, None, *rest
        )

    out, lse = pl.pallas_call(
        wrapped,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bg, nq, nk_grid),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(
                    (1, hg, block_q, d), lambda bgi, qi, kj, *_: (bgi, 0, qi, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, hg, block_q), lambda bgi, qi, kj, *_: (bgi, 0, qi), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((hg, block_q), jnp.float32),
                pltpu.VMEM((hg, block_q), jnp.float32),
                pltpu.VMEM((hg, block_q, d), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bg, hg, lq_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bg, hg, lq_pad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * lq_pad * (min(lk_pad, (2 * (window or lk_pad))) * d),
            bytes_accessed=(b * h * (lq_pad + 2 * lk_pad) * d + b * h * lq_pad * d) * q.dtype.itemsize,
            transcendentals=b * h * lq_pad * min(lk_pad, 2 * (window or lk_pad)),
        ),
    )(start_arr, count_arr, *args)

    out = out.reshape(b, h, lq_pad, d)[:, :, :lq, :]
    if return_lse:
        return out, lse.reshape(b, h, lq_pad)[:, :, :lq], hg
    return out


def _xla_reference(q, k, v, qseg, kseg, window):
    """Dense-mask attention used for the recompute backward + parity tests."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) / math.sqrt(d)
    l = q.shape[2]
    mask = jnp.ones((l, l), bool)
    if window is not None:
        idx = jnp.arange(l)
        mask = jnp.abs(idx[:, None] - idx[None, :]) <= window
    mask = mask[None, None]
    if kseg is not None:
        mask = jnp.logical_and(mask, kseg[:, None, None, :] > 0)
        mask = jnp.logical_and(mask, qseg[:, None, :, None] == kseg[:, None, None, :])
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_attention(q, k, v, qseg, kseg, window, block_q, block_k):
    return _flash_attention_fwd_impl(q, k, v, qseg, kseg, window, block_q, block_k)


def _fwd(q, k, v, qseg, kseg, window, block_q, block_k):
    out, lse, hg = _flash_attention_fwd_impl(
        q, k, v, qseg, kseg, window, block_q, block_k, return_lse=True
    )
    return out, (q, k, v, qseg, kseg, out, lse, hg)


BACKWARD_MODE = "pallas"  # "pallas" (fused kernels) or "xla" (dense recompute)


def _bwd(window, block_q, block_k, res, g):
    q, k, v, qseg, kseg, out, lse, hg = res
    if BACKWARD_MODE == "pallas":
        from .flash_attention_bwd import flash_attention_bwd

        dq, dk, dv = flash_attention_bwd(
            q, k, v, qseg, kseg, out, lse, g, window, block_q, block_k, hg
        )
        return dq, dk, dv, None, None
    # dense recompute fallback (materializes O(L²) scores)
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, qseg, kseg, window), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None, None


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    window: Optional[int] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    block_q: int = 256,
    block_k: int = 256,
) -> jnp.ndarray:
    """Flash attention over (B, H, L, D) tensors.

    Args:
        bias: optional additive (B, 1, 1, L) key-padding bias (0 / -inf style);
            converted to a boolean key mask.
        key_mask: optional (B, L) 0/1 mask (alternative to ``bias``).
        window: one-sided local-attention radius; ``None`` = global.
        segment_ids: optional (B, L) int segments for packed sequences
            (0 = padding, >0 = segment index); attention stays within a
            segment — the TPU-native replacement for FA2 varlen unpadding.
    """
    if key_mask is None and bias is not None:
        key_mask = (bias.reshape(bias.shape[0], bias.shape[-1]) >= -0.5).astype(jnp.int32)

    if segment_ids is not None:
        kseg = segment_ids.astype(jnp.int32)
        if key_mask is not None:
            kseg = jnp.where(key_mask > 0, kseg, 0)
        qseg = kseg
    elif key_mask is not None:
        # qseg sized by the QUERY length: in the rectangular allgather-KV
        # path key_mask spans the full gathered key axis while q is a shard
        qseg = jnp.ones((q.shape[0], q.shape[2]), jnp.int32)
        kseg = key_mask.astype(jnp.int32)
    else:
        qseg = kseg = None

    if window is None and qseg is None:
        # Mosaic (libtpu 2026-xx) crashes in ApplyVectorLayout on some
        # mask-free global variants of the kernel (fp32 / small head
        # groups); all-ones segments are semantically identical and take
        # the well-exercised segmented codepath
        qseg = kseg = jnp.ones(q.shape[:1] + q.shape[2:3], jnp.int32)

    l = q.shape[2]
    block_q = min(block_q, max(128, 1 << (l - 1).bit_length()))
    block_q = min(block_q, 512)
    block_k = min(block_k, block_q)
    return _flash_attention(q, k, v, qseg, kseg, window, block_q, block_k)
