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
* **head-minor (B, L, H, D) layout**: q/k/v blocks are (1, block, H·D) —
  fully contiguous with a 128-lane-aligned minor dim. The previous
  (B, H, L, 64) layout half-filled every VMEM tile (minor dim 64) and
  fragmented DMAs per head, capping HBM at ~170 GB/s vs ~640 GB/s head-minor
  (measured, tools/bench_dma.py); the kernels were ~92 % DMA-bound
  (tools/bench_kernel_anatomy.py). Heads are lane-sliced in-kernel — each
  head's 64 lanes sit inside a single 128-lane tile, which Mosaic supports
  (an in-kernel moveaxis to batched-head layout does NOT compile).
* fp32 accumulation and softmax statistics over bf16 inputs
* packed sequences via integer segment IDs (0 = padding), masked in-kernel
* rectangular Lq != Lk support (sequence-parallel allgather-KV shards)
* fused Pallas backward (flash_attention_bwd.py) through ``jax.custom_vjp``
  with saved logsumexp residuals; a dense XLA recompute fallback remains
  behind ``BACKWARD_MODE = "xla"``.
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

from .fused_ffn import _quant_rows_int8, quantize_weight_int8

NEG_INF = -1e30

# Fixed-shift softmax for the single-pass kernels (window-fused and
# seg-unrolled): instead of tracking the running row max, shift scores by a
# constant power of two — exp2(s - SHIFT) = exp2(s) * 2^-SHIFT exactly, the
# scale cancels in acc / l, and lse = log2(l) + SHIFT is the same value, so
# this is mathematically identical to the max-stabilized form while deleting
# the per-head max/alpha/rescale chain (~30% of the kernels' tiny-op count).
# Safety: scores are clamped at SOFTMAX_CLAMP (log2 units; exp2(100) within
# bf16/fp32 range with the fp32 l/pv accumulators) — reachable only beyond
# natural logits of ~80, far outside trained-LN activations; a clamped row
# degrades to equal weights instead of overflowing. The backward never uses
# the max (it recomputes p from lse), so only forward internals change.
# CM3P_FA_ONLINE_MAX=1 restores the running-max form.
#
# Tail bounds of the fixed-shift form vs online-max (ADVICE r1 #2/#3):
# * UNDERFLOW: p = exp2(s - 16) flushes to zero below the smallest bf16
#   subnormal 2^-133, i.e. for log2-scores s < -117 (natural logits < -81).
#   A row whose EVERY unmasked score is that negative outputs zeros where
#   online-max would renormalize exactly — the same +-81-logit band as the
#   overflow clamp, unreachable for LayerNormed activations (|q·k|/sqrt(d)
#   stays under ~40 even at init). Rows with at least one ordinary score
#   are unaffected (the tiny terms are below bf16 resolution of the sum).
# * CLAMP/GRADIENT CONSISTENCY: the backward recomputes p = exp2(s - lse)
#   WITHOUT the forward's clamp, so for rows in the clamped regime
#   (log2-scores > 116) gradients follow the unclamped softmax rather than
#   the clamped primal. This is an accepted mismatch confined to the same
#   unreachable band — documented rather than paid for with an extra
#   min() pass per backward step.
SOFTMAX_SHIFT = 16.0
SOFTMAX_CLAMP = 116.0
ONLINE_MAX = os.environ.get("CM3P_FA_ONLINE_MAX") == "1"

# Wo-epilogue fusion (out-projection + residual inside the kernel finalize).
# Default OFF until validated on real TPU — flip after tools/tpu_smoke.py
# passes the wo variants and bench.py A/Bs it (same rollout as CM3P_W8A8).
FUSED_WO_ENABLED = os.environ.get("CM3P_FUSED_WO", "0") == "1"

# W8A8 for the fused Wo epilogue: per-row int8 quant of the VMEM-resident
# attention output + int8 Wo (per-output-channel scales). Completes the int8
# dense stack alongside CM3P_W8A8 (QKV/Wi) and CM3P_W8A8_WO (FFN Wo).
# No-grad primal only; requires CM3P_FUSED_WO.
FUSED_WO_Q = os.environ.get("CM3P_FUSED_WO_Q", "0") == "1"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _acc_t(x):
    return jnp.float32 if x.dtype == jnp.float32 else jnp.bfloat16


# ---------------------------------------------------------------- fused rope
# Rotary embedding fused into the kernels: q/k arrive RAW and are rotated on
# the VMEM-resident blocks — two muls + an add + one (128,128) block-diagonal
# rotate-half matmul per two-head lane group (full MXU depth). This deletes
# the standalone XLA rope pass and its q/k HBM round trip: measured net
# -3.3 ms/layer (local) / -4.3 ms/layer (global) at B64·L4096·H12 on v5e
# (tools/bench_r2_attn.py E5, 2026-08). Valid only for head_dim 64 (two
# 64-lane heads tile one 128-lane group) and default arange positions; other
# cases fall back to an XLA rope pass in the dispatcher.


def _rope_tables(l: int, d: int, theta: float, dtype, scale: float = 1.0):
    """[cos|cos], [sin|sin] tables tiled to the 2-head (2d) lane group."""
    import numpy as np

    inv_freq = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    freqs = np.arange(l)[:, None] * inv_freq[None, :]
    emb = np.concatenate([freqs, freqs], axis=1)  # (L, d)
    cos = np.tile(np.cos(emb) * scale, (1, 2))  # (L, 2d)
    sin = np.tile(np.sin(emb) * scale, (1, 2))
    return jnp.asarray(cos, dtype), jnp.asarray(sin, dtype)


def _rot_matrix(d: int):
    """(d, d) rotate-half permutation R with x @ R == rotate_half(x)."""
    import numpy as np

    half = d // 2
    r = np.zeros((d, d), np.float32)
    r[np.arange(half) + half, np.arange(half)] = -1.0
    r[np.arange(half), np.arange(half) + half] = 1.0
    return r


def _r2_matrix(d: int, dtype):
    """(2d, 2d) block-diagonal rotate-half for the two-head lane group."""
    import numpy as np

    r = _rot_matrix(d)
    r2 = np.zeros((2 * d, 2 * d), np.float32)
    r2[:d, :d] = r
    r2[d:, d:] = r
    return jnp.asarray(r2, dtype)


def _rope_rotate_groups(x, ct, st, r2_ref, ngroups: int, d: int):
    """In-kernel: rotate all heads of an (rows, H*D) tile, 2 heads per group."""
    out = []
    for g in range(ngroups):
        sl = slice(g * 2 * d, (g + 1) * 2 * d)
        xg = x[:, sl]
        xr = jax.lax.dot_general(
            xg, r2_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out.append(xg * ct + xr * st)
    return out


def _apply_rope_xla(x, theta: float, d: int, scale: float = 1.0):
    """XLA fallback: rope over head-minor (B, L, H*D) with arange positions."""
    b, l, hd = x.shape
    h = hd // d
    cos2, sin2 = _rope_tables(l, d, theta, x.dtype, scale)
    cos = cos2[:, :d][None, :, None, :]
    sin = sin2[:, :d][None, :, None, :]
    r = jnp.asarray(_rot_matrix(d), x.dtype)
    x4 = x.reshape(b, l, h, d)
    dn = (((3,), (0,)), ((), ()))
    x4 = x4 * cos + jax.lax.dot_general(x4, r, dn, preferred_element_type=x.dtype) * sin
    return x4.reshape(b, l, hd)


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
    seq_len: int,
    heads: int,
    head_dim: int,
    with_lse: bool = True,
):
    """Streaming online-softmax attention, one (q-block, k-block) per step.

    Head-minor blocks: q (1, bq, H·D), k/v (1, bk, H·D); the head loop is
    unrolled in-kernel over lane slices. Scratch: m/l (H, bq) fp32 running
    max/denominator, acc (bq, H·D) fp32.

    ``start_ref``/``count_ref`` (B, nq) int32 scalar-prefetch arrays give the
    key-block range each query block must visit — the window's span for
    local layers, and the **segment-intersection span for global layers over
    packed rows**: cross-segment attention is masked anyway, so a global
    layer only needs the key blocks whose segment-id interval intersects the
    query block's. Steps past ``count`` re-fetch the previous block (the
    pipeline elides the DMA) and skip all compute.
    """
    bi = pl.program_id(0)
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    cnt = count_ref[bi, qi]
    kb = start_ref[bi, qi] + jnp.minimum(kj, jnp.maximum(cnt - 1, 0))

    @pl.when(kj == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(kj < cnt)
    def _accumulate():
        q = q_ref[0]  # (bq, H*D) — pre-scaled by log2(e)/sqrt(D) outside
        k = k_ref[0]
        v = v_ref[0]
        acc_t = _acc_t(q)

        # one 2-D additive bias folds every mask (window / padding /
        # segments); built once per step and shared by every head.
        mask2d = None
        if window is not None:
            rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            mask2d = jnp.abs(rows - cols) <= window
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

        bias2d = None
        if mask2d is not None:
            bias2d = jnp.where(mask2d, 0.0, NEG_INF).astype(acc_t)

        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            s = jax.lax.dot_general(
                q[:, sl], k[:, sl], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ).astype(acc_t)  # (bq, bk); MXU accumulates fp32, narrow once for the VPU chain
            if bias2d is not None:
                s = s + bias2d

            m_prev = m_scr[h]  # (bq,) fp32
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1).astype(jnp.float32))
            # fully-masked rows have m_new <= NEG_INF (finite!): pin the
            # shift to 0 there so exp2(s - m) underflows instead of exp2(0)=1
            m_safe = jnp.where(m_new < NEG_INF * 0.5, 0.0, m_new)
            # base-2 softmax: log2(e) folded into the q-scale, so the VPU
            # evaluates exp2 (~1.5x the throughput of exp on TPU)
            p = jnp.exp2(s - m_safe[:, None].astype(acc_t))
            alpha = jnp.where(m_prev < NEG_INF * 0.5, 0.0, jnp.exp2(m_prev - m_safe))

            l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=-1, dtype=jnp.float32)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[:, sl] = acc_scr[:, sl] * alpha[:, None] + pv
            m_scr[h] = m_new

    @pl.when(kj == jnp.maximum(cnt, 1) - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:], 1e-30)  # (H, bq)
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            out_ref[0, :, sl] = (acc_scr[:, sl] / denom[h][:, None]).astype(out_ref.dtype)
        # log2-sum-exp2 residual for the Pallas backward; fully-masked rows
        # get a moderately negative value so exp2(s - lse) underflows to 0.
        # lse block is (1, h_pad, bq) with h_pad 8-aligned >= heads: one
        # sublane-range store of the real head rows, padding rows are
        # sliced away outside. Skipped on no-grad forwards (with_lse=False),
        # like the fused paths (ADVICE r1 #4).
        if with_lse:
            m_safe = jnp.where(m_scr[:] < NEG_INF * 0.5, 0.0, m_scr[:])
            lse_ref[0, 0:heads] = m_safe + jnp.log2(denom)


def _window_fused_kernel(
    q_ref, *rest,
    window: int, block_q: int, block_k: int, num_kb: int,
    nblocks: int, seq_len: int, has_seg: bool, heads: int, head_dim: int,
    with_lse: bool = True,
    fuse_rope: bool = False,
    fuse_wo: bool = False,
    wo_q: bool = False,
):
    """Single-pass windowed attention: all key blocks in one grid step.

    Local layers visit only ``nblocks`` (typically 3) key blocks per query
    block, so unrolling them into one step removes the online-softmax
    rescale chain AND 2/3 of the grid steps — per-step overhead was ~40 %
    of the streaming kernel's runtime at w=64 on v5e.
    Ref layout: q, k*nblocks, v*nblocks[, qseg, kseg*nblocks]
    [, qcos, qsin, kcos*nblocks, ksin*nblocks, r2][, wo, res[, swo]], out,
    lse[, o_scr].
    With ``fuse_rope`` q/k arrive RAW (softmax scale folded into the q
    tables) and are rotated in-kernel — see the fused-rope block comment.
    With ``fuse_wo`` the attention output never reaches HBM: the kernel
    applies the out-projection epilogue ``res + o @ wo`` on the
    VMEM-resident block (no-grad primal only; mutually exclusive with
    ``with_lse``). With ``wo_q`` the epilogue dot runs int8×int8→int32
    (``wo`` arrives pre-quantized, per-row activation quant in-kernel).
    """
    k_refs = rest[:nblocks]
    v_refs = rest[nblocks:2 * nblocks]
    if has_seg:
        qseg_ref = rest[2 * nblocks]
        kseg_refs = rest[2 * nblocks + 1:3 * nblocks + 1]
        pos = 3 * nblocks + 1
    else:
        qseg_ref, kseg_refs = None, [None] * nblocks
        pos = 2 * nblocks
    if fuse_rope:
        qct_ref, qst_ref = rest[pos:pos + 2]
        kct_refs = rest[pos + 2:pos + 2 + nblocks]
        kst_refs = rest[pos + 2 + nblocks:pos + 2 + 2 * nblocks]
        r2_ref = rest[pos + 2 + 2 * nblocks]
        pos += 3 + 2 * nblocks
    if fuse_wo:
        wo_ref, res_ref = rest[pos:pos + 2]
        pos += 2
        swo_ref = None
        if wo_q:
            swo_ref = rest[pos]
            pos += 1
    # the lse residual (12 per-row stores + a log2 pass per step) costs
    # ~6.5 ms/layer at B64 — measured via tools/bench_headstack_kernel.py —
    # and is only needed when a backward will run; the no-grad path drops it
    if with_lse:
        out_ref, lse_ref = rest[pos:pos + 2]
    else:
        out_ref, lse_ref = rest[pos], None
    o_scr = rest[pos + (2 if with_lse else 1)] if fuse_wo else None

    qi = pl.program_id(1)
    start_kb = jnp.clip((qi * block_q - window) // block_k, 0, num_kb - nblocks)
    q = q_ref[0]  # (bq, H*D); pre-scaled unless fuse_rope (scale in q table)
    acc_t = _acc_t(q)
    rows = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
    col0 = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    # per-key-block masks, shared across heads; fixed-shift mode folds
    # -SOFTMAX_SHIFT into the bias (see module constants)
    ok_bias = 0.0 if ONLINE_MAX else -SOFTMAX_SHIFT
    biases = []
    for j in range(nblocks):
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
        biases.append(jnp.where(mask2d, ok_bias, NEG_INF).astype(acc_t))

    if fuse_rope:
        ngroups = heads // 2
        qrots = _rope_rotate_groups(q, qct_ref[...], qst_ref[...], r2_ref, ngroups, head_dim)
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
            return q[:, h * head_dim:(h + 1) * head_dim]

        def _kh(j, h):
            return k_refs[j][0][:, h * head_dim:(h + 1) * head_dim]

    clamp = jnp.asarray(SOFTMAX_CLAMP - SOFTMAX_SHIFT, acc_t)
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = _qh(h)
        ss, ms = [], []
        for j in range(nblocks):
            s = jax.lax.dot_general(
                qh, _kh(j, h), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(acc_t)
            s = s + biases[j]
            ss.append(s)
            if ONLINE_MAX:
                ms.append(jnp.max(s, axis=-1).astype(jnp.float32))

        if ONLINE_MAX:
            m = ms[0]
            for j in range(1, nblocks):
                m = jnp.maximum(m, ms[j])
            m_safe = jnp.where(m < NEG_INF * 0.5, 0.0, m)

        l_sum = None
        acc = None
        for j in range(nblocks):
            if ONLINE_MAX:
                p = jnp.exp2(ss[j] - m_safe[:, None].astype(acc_t))
            else:
                p = jnp.exp2(jnp.minimum(ss[j], clamp))
            lj = jnp.sum(p, axis=-1, dtype=jnp.float32)
            pv = jax.lax.dot_general(
                p.astype(v_refs[j].dtype), v_refs[j][0][:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            l_sum = lj if l_sum is None else l_sum + lj
            acc = pv if acc is None else acc + pv
        l_sum = jnp.maximum(l_sum, 1e-30)
        o_h = (acc / l_sum[:, None])
        if fuse_wo:
            o_scr[:, sl] = o_h.astype(o_scr.dtype)
        else:
            out_ref[0, :, sl] = o_h.astype(out_ref.dtype)
        if with_lse:
            if ONLINE_MAX:
                lse_ref[0, h] = m_safe + jnp.log2(l_sum)
            else:
                lse_ref[0, h] = jnp.log2(l_sum) + SOFTMAX_SHIFT

    if fuse_wo:
        # out-projection epilogue: numerics identical to the unfused
        # fused_ln_matmul(out, wo, residual=res) pass (fp32-accumulated
        # matmul cast to the activation dtype, then the residual add);
        # wo_q swaps in the int8 dot (same quant math as fused_ln_matmul_q)
        if wo_q:
            gq, sg = _quant_rows_int8(o_scr[:].astype(jnp.float32))
            acc_o = jax.lax.dot_general(
                gq, wo_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            y = (acc_o.astype(jnp.float32) * sg * swo_ref[0:1, :]).astype(out_ref.dtype)
        else:
            y = jax.lax.dot_general(
                o_scr[:], wo_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)
        out_ref[0] = res_ref[0] + y


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


# key blocks per grid step in the unrolled global kernel (env-overridable
# for experiments; 4 = measured default)
UNROLL = int(os.environ.get("CM3P_FA_UNROLL", "4"))


def _seg_unrolled_kernel(
    start_ref, count_ref,
    q_ref, *rest,
    block_q: int, block_k: int, heads: int, head_dim: int, unroll: int,
    with_lse: bool = True,
    fuse_rope: bool = False,
    fuse_wo: bool = False,
    wo_q: bool = False,
):
    """Global/packed attention, ``unroll`` key blocks per grid step.

    A per-key-block streaming kernel pays ~3 dozen tiny VPU ops per step
    (12 heads x per-head m/l updates and lane-sliced scratch rescales) —
    measured 2x slower than batched-head streaming. Unrolling U blocks into
    one step divides both the grid steps and the online-softmax rescale
    chain by U, which is exactly the structure that makes the fused local
    kernel fast. Blocks past ``count`` are clamped re-fetches of a valid
    block; an explicit (t*U + j < count) term in the mask excludes them
    (the segment mask alone would double-count the clamped duplicates).

    Ref layout: q, k*U, v*U, qseg, kseg*U
    [, qcos, qsin, kcos*U, ksin*U, r2][, wo, res[, swo]], out, lse,
    scratch m/l/acc. With ``fuse_rope`` q/k arrive RAW and are rotated
    in-kernel. With ``fuse_wo`` the finalize applies the out-projection
    epilogue ``res + o @ wo`` in-kernel (no-grad primal only; excludes
    ``with_lse``); ``wo_q`` runs that dot int8 (see _window_fused_kernel).
    """
    k_refs = rest[:unroll]
    v_refs = rest[unroll:2 * unroll]
    qseg_ref = rest[2 * unroll]
    kseg_refs = rest[2 * unroll + 1:3 * unroll + 1]
    pos = 3 * unroll + 1
    if fuse_rope:
        qct_ref, qst_ref = rest[pos:pos + 2]
        kct_refs = rest[pos + 2:pos + 2 + unroll]
        kst_refs = rest[pos + 2 + unroll:pos + 2 + 2 * unroll]
        r2_ref = rest[pos + 2 + 2 * unroll]
        pos += 3 + 2 * unroll
    if fuse_wo:
        wo_ref, res_ref = rest[pos:pos + 2]
        pos += 2
        swo_ref = None
        if wo_q:
            swo_ref = rest[pos]
            pos += 1
    if with_lse:
        out_ref, lse_ref = rest[pos:pos + 2]
        m_scr, l_scr, acc_scr = rest[pos + 2:pos + 5]
    else:
        out_ref, lse_ref = rest[pos], None
        m_scr, l_scr, acc_scr = rest[pos + 1:pos + 4]
    o_scr = rest[pos + (5 if with_lse else 4)] if fuse_wo else None

    bi = pl.program_id(0)
    qi = pl.program_id(1)
    t = pl.program_id(2)
    cnt = count_ref[bi, qi]
    outer = (cnt + unroll - 1) // unroll

    @pl.when(t == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when(t < outer)
    def _accumulate():
        q = q_ref[0]
        acc_t = _acc_t(q)
        qseg = qseg_ref[0, 0]
        # fixed-shift mode folds -SOFTMAX_SHIFT into the mask bias, so the
        # exp2 needs no per-row subtraction at all
        ok_bias = 0.0 if ONLINE_MAX else -SOFTMAX_SHIFT
        biases = []
        for j in range(unroll):
            kseg = kseg_refs[j][0, 0]
            seg_ok = jnp.logical_and(kseg[None, :] > 0, qseg[:, None] == kseg[None, :])
            valid = t * unroll + j < cnt  # scalar; kills clamped duplicate blocks
            biases.append(jnp.where(jnp.logical_and(seg_ok, valid), ok_bias, NEG_INF).astype(acc_t))

        if fuse_rope:
            ngroups = heads // 2
            qrots = _rope_rotate_groups(q, qct_ref[...], qst_ref[...], r2_ref, ngroups, head_dim)
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
                return q[:, h * head_dim:(h + 1) * head_dim]

            def _kh(j, h):
                return k_refs[j][0][:, h * head_dim:(h + 1) * head_dim]

        clamp = jnp.asarray(SOFTMAX_CLAMP - SOFTMAX_SHIFT, acc_t)
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            qh = _qh(h)
            ss = []
            ms = []
            for j in range(unroll):
                s = jax.lax.dot_general(
                    qh, _kh(j, h), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(acc_t)
                s = s + biases[j]
                ss.append(s)
                if ONLINE_MAX:
                    ms.append(jnp.max(s, axis=-1).astype(jnp.float32))
            if ONLINE_MAX:
                m_blk = ms[0]
                for j in range(1, unroll):
                    m_blk = jnp.maximum(m_blk, ms[j])
                m_prev = m_scr[h]
                m_new = jnp.maximum(m_prev, m_blk)
                m_safe = jnp.where(m_new < NEG_INF * 0.5, 0.0, m_new)
                alpha = jnp.where(m_prev < NEG_INF * 0.5, 0.0, jnp.exp2(m_prev - m_safe))

            l_sum = None
            pv = None
            for j in range(unroll):
                if ONLINE_MAX:
                    p = jnp.exp2(ss[j] - m_safe[:, None].astype(acc_t))
                else:
                    p = jnp.exp2(jnp.minimum(ss[j], clamp))
                lj = jnp.sum(p, axis=-1, dtype=jnp.float32)
                pvj = jax.lax.dot_general(
                    p.astype(v_refs[j].dtype), v_refs[j][0][:, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                l_sum = lj if l_sum is None else l_sum + lj
                pv = pvj if pv is None else pv + pvj
            if ONLINE_MAX:
                l_scr[h] = l_scr[h] * alpha + l_sum
                acc_scr[:, sl] = acc_scr[:, sl] * alpha[:, None] + pv
                m_scr[h] = m_new
            else:
                l_scr[h] = l_scr[h] + l_sum
                acc_scr[:, sl] = acc_scr[:, sl] + pv

    @pl.when(t == jnp.maximum(outer, 1) - 1)
    def _finalize():
        denom = jnp.maximum(l_scr[:], 1e-30)
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            o_h = (acc_scr[:, sl] / denom[h][:, None])
            if fuse_wo:
                o_scr[:, sl] = o_h.astype(o_scr.dtype)
            else:
                out_ref[0, :, sl] = o_h.astype(out_ref.dtype)
        if fuse_wo:
            # out-projection epilogue — see _window_fused_kernel
            if wo_q:
                gq, sg = _quant_rows_int8(o_scr[:].astype(jnp.float32))
                acc_o = jax.lax.dot_general(
                    gq, wo_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = (acc_o.astype(jnp.float32) * sg * swo_ref[0:1, :]).astype(out_ref.dtype)
            else:
                y = jax.lax.dot_general(
                    o_scr[:], wo_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(out_ref.dtype)
            out_ref[0] = res_ref[0] + y
        if with_lse:
            if ONLINE_MAX:
                m_safe = jnp.where(m_scr[:] < NEG_INF * 0.5, 0.0, m_scr[:])
                lse2 = m_safe + jnp.log2(denom)
            else:
                lse2 = jnp.log2(denom) + SOFTMAX_SHIFT
            # one sublane-range store instead of 12 per-row stores (the
            # block is (1, h_pad, bq) with h_pad >= heads)
            lse_ref[0, 0:heads] = lse2


def _seg_unrolled_fwd(
    q, k, v, qseg, kseg, block_q, block_k, heads, return_lse, rope_theta=None,
    wo=None, out_res=None,
):
    """Dispatcher for the unrolled global/packed kernel (window=None, segments).

    q/k/v: (B, L, H*D) head-minor; handles rectangular lq != lk. RAW
    (un-roped, unscaled) q/k when ``rope_theta`` is set (requires lq == lk
    arange positions — guaranteed by the caller). ``wo``/``out_res`` fuse
    the out-projection epilogue (no-grad path; excludes ``return_lse``)."""
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // heads
    unroll = UNROLL
    fuse_wo = wo is not None
    assert not (fuse_wo and return_lse)
    if rope_theta is None:
        q = q * jnp.asarray(math.log2(math.e) / math.sqrt(d), q.dtype)

    lq_pad = _cdiv(lq, block_q) * block_q
    lk_pad = _cdiv(lk, block_k) * block_k
    if lq_pad != lq:
        q = jnp.pad(q, [(0, 0), (0, lq_pad - lq), (0, 0)])
        qseg = jnp.pad(qseg, [(0, 0), (0, lq_pad - lq)])
        if fuse_wo:
            out_res = jnp.pad(out_res, [(0, 0), (0, lq_pad - lq), (0, 0)])
    if lk_pad != lk:
        k = jnp.pad(k, [(0, 0), (0, lk_pad - lk), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, lk_pad - lk), (0, 0)])
        kseg = jnp.pad(kseg, [(0, 0), (0, lk_pad - lk)])

    nq = lq_pad // block_q
    num_kb = lk_pad // block_k
    nt = _cdiv(num_kb, unroll)

    start_arr, count_arr = _block_ranges(
        b, nq, num_kb, num_kb, block_q, block_k, None, qseg, kseg
    )

    def kb_index(j):
        def index(bi, qi, t, start_ref, count_ref, _j=j):
            cnt = count_ref[bi, qi]
            kb = start_ref[bi, qi] + jnp.minimum(
                t * unroll + _j, jnp.maximum(cnt - 1, 0)
            )
            return (bi, kb, 0)

        return index

    def kseg_index(j):
        def index(bi, qi, t, start_ref, count_ref, _j=j):
            cnt = count_ref[bi, qi]
            kb = start_ref[bi, qi] + jnp.minimum(
                t * unroll + _j, jnp.maximum(cnt - 1, 0)
            )
            return (bi, 0, kb)

        return index

    in_specs = [pl.BlockSpec((1, block_q, hd), lambda bi, qi, t, *_: (bi, qi, 0), memory_space=pltpu.VMEM)]
    args = [q]
    for j in range(unroll):
        in_specs.append(pl.BlockSpec((1, block_k, hd), kb_index(j), memory_space=pltpu.VMEM))
        args.append(k)
    for j in range(unroll):
        in_specs.append(pl.BlockSpec((1, block_k, hd), kb_index(j), memory_space=pltpu.VMEM))
        args.append(v)
    in_specs.append(pl.BlockSpec((1, 1, block_q), lambda bi, qi, t, *_: (bi, 0, qi), memory_space=pltpu.VMEM))
    args.append(qseg.astype(jnp.int32)[:, None, :])
    ksegi = kseg.astype(jnp.int32)[:, None, :]
    for j in range(unroll):
        in_specs.append(pl.BlockSpec((1, 1, block_k), kseg_index(j), memory_space=pltpu.VMEM))
        args.append(ksegi)

    if rope_theta is not None:
        scale = math.log2(math.e) / math.sqrt(d)
        qcos, qsin = _rope_tables(lq_pad, d, rope_theta, q.dtype, scale)
        kcos, ksin = _rope_tables(lk_pad, d, rope_theta, q.dtype, 1.0)
        r2 = _r2_matrix(d, q.dtype)

        def ktab_index(j):
            def index(bi, qi, t, start_ref, count_ref, _j=j):
                cnt = count_ref[bi, qi]
                kb = start_ref[bi, qi] + jnp.minimum(t * unroll + _j, jnp.maximum(cnt - 1, 0))
                return (kb, 0)

            return index

        in_specs.append(pl.BlockSpec((block_q, 2 * d), lambda bi, qi, t, *_: (qi, 0), memory_space=pltpu.VMEM))
        args.append(qcos)
        in_specs.append(pl.BlockSpec((block_q, 2 * d), lambda bi, qi, t, *_: (qi, 0), memory_space=pltpu.VMEM))
        args.append(qsin)
        for tab in (kcos, ksin):
            for j in range(unroll):
                in_specs.append(pl.BlockSpec((block_k, 2 * d), ktab_index(j), memory_space=pltpu.VMEM))
                args.append(tab)
        in_specs.append(pl.BlockSpec((2 * d, 2 * d), lambda bi, qi, t, *_: (0, 0), memory_space=pltpu.VMEM))
        args.append(r2)

    dm = wo.shape[1] if fuse_wo else hd
    wo_q = fuse_wo and FUSED_WO_Q
    if fuse_wo:
        in_specs.append(pl.BlockSpec((hd, dm), lambda bi, qi, t, *_: (0, 0), memory_space=pltpu.VMEM))
        if wo_q:
            wo_i8, swo = quantize_weight_int8(wo)
            args.append(wo_i8)
        else:
            args.append(wo.astype(q.dtype))
        in_specs.append(pl.BlockSpec((1, block_q, dm), lambda bi, qi, t, *_: (bi, qi, 0), memory_space=pltpu.VMEM))
        args.append(out_res)
        if wo_q:
            in_specs.append(pl.BlockSpec((8, dm), lambda bi, qi, t, *_: (0, 0), memory_space=pltpu.VMEM))
            args.append(jnp.zeros((8, dm), jnp.float32).at[0].set(swo))

    h_pad = _cdiv(heads, 8) * 8
    out_specs = [pl.BlockSpec((1, block_q, dm), lambda bi, qi, t, *_: (bi, qi, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, lq_pad, dm), q.dtype)]
    scratch = [
        pltpu.VMEM((heads, block_q), jnp.float32),  # m (unused in fixed-shift; 12 KB)
        pltpu.VMEM((heads, block_q), jnp.float32),  # l
        pltpu.VMEM((block_q, hd), jnp.float32),     # acc
    ]
    if fuse_wo:
        scratch.append(pltpu.VMEM((block_q, hd), q.dtype))  # normalized o for the epilogue dot
    if return_lse:
        out_specs.append(pl.BlockSpec((1, h_pad, block_q), lambda bi, qi, t, *_: (bi, 0, qi), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, h_pad, lq_pad), jnp.float32))
    res = pl.pallas_call(
        functools.partial(
            _seg_unrolled_kernel, block_q=block_q, block_k=block_k,
            heads=heads, head_dim=d, unroll=unroll, with_lse=return_lse,
            fuse_rope=rope_theta is not None, fuse_wo=fuse_wo, wo_q=wo_q,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nq, nt),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
        ),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * lq_pad * lk_pad * d
            + (2 * b * lq_pad * hd * dm if fuse_wo else 0),
            bytes_accessed=(b * (lq_pad + 2 * lk_pad) * hd + b * lq_pad * dm) * q.dtype.itemsize,
            transcendentals=b * heads * lq_pad * lk_pad,
        ),
    )(start_arr, count_arr, *args)

    if return_lse:
        out, lse = res
        return out[:, :lq, :], lse[:, :heads, :lq]
    return res[0][:, :lq, :]


def _window_fused_fwd(
    q, k, v, qseg, kseg, window, block_q, block_k, heads, return_lse, rope_theta=None,
    wo=None, out_res=None,
):
    """Dispatcher for the single-pass windowed kernel (lq == lk).

    q/k/v: (B, L, H*D) head-minor; RAW (un-roped, unscaled) when
    ``rope_theta`` is set. ``wo``/``out_res`` fuse the out-projection
    epilogue (no-grad path; excludes ``return_lse``)."""
    b, l, hd = q.shape
    d = hd // heads
    fuse_wo = wo is not None
    assert not (fuse_wo and return_lse)
    if rope_theta is None:
        q = q * jnp.asarray(math.log2(math.e) / math.sqrt(d), q.dtype)
    l_pad = _cdiv(l, block_q) * block_q
    if l_pad % block_k:
        l_pad = _cdiv(l_pad, block_k) * block_k
    if l_pad != l:
        q = jnp.pad(q, [(0, 0), (0, l_pad - l), (0, 0)])
        k = jnp.pad(k, [(0, 0), (0, l_pad - l), (0, 0)])
        v = jnp.pad(v, [(0, 0), (0, l_pad - l), (0, 0)])
        if fuse_wo:
            out_res = jnp.pad(out_res, [(0, 0), (0, l_pad - l), (0, 0)])
        if qseg is not None:
            qseg = jnp.pad(qseg, [(0, 0), (0, l_pad - l)])
            kseg = jnp.pad(kseg, [(0, 0), (0, l_pad - l)])
    num_kb = l_pad // block_k
    nq = l_pad // block_q
    nblocks = min(num_kb, _cdiv(block_q + 2 * window, block_k) + 1)

    def kix(j):
        return lambda bi, qi, _j=j: (
            bi, jnp.clip((qi * block_q - window) // block_k, 0, num_kb - nblocks) + _j, 0
        )

    in_specs = [pl.BlockSpec((1, block_q, hd), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM)]
    args = [q]
    for j in range(nblocks):
        in_specs.append(pl.BlockSpec((1, block_k, hd), kix(j), memory_space=pltpu.VMEM))
        args.append(k)
    for j in range(nblocks):
        in_specs.append(pl.BlockSpec((1, block_k, hd), kix(j), memory_space=pltpu.VMEM))
        args.append(v)
    has_seg = qseg is not None
    if has_seg:
        # (B, 1, L) layout keeps the TPU block tiling legal: block (1, 1, Bk)
        in_specs.append(pl.BlockSpec((1, 1, block_q), lambda bi, qi: (bi, 0, qi), memory_space=pltpu.VMEM))
        args.append(qseg.astype(jnp.int32)[:, None, :])
        ksegi = kseg.astype(jnp.int32)[:, None, :]
        for j in range(nblocks):
            in_specs.append(pl.BlockSpec(
                (1, 1, block_k),
                lambda bi, qi, _j=j: (
                    bi, 0, jnp.clip((qi * block_q - window) // block_k, 0, num_kb - nblocks) + _j,
                ),
                memory_space=pltpu.VMEM))
            args.append(ksegi)

    if rope_theta is not None:
        scale = math.log2(math.e) / math.sqrt(d)
        qcos, qsin = _rope_tables(l_pad, d, rope_theta, q.dtype, scale)
        kcos, ksin = _rope_tables(l_pad, d, rope_theta, q.dtype, 1.0)
        r2 = _r2_matrix(d, q.dtype)

        def kix2(j):
            return lambda bi, qi, _j=j: (
                jnp.clip((qi * block_q - window) // block_k, 0, num_kb - nblocks) + _j, 0
            )

        in_specs.append(pl.BlockSpec((block_q, 2 * d), lambda bi, qi: (qi, 0), memory_space=pltpu.VMEM))
        args.append(qcos)
        in_specs.append(pl.BlockSpec((block_q, 2 * d), lambda bi, qi: (qi, 0), memory_space=pltpu.VMEM))
        args.append(qsin)
        for tab in (kcos, ksin):
            for j in range(nblocks):
                in_specs.append(pl.BlockSpec((block_k, 2 * d), kix2(j), memory_space=pltpu.VMEM))
                args.append(tab)
        in_specs.append(pl.BlockSpec((2 * d, 2 * d), lambda bi, qi: (0, 0), memory_space=pltpu.VMEM))
        args.append(r2)

    dm = wo.shape[1] if fuse_wo else hd
    wo_q = fuse_wo and FUSED_WO_Q
    if fuse_wo:
        in_specs.append(pl.BlockSpec((hd, dm), lambda bi, qi: (0, 0), memory_space=pltpu.VMEM))
        if wo_q:
            wo_i8, swo = quantize_weight_int8(wo)
            args.append(wo_i8)
        else:
            args.append(wo.astype(q.dtype))
        in_specs.append(pl.BlockSpec((1, block_q, dm), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM))
        args.append(out_res)
        if wo_q:
            in_specs.append(pl.BlockSpec((8, dm), lambda bi, qi: (0, 0), memory_space=pltpu.VMEM))
            args.append(jnp.zeros((8, dm), jnp.float32).at[0].set(swo))

    kernel = functools.partial(
        _window_fused_kernel, window=window, block_q=block_q, block_k=block_k,
        num_kb=num_kb, nblocks=nblocks, seq_len=l, has_seg=has_seg, heads=heads, head_dim=d,
        with_lse=return_lse, fuse_rope=rope_theta is not None, fuse_wo=fuse_wo, wo_q=wo_q,
    )
    h_pad = _cdiv(heads, 8) * 8  # lse sublane dim must be 8-aligned for TPU blocks
    out_specs = [pl.BlockSpec((1, block_q, dm), lambda bi, qi: (bi, qi, 0), memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, l_pad, dm), q.dtype)]
    if return_lse:
        out_specs.append(pl.BlockSpec((1, h_pad, block_q), lambda bi, qi: (bi, 0, qi), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, h_pad, l_pad), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(b, nq),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((block_q, hd), q.dtype)] if fuse_wo else [],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * l_pad * nblocks * block_k * d
            + (2 * b * l_pad * hd * dm if fuse_wo else 0),
            bytes_accessed=(b * l_pad * hd * 4) * q.dtype.itemsize,
            transcendentals=b * heads * l_pad * nblocks * block_k,
        ),
    )(*args)
    if return_lse:
        out, lse = res
        return out[:, :l, :], lse[:, :heads, :l]
    return res[0][:, :l, :]


def _flash_attention_fwd_impl(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    qseg: Optional[jnp.ndarray],
    kseg: Optional[jnp.ndarray],
    window: Optional[int],
    block_q: int,
    block_k: int,
    heads: int,
    return_lse: bool = False,
    rope_theta: Optional[float] = None,
    wo: Optional[jnp.ndarray] = None,
    out_res: Optional[jnp.ndarray] = None,
):
    """q/k/v: (B, L, H*D) head-minor flattened.

    ``rope_theta``: fuse rotary embedding (arange positions) into the
    kernel — q/k must be RAW. Falls back to an XLA rope pass for head
    dims != 64, odd head counts, and the streaming kernel path.
    ``wo``/``out_res``: fuse the out-projection epilogue ``out_res + o @ wo``
    into the kernel (no-grad primal only; the caller guarantees the shapes
    route to one of the two fused kernels — the streaming path rejects it)."""
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // heads
    if window is not None and lq != lk:
        raise ValueError("windowed attention requires equal q/k lengths")
    if rope_theta is not None and lq != lk:
        # rectangular shapes (e.g. allgather-KV shards) have ambiguous q
        # positions — arange(lq) would be shard-local while k uses absolute
        # arange(lk). The SP path pre-applies rope with the true positions.
        raise ValueError("rope_theta requires lq == lk; apply rope before the kernel")
    can_fuse = rope_theta is not None and d == 64 and heads % 2 == 0
    routes_fused = (window is not None and _cdiv(block_q + 2 * window, block_k) + 1 <= 4) or (
        window is None and qseg is not None
    )
    if rope_theta is not None and not (can_fuse and routes_fused):
        # XLA fallback keeps the API uniform for unsupported variants
        q = _apply_rope_xla(q, rope_theta, d)
        k = _apply_rope_xla(k, rope_theta, d)
        rope_theta = None
    if window is not None and _cdiv(block_q + 2 * window, block_k) + 1 <= 4:
        return _window_fused_fwd(
            q, k, v, qseg, kseg, window, block_q, block_k, heads, return_lse, rope_theta,
            wo=wo, out_res=out_res,
        )
    if window is None and qseg is not None:
        return _seg_unrolled_fwd(
            q, k, v, qseg, kseg, block_q, block_k, heads, return_lse, rope_theta,
            wo=wo, out_res=out_res,
        )
    if wo is not None:
        raise ValueError("fused Wo epilogue is unsupported on the streaming kernel path")
    # fold both the softmax scale and log2(e) into q: scores land in log2
    # space so the kernel's transcendental is exp2, not exp
    q = q * jnp.asarray(math.log2(math.e) / math.sqrt(d), q.dtype)

    lq_pad = _cdiv(lq, block_q) * block_q
    lk_pad = _cdiv(lk, block_k) * block_k
    if window is not None:
        lq_pad = lk_pad = max(lq_pad, lk_pad)
    if lq_pad != lq:
        q = jnp.pad(q, [(0, 0), (0, lq_pad - lq), (0, 0)])
        if qseg is not None:
            qseg = jnp.pad(qseg, [(0, 0), (0, lq_pad - lq)])
    if lk_pad != lk:
        pad = [(0, 0), (0, lk_pad - lk), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if kseg is not None:
            kseg = jnp.pad(kseg, [(0, 0), (0, lk_pad - lk)])

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
        seq_len=lk,
        heads=heads,
        head_dim=d,
        with_lse=return_lse,
    )

    start_arr, count_arr = _block_ranges(
        b, nq, num_kb, nk_grid, block_q, block_k, window, qseg, kseg
    )

    def k_index(bi, qi, kj, start_ref, count_ref):
        cnt = count_ref[bi, qi]
        kb = start_ref[bi, qi] + jnp.minimum(kj, jnp.maximum(cnt - 1, 0))
        return (bi, kb, 0)

    in_specs = [
        pl.BlockSpec((1, block_q, hd), lambda bi, qi, kj, *_: (bi, qi, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, hd), k_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, hd), k_index, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if qseg is not None:
        # (B, 1, L) layout keeps the TPU block tiling legal: block (1, 1, Bk)
        in_specs.append(
            pl.BlockSpec((1, 1, block_q), lambda bi, qi, kj, *_: (bi, 0, qi), memory_space=pltpu.VMEM)
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 1, block_k),
                lambda bi, qi, kj, *_s: (bi, 0, k_index(bi, qi, kj, *_s)[1]),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(qseg.astype(jnp.int32)[:, None, :])
        args.append(kseg.astype(jnp.int32)[:, None, :])
        has_seg_refs = True
    else:
        has_seg_refs = False

    # the lse output (and its per-step stores) only exists when a backward
    # will need the residual — same skip the fused paths use (ADVICE r1 #4)
    def wrapped(s_ref, c_ref, q_ref, k_ref, v_ref, *rest):
        pos = 0
        if has_seg_refs:
            qseg_ref, kseg_ref = rest[0], rest[1]
            pos = 2
        else:
            qseg_ref = kseg_ref = None
        if return_lse:
            out_ref, lse_ref = rest[pos], rest[pos + 1]
            scratch = rest[pos + 2:]
        else:
            out_ref, lse_ref = rest[pos], None
            scratch = rest[pos + 1:]
        kernel(s_ref, c_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref, out_ref, lse_ref, *scratch)

    h_pad = _cdiv(heads, 8) * 8  # lse sublane dim must be 8-aligned for TPU blocks
    out_specs = [
        pl.BlockSpec((1, block_q, hd), lambda bi, qi, kj, *_: (bi, qi, 0), memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((b, lq_pad, hd), q.dtype)]
    if return_lse:
        out_specs.append(
            pl.BlockSpec((1, h_pad, block_q), lambda bi, qi, kj, *_: (bi, 0, qi), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((b, h_pad, lq_pad), jnp.float32))
    res = pl.pallas_call(
        wrapped,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, nq, nk_grid),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((heads, block_q), jnp.float32),
                pltpu.VMEM((heads, block_q), jnp.float32),
                pltpu.VMEM((block_q, hd), jnp.float32),
            ],
        ),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * lq_pad * (min(lk_pad, (2 * (window or lk_pad))) * d),
            bytes_accessed=(b * (lq_pad + 2 * lk_pad) * hd + b * lq_pad * hd) * q.dtype.itemsize,
            transcendentals=b * heads * lq_pad * min(lk_pad, 2 * (window or lk_pad)),
        ),
    )(start_arr, count_arr, *args)

    out = res[0][:, :lq, :]
    if return_lse:
        return out, res[1][:, :heads, :lq]
    return out


def _xla_reference(q, k, v, qseg, kseg, window, heads):
    """Dense-mask attention used for the recompute backward + parity tests.

    q/k/v: (B, L, H*D) head-minor."""
    b, lq, hd = q.shape
    lk = k.shape[1]
    d = hd // heads
    qh = q.reshape(b, lq, heads, d)
    kh = k.reshape(b, lk, heads, d)
    vh = v.reshape(b, lk, heads, d)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, preferred_element_type=jnp.float32) / math.sqrt(d)
    mask = jnp.ones((lq, lk), bool)
    if window is not None:
        idx = jnp.arange(lq)
        mask = jnp.abs(idx[:, None] - idx[None, :]) <= window
    mask = mask[None, None]
    if kseg is not None:
        mask = jnp.logical_and(mask, kseg[:, None, None, :] > 0)
        mask = jnp.logical_and(mask, qseg[:, None, :, None] == kseg[:, None, None, :])
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return o.reshape(b, lq, hd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_attention(q, k, v, qseg, kseg, window, block_q, block_k, heads, rope_theta):
    return _flash_attention_fwd_impl(
        q, k, v, qseg, kseg, window, block_q, block_k, heads, rope_theta=rope_theta
    )


# Trainable fused rope (VERDICT r2 next #4): with the gate ON the
# differentiated path keeps rope ENTIRELY in-kernel — the forward kernels
# rotate raw q/k, residuals stay RAW, and the backward kernels rotate on
# load + counter-rotate dq/dk at finalize (flash_attention_bwd fused-rope
# block comment). This deletes the 4 XLA rope passes (2 forward rotations +
# 2 cotangent counter-rotations) and the rotated-copy HBM round trips the
# train step paid per layer. Default OFF until the hardware A/B lands.
TRAIN_FUSED_ROPE = os.environ.get("CM3P_TRAIN_FUSED_ROPE", "0") == "1"


def _train_rope_in_kernel(rope_theta, hd, heads, dtype=None) -> bool:
    # fp32 is declined outright: the fused-rope forward WITH the lse
    # residual crashes Mosaic on the fp32 seg-unrolled route (r15 smoke —
    # extraction never hits it because no-grad drops the lse), and the
    # fp32 global backward crashes too (r12). bf16 is the training dtype.
    import jax.numpy as _jnp

    if dtype is not None and dtype == _jnp.float32:
        return False
    return TRAIN_FUSED_ROPE and rope_theta is not None and hd // heads == 64 and heads % 2 == 0


def _fwd(q, k, v, qseg, kseg, window, block_q, block_k, heads, rope_theta):
    # Differentiated forward, two modes:
    # * gate OFF (default): rotate in XLA so the residuals hold the rotated
    #   q/k the backward kernels consume — the backward then only pays the
    #   counter-rotation of dq/dk, exactly what autodiff through an outside
    #   rope pass cost.
    # * gate ON (CM3P_TRAIN_FUSED_ROPE): rope rides in-kernel both
    #   directions; residuals stay RAW (marker: same static predicate
    #   re-evaluated in _bwd — the flag is part of _dispatch_key, so a
    #   flip retraces instead of mixing modes).
    if rope_theta is not None and not _train_rope_in_kernel(rope_theta, q.shape[-1], heads, q.dtype):
        d = q.shape[-1] // heads
        q = _apply_rope_xla(q, rope_theta, d)
        k = _apply_rope_xla(k, rope_theta, d)
        out, lse = _flash_attention_fwd_impl(
            q, k, v, qseg, kseg, window, block_q, block_k, heads, return_lse=True, rope_theta=None
        )
        return out, (q, k, v, qseg, kseg, out, lse)
    out, lse = _flash_attention_fwd_impl(
        q, k, v, qseg, kseg, window, block_q, block_k, heads, return_lse=True, rope_theta=rope_theta
    )
    return out, (q, k, v, qseg, kseg, out, lse)


BACKWARD_MODE = "pallas"  # "pallas" (fused kernels) or "xla" (dense recompute)


def _counter_rotate(g, theta, d):
    """Pull a cotangent back through in-kernel rope: dq = g*cos - (g@R)*sin
    (R^T == -R for the rotate-half permutation)."""
    b, l, hd = g.shape
    h = hd // d
    cos2, sin2 = _rope_tables(l, d, theta, g.dtype, 1.0)
    cos = cos2[:, :d][None, :, None, :]
    sin = sin2[:, :d][None, :, None, :]
    r = jnp.asarray(_rot_matrix(d), g.dtype)
    g4 = g.reshape(b, l, h, d)
    dn = (((3,), (0,)), ((), ()))
    g4 = g4 * cos - jax.lax.dot_general(g4, r, dn, preferred_element_type=g.dtype) * sin
    return g4.reshape(b, l, hd)


@functools.lru_cache(maxsize=512)
def _jitted_fa_bwd(window, block_q, block_k, heads, rope_theta, _key):
    from .flash_attention_bwd import flash_attention_bwd

    def call(q, k, v, qseg, kseg, out, lse, g):
        return flash_attention_bwd(
            q, k, v, qseg, kseg, out, lse, g, window, block_q, block_k, heads,
            rope_theta=rope_theta,
        )

    return jax.jit(call, inline=True)


def _bwd(window, block_q, block_k, heads, rope_theta, res, g):
    # gate OFF: residuals hold ROTATED q/k (see _fwd) — only the cotangents
    # need to be pulled back through the rotation here. Gate ON: residuals
    # are RAW and the backward kernels handle rope end to end.
    q, k, v, qseg, kseg, out, lse = res
    d = q.shape[-1] // heads
    bwd_rope = rope_theta if _train_rope_in_kernel(rope_theta, q.shape[-1], heads, q.dtype) else None
    if BACKWARD_MODE == "pallas":
        if JIT_DISPATCH:
            dq, dk, dv = _jitted_fa_bwd(window, block_q, block_k, heads, bwd_rope, _dispatch_key())(
                q, k, v, qseg, kseg, out, lse, g
            )
        else:
            from .flash_attention_bwd import flash_attention_bwd

            dq, dk, dv = flash_attention_bwd(
                q, k, v, qseg, kseg, out, lse, g, window, block_q, block_k, heads,
                rope_theta=bwd_rope,
            )
    else:
        # dense recompute fallback (materializes O(L²) scores)
        if bwd_rope is not None:
            qr = _apply_rope_xla(q, rope_theta, d)
            kr = _apply_rope_xla(k, rope_theta, d)
        else:
            qr, kr = q, k
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_reference(q_, k_, v_, qseg, kseg, window, heads), qr, kr, v
        )
        dq, dk, dv = vjp(g)
        if bwd_rope is not None:
            dq = _counter_rotate(dq, rope_theta, d)
            dk = _counter_rotate(dk, rope_theta, d)
    if rope_theta is not None and bwd_rope is None:
        dq = _counter_rotate(dq, rope_theta, d)
        dk = _counter_rotate(dk, rope_theta, d)
    return dq, dk, dv, None, None


_flash_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _flash_attention_wo(q, k, v, qseg, kseg, wo, out_res, window, block_q, block_k, heads, rope_theta):
    """Attention with the out-projection epilogue ``out_res + o @ wo`` fused
    into the kernel's finalize — the attention output never round-trips HBM
    on no-grad forwards (saves one (B, L, H·D) write + read per layer)."""
    return _flash_attention_fwd_impl(
        q, k, v, qseg, kseg, window, block_q, block_k, heads,
        rope_theta=rope_theta, wo=wo, out_res=out_res,
    )


def _wo_fwd(q, k, v, qseg, kseg, wo, out_res, window, block_q, block_k, heads, rope_theta):
    # Differentiated forward: the exact unfused composition (training math
    # identical to flash_attention + fused_ln_matmul(residual=...)); the
    # vjp closure rides as a jax.tree_util.Partial residual.
    def comp(q_, k_, v_, qseg_, kseg_, wo_, r_):
        o = _flash_attention(q_, k_, v_, qseg_, kseg_, window, block_q, block_k, heads, rope_theta)
        return r_ + jnp.dot(o, wo_.astype(o.dtype))

    out, vjp = jax.vjp(comp, q, k, v, qseg, kseg, wo, out_res)
    return out, vjp


def _wo_bwd(window, block_q, block_k, heads, rope_theta, vjp, g):
    dq, dk, dv, _, _, dwo, dres = vjp(g)
    return dq, dk, dv, None, None, dwo, dres


_flash_attention_wo.defvjp(_wo_fwd, _wo_bwd)


# ---------------------------------------------------------------------------
# Memoized inline-jit dispatch.
#
# JAX has no cache around Pallas kernel tracing: every ``pallas_call`` bind
# re-traces the kernel body, so a 22-layer tower pays 22 identical kernel
# traces per outer jit trace (~0.17 s each on this 1-core host — measured
# 23.5 s of the warm extraction wall, /tmp profile 2026-08-19). Routing the
# custom_vjp ops through a memoized ``jax.jit(..., inline=True)`` wrapper
# gives each static configuration a stable function identity, so pjit's
# jaxpr cache collapses the per-layer re-traces into one. ``inline=True``
# splices the cached jaxpr into the outer trace — the lowered HLO is the
# same program as the direct call.
#
# The cache key carries every module-level flag the traced body reads
# (tests monkeypatch them) plus the live ``pl.pallas_call`` object (tests
# patch it to interpret mode): a patched flag lands in a fresh cache slot
# instead of silently reusing a stale jaxpr (the jit-trace-cache gotcha in
# CLAUDE.md, one layer down).
JIT_DISPATCH = os.environ.get("CM3P_JIT_DISPATCH", "1") != "0"


def _dispatch_key():
    from . import flash_attention_bwd as _fab

    return (
        pl.pallas_call, ONLINE_MAX, BACKWARD_MODE, FUSED_WO_Q,
        UNROLL, TRAIN_FUSED_ROPE, _fab.BWD_EXP2, _fab.UNROLL,
    )


@functools.lru_cache(maxsize=512)
def _jitted_fa(window, block_q, block_k, heads, rope_theta, _key):
    def call(q, k, v, qseg, kseg):
        return _flash_attention(
            q, k, v, qseg, kseg, window, block_q, block_k, heads, rope_theta
        )

    return jax.jit(call, inline=True)


@functools.lru_cache(maxsize=512)
def _jitted_fa_wo(window, block_q, block_k, heads, rope_theta, _key):
    def call(q, k, v, qseg, kseg, wo, out_res):
        return _flash_attention_wo(
            q, k, v, qseg, kseg, wo, out_res,
            window, block_q, block_k, heads, rope_theta,
        )

    return jax.jit(call, inline=True)


def _fa(q, k, v, qseg, kseg, window, block_q, block_k, heads, rope_theta):
    if not JIT_DISPATCH:
        return _flash_attention(
            q, k, v, qseg, kseg, window, block_q, block_k, heads, rope_theta
        )
    return _jitted_fa(window, block_q, block_k, heads, rope_theta, _dispatch_key())(
        q, k, v, qseg, kseg
    )


def _fa_wo(q, k, v, qseg, kseg, wo, out_res, window, block_q, block_k, heads, rope_theta):
    if not JIT_DISPATCH:
        return _flash_attention_wo(
            q, k, v, qseg, kseg, wo, out_res, window, block_q, block_k, heads, rope_theta
        )
    return _jitted_fa_wo(window, block_q, block_k, heads, rope_theta, _dispatch_key())(
        q, k, v, qseg, kseg, wo, out_res
    )


def wo_fusable(window: Optional[int], block_q: int, block_k: int,
               hd: int, dm: int, lq: int, lk: int) -> bool:
    """Shapes the Wo-epilogue kernels support: one of the two fused routes
    (single-pass windowed or seg-unrolled global), lane-aligned dims, square
    q/k. The streaming fallback path has no epilogue. ``block_q``/``block_k``
    0 = the dispatcher's auto defaults."""
    if lq != lk or hd % 128 or dm % 128:
        return False
    if window is not None:
        if not block_q:
            block_q = 128
        if not block_k:
            block_k = block_q
        return _cdiv(block_q + 2 * window, block_k) + 1 <= 4
    # seg-unrolled global route (segments synthesized): at lq=4096/bf16/d=768
    # the epilogue variant exceeds the 16 MB scoped-vmem stack by ~8%
    # (measured 17.34 MB on v5e, 2026-08-18) — decline and let the caller
    # run the XLA Wo+residual epilogue instead.
    return lq <= 2048


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    window: Optional[int] = None,
    segment_ids: Optional[jnp.ndarray] = None,
    block_q: int = 0,
    block_k: int = 0,
    rope_theta: Optional[float] = None,
    wo: Optional[jnp.ndarray] = None,
    out_residual: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Flash attention over head-minor (B, L, H, D) tensors.

    The (B, L, H, D) layout (flattened to (B, L, H·D) blocks in-kernel) is
    deliberate: it keeps every DMA contiguous with 128-lane-aligned tiles —
    ~4x the HBM bandwidth of the conventional (B, H, L, D) blocks at
    head_dim 64 (tools/bench_dma.py) — and lets the caller skip the
    (B, H, L, D) transposes entirely (the fused QKV projection already
    produces (B, L, H, D)).

    Args:
        q, k, v: (B, L, H, D).
        bias: optional additive (B, 1, 1, L) key-padding bias (0 / -inf style);
            converted to a boolean key mask.
        key_mask: optional (B, L) 0/1 mask (alternative to ``bias``).
        window: one-sided local-attention radius; ``None`` = global.
        segment_ids: optional (B, L) int segments for packed sequences
            (0 = padding, >0 = segment index); attention stays within a
            segment — the TPU-native replacement for FA2 varlen unpadding.
        block_q/block_k: 0 = auto (128 for windowed layers — measured best
            at w=64 — and 256 for global/streaming).
        rope_theta: fuse rotary position embedding into the kernel. q/k
            must then be RAW (un-roped; the softmax scale is also folded
            in-kernel). Requires default arange positions; net
            -3.3/-4.3 ms/layer (local/global) vs a standalone rope pass
            at B64·L4096·H12 on v5e (tools/bench_r2_attn.py E5).
        wo: optional (H·D, d_model) out-projection weight — fuses the
            ``out_residual + attn @ wo`` epilogue into the kernel finalize
            (no-grad primal only; autodiff runs the unfused composition).
            Returns (B, L, d_model) instead of (B, L, H, D). Shapes the
            kernels can't fuse (``wo_fusable``) fall back to an XLA epilogue.
        out_residual: (B, L, d_model) residual added by the epilogue;
            required with ``wo``.
    """
    b, lq, heads, d = q.shape
    lk = k.shape[1]
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
        qseg = jnp.ones((b, lq), jnp.int32)
        kseg = key_mask.astype(jnp.int32)
    else:
        qseg = kseg = None

    if window is None and qseg is None:
        # Mosaic (libtpu 2026-xx) crashes in ApplyVectorLayout on some
        # mask-free global variants of the kernel; all-ones segments are
        # semantically identical and take the well-exercised segmented
        # codepath
        qseg = kseg = jnp.ones((b, lq), jnp.int32)

    if not block_q:
        block_q = 128 if window is not None else 256
    if not block_k:
        block_k = block_q
    block_q = min(block_q, max(128, 1 << (lq - 1).bit_length()))
    block_q = min(block_q, 512)
    block_k = min(block_k, max(128, 1 << (lk - 1).bit_length()))
    block_k = min(block_k, 512)

    qf = q.reshape(b, lq, heads * d)
    kf = k.reshape(b, lk, heads * d)
    vf = v.reshape(b, lk, heads * d)

    from ..utils.platform import active_mesh

    if wo is not None:
        if out_residual is None:
            raise ValueError("wo requires out_residual")
        dm = wo.shape[1]
        if not wo_fusable(window, block_q, block_k, heads * d, dm, lq, lk):
            # XLA epilogue fallback keeps the API uniform
            out = _fa(qf, kf, vf, qseg, kseg, window, block_q, block_k, heads, rope_theta)
            return out_residual + jnp.dot(out, wo.astype(out.dtype))
        mesh = active_mesh()
        if mesh is not None:
            # dp-only shard_map (sharding heads would need a psum of partial
            # epilogue products; extraction meshes are data-parallel anyway)
            dp = mesh.shape.get("data", 1)
            if dp > 1 and b % dp == 0:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                has_seg = qseg is not None

                def _call_wo(q_, k_, v_, qs_, ks_, wo_, r_):
                    return _fa_wo(
                        q_, k_, v_,
                        qs_ if has_seg else None, ks_ if has_seg else None,
                        wo_, r_,
                        window, block_q, block_k, heads, rope_theta,
                    )

                dummy = jnp.zeros((), jnp.int32)
                seg_spec = P("data", None) if has_seg else P()
                return shard_map(
                    _call_wo,
                    mesh=mesh,
                    in_specs=(
                        P("data", None, None), P("data", None, None), P("data", None, None),
                        seg_spec, seg_spec, P(), P("data", None, None),
                    ),
                    out_specs=P("data", None, None),
                    check_vma=False,
                )(qf, kf, vf, qseg if has_seg else dummy, kseg if has_seg else dummy, wo, out_residual)
        return _fa_wo(
            qf, kf, vf, qseg, kseg, wo, out_residual,
            window, block_q, block_k, heads, rope_theta,
        )

    # Mesh-aware dispatch: under an ambient (data, model) mesh, run the
    # kernel inside shard_map — batch sharded over `data`, whole heads over
    # `model` (the head-minor (B, L, H·D) layout splits H·D into contiguous
    # per-head 64-lane groups, so a model shard owns heads//tp whole heads).
    # Without this, GSPMD treats the pallas_call as an opaque custom call
    # and all-gathers every operand to replicated — on an 8-chip mesh that
    # is an 8x slowdown of the attention stack. Differentiable: shard_map
    # carries the custom_vjp through per-shard (tests/test_mesh_pallas.py).
    mesh = active_mesh()
    if mesh is not None and lq == lk:
        dp = mesh.shape.get("data", 1)
        tp = mesh.shape.get("model", 1)
        dp_ok = dp > 1 and b % dp == 0
        tp_ok = tp > 1 and heads % tp == 0 and ((heads // tp) * d) % 128 == 0
        if dp_ok or tp_ok:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            baxis = "data" if dp_ok else None
            haxis = "model" if tp_ok else None
            local_heads = heads // tp if tp_ok else heads
            qkv_spec = P(baxis, None, haxis)
            seg_spec = P(baxis, None) if qseg is not None else P()
            has_seg = qseg is not None

            def _call(q_, k_, v_, qs_, ks_):
                return _fa(
                    q_, k_, v_,
                    qs_ if has_seg else None, ks_ if has_seg else None,
                    window, block_q, block_k, local_heads, rope_theta,
                )

            dummy = jnp.zeros((), jnp.int32)
            out = shard_map(
                _call,
                mesh=mesh,
                in_specs=(qkv_spec, qkv_spec, qkv_spec, seg_spec, seg_spec),
                out_specs=qkv_spec,
                check_vma=False,
            )(qf, kf, vf, qseg if has_seg else dummy, kseg if has_seg else dummy)
            return out.reshape(b, lq, heads, d)

    out = _fa(qf, kf, vf, qseg, kseg, window, block_q, block_k, heads, rope_theta)
    return out.reshape(b, lq, heads, d)
