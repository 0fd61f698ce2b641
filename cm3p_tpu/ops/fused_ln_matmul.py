"""Fused LayerNorm -> matmul (+residual) Pallas kernel.

Companion to ops/fused_ffn.py, covering the encoder's other two elementwise
round trips (docs/ROADMAP.md round-2b "remaining unfused elementwise"):

* ``qkv = Wqkv(LN(x))`` — the attention pre-norm's output never reaches HBM
  (saves one (R, D) write + read per layer);
* ``x + Wo(attn_out)`` — the attention out-projection with the residual add
  folded into the same pass (saves the separate add's read + write).

Both are forms of one kernel: ``maybe_residual + (maybe_LN(x)) @ W``.
Weights stay VMEM-resident across grid steps (Wqkv bf16 = 3.5 MB at the
beatmap-tower shape). Same differentiation contract as fused_ffn: the
no-grad primal runs the kernel; under autodiff the custom_vjp fwd runs the
exact XLA composition (training math unchanged) and the backward is its
analytic gradient (the two matmuls XLA autodiff emits + cheap LN recompute).

Reference counterpart: the ModernBERT attention block's attn_norm -> Wqkv
and Wo -> residual (``modeling_cm3p.py:607-619``).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_ffn import _ln_f32

# Default OFF (measured): the kernel is micro-NEUTRAL vs the XLA composition
# (15.93 vs 16.04 ms at the B123-packed QKV shape, tools/bench_lnmm_q.py) but
# an end-to-end headline LOSS — 126.8 emb/s/chip with both halves on vs 182.3
# off, same chip/day (tools/tpu_r2_batch.sh, 2026-08-18). In situ the
# pallas_call boundary costs more than the saved LN round trip: XLA can no
# longer fuse the LN/residual elementwise into neighboring ops or pick
# layouts across the boundary. Sub-gates let each half be re-measured
# independently.
_LNMM_MASTER = os.environ.get("CM3P_FUSED_LNMM", "0") != "0"


def _sub_gate(name: str) -> bool:
    v = os.environ.get(name)
    return _LNMM_MASTER if v is None else v != "0"


# The two call sites gate independently (CM3P_FUSED_LNMM_QKV / _WO override
# the master CM3P_FUSED_LNMM): the hardware headline A/B showed the kernel is
# micro-neutral vs XLA but NOT end-to-end-neutral, so each half must be
# measurable on its own.
FUSED_LNMM_QKV_ENABLED = _sub_gate("CM3P_FUSED_LNMM_QKV")
FUSED_LNMM_WO_ENABLED = _sub_gate("CM3P_FUSED_LNMM_WO")
FUSED_LNMM_ENABLED = FUSED_LNMM_QKV_ENABLED or FUSED_LNMM_WO_ENABLED


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def reference_ln_matmul(x, scale, bias, w, res, *, eps: float, with_ln: bool):
    """XLA composition: (res +) LN(x) @ w, matching the flax module order."""
    dt = x.dtype
    if with_ln:
        if bias is None:
            bias = jnp.zeros((x.shape[-1],), jnp.float32)
        y = _ln_f32(
            x.astype(jnp.float32), scale.astype(jnp.float32), bias.astype(jnp.float32), eps
        ).astype(dt)
    else:
        y = x
    out = jnp.dot(y, w.astype(dt))
    if res is not None:
        out = res + out
    return out


def _lnmm_kernel(x_ref, sb_ref, w_ref, *rest, eps, with_ln, with_res):
    if with_res:
        res_ref, out_ref = rest
    else:
        (out_ref,) = rest
    x = x_ref[...]
    if with_ln:
        scale = sb_ref[0:1, :].astype(jnp.float32)
        bias = sb_ref[1:2, :].astype(jnp.float32)
        y = _ln_f32(x.astype(jnp.float32), scale, bias, eps).astype(x.dtype)
    else:
        y = x
    out = jax.lax.dot_general(
        y, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(x.dtype)
    if with_res:
        out = res_ref[...] + out
    out_ref[...] = out


def _pallas_ln_matmul(x, scale, bias, w, res, *, eps, with_ln, block_rows=512):
    dt = x.dtype
    d = x.shape[-1]
    n = w.shape[1]
    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d)
    rows_pad = _cdiv(rows, block_rows) * block_rows
    if rows_pad != rows:
        x2 = jnp.pad(x2, [(0, rows_pad - rows), (0, 0)])

    sb = jnp.zeros((8, d), jnp.float32)
    if with_ln:
        sb = sb.at[0].set(scale.astype(jnp.float32))
        if bias is not None:
            sb = sb.at[1].set(bias.astype(jnp.float32))

    in_specs = [
        pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x2, sb, w.astype(dt)]
    with_res = res is not None
    if with_res:
        r2 = res.reshape(rows, n)
        if rows_pad != rows:
            r2 = jnp.pad(r2, [(0, rows_pad - rows), (0, 0)])
        in_specs.append(pl.BlockSpec((block_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(r2)

    out = pl.pallas_call(
        functools.partial(_lnmm_kernel, eps=eps, with_ln=with_ln, with_res=with_res),
        grid=(rows_pad // block_rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, n), dt),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * d * n,
            bytes_accessed=(rows_pad * (d + n) + d * n) * dt.itemsize,
            transcendentals=0,
        ),
    )(*args)
    return out[:rows].reshape(*lead, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _ln_matmul(x, scale, bias, w, res, eps, with_ln, block_rows):
    from ..utils.platform import active_mesh, dp_rows_ok, dp_shard_rows

    # mesh-aware no-grad primal: run per data-shard (rows are independent);
    # GSPMD would otherwise all-gather the opaque pallas_call's operands.
    # Optional bias/res ride as closures (None has no shard_map spec).
    mesh = active_mesh()
    if mesh is not None and dp_rows_ok(mesh, x):
        has_bias = bias is not None
        has_res = res is not None

        def call(x_, res_, scale_, bias_, w_):
            return _pallas_ln_matmul(
                x_, scale_, bias_ if has_bias else None, w_,
                res_ if has_res else None,
                eps=eps, with_ln=with_ln, block_rows=block_rows,
            )

        dummy_r = x if not has_res else res
        dummy_b = scale if not has_bias else bias
        return dp_shard_rows(mesh, call, (x, dummy_r), (scale, dummy_b, w))
    return _pallas_ln_matmul(
        x, scale, bias, w, res, eps=eps, with_ln=with_ln, block_rows=block_rows
    )


def _ln_matmul_fwd(x, scale, bias, w, res, eps, with_ln, block_rows):
    out = reference_ln_matmul(x, scale, bias, w, res, eps=eps, with_ln=with_ln)
    # res rides along only to signal presence (None stays None); when set it
    # is the layer input, which other residuals already keep live
    return out, (x, scale, bias, w, res)


def _ln_matmul_bwd(eps, with_ln, block_rows, resid, g):
    x, scale, bias, w, res = resid
    dt = x.dtype
    d = x.shape[-1]
    n = w.shape[1]
    if with_ln:
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(mean2 - mu * mu, 0.0)
        r = jax.lax.rsqrt(var + eps)
        xhat = (xf - mu) * r
        biasf = jnp.zeros((d,), jnp.float32) if bias is None else bias.astype(jnp.float32)
        y = (xhat * scale.astype(jnp.float32) + biasf).astype(dt)
    else:
        y = x
    y2 = y.reshape(-1, d)
    g2 = g.reshape(-1, n)
    dw = jax.lax.dot_general(y2, g2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dy = jnp.dot(g, w.astype(dt).T)
    if with_ln:
        dyf = dy.astype(jnp.float32)
        dscale = jnp.sum(dyf * xhat, axis=tuple(range(dyf.ndim - 1)))
        dbias = jnp.sum(dyf, axis=tuple(range(dyf.ndim - 1))) if bias is not None else None
        dxhat = dyf * scale.astype(jnp.float32)
        dxf = r * (
            dxhat
            - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        )
        dx = dxf.astype(dt)
    else:
        dscale = jnp.zeros_like(scale)
        dbias = None if bias is None else jnp.zeros_like(bias)
        dx = dy
    dres = None if res is None else g  # residual passes the cotangent through
    return dx, dscale, dbias, dw, dres


_ln_matmul.defvjp(_ln_matmul_fwd, _ln_matmul_bwd)


def fused_ln_matmul(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    scale: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    residual: jnp.ndarray | None = None,
    eps: float = 1e-5,
    block_rows: int = 512,
) -> jnp.ndarray:
    """(residual +) LN(x) @ w; LN skipped when ``scale`` is None.

    Pallas on the no-grad path; exact XLA composition + analytic gradients
    under autodiff. Differentiating w.r.t. ``bias``/``residual`` works when
    they are provided (None entries are dropped from the grads by jax)."""
    with_ln = scale is not None
    if not with_ln:
        scale = jnp.ones((x.shape[-1],), jnp.float32)
    return _ln_matmul(x, scale, bias, w, residual, eps, with_ln, block_rows)


def lnmm_fusable(d_in: int, d_out: int, dtype=jnp.bfloat16) -> bool:
    """Shape-only fusability: lane-aligned dims; fp32 gated by the same
    resident-weight bound that crashes Mosaic for fused_ffn (10.6 MB at fp32
    768/2304). Env gating (FUSED_LNMM_*_ENABLED) is the caller's job so the
    smoke tool can exercise the kernel regardless of the production default."""
    if dtype == jnp.float32 and 4 * d_in * d_out > 7_000_000:
        return False
    return d_in % 128 == 0 and d_out % 128 == 0


# ---------------------------------------------------------------------------
# W8A8 variant: LN -> per-row int8 quant -> int8 matmul (MXU 2x at N=2304)
#
# tools/bench_int8.py showed the int8 MXU premise holds (207 vs 109 TFLOP/s
# at K=N=768) but a separate XLA dynamic-quant pass costs more than the
# matmul saves. Here the activation quant rides inside the LN kernel on
# VMEM-resident data (the exact "fused LN->int8" follow-up the ROADMAP
# dead-end entry prescribes): per-row absmax over the LN output, symmetric
# round to [-127, 127], int8 x int8 -> int32 dot, dequant by
# row_scale x per-channel weight scale on the way out. Weights quantize
# per output channel OUTSIDE the kernel (once per forward; 1.7 M elements).
#
# Extraction-path only (no-grad): training always runs the bf16 composition.
# Gated by CM3P_W8A8=1 until the accuracy A/B on real weights is recorded.
# ---------------------------------------------------------------------------

W8A8_ENABLED = os.environ.get("CM3P_W8A8", "0") == "1"

from .fused_ffn import _quant_rows_int8, quantize_weight_int8  # noqa: E402  (shared quantizers)


def _lnmm_q_kernel(x_ref, sb_ref, w_ref, sw_ref, *rest, eps, with_ln, with_res):
    if with_res:
        res_ref, out_ref = rest
    else:
        (out_ref,) = rest
    x = x_ref[...]
    if with_ln:
        scale = sb_ref[0:1, :].astype(jnp.float32)
        bias = sb_ref[1:2, :].astype(jnp.float32)
        y = _ln_f32(x.astype(jnp.float32), scale, bias, eps)
    else:
        y = x.astype(jnp.float32)
    q, sa = _quant_rows_int8(y)  # shared with the FFN kernel — keep in sync
    acc = jax.lax.dot_general(
        q, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    sw = sw_ref[0:1, :]
    y_out = acc.astype(jnp.float32) * sa * sw
    if with_res:
        out_ref[...] = res_ref[...] + y_out.astype(x.dtype)
    else:
        out_ref[...] = y_out.astype(x.dtype)


def _pallas_ln_matmul_q(x, scale, bias, w_i8, scale_w, res=None, *, eps, with_ln, block_rows=512):
    dt = x.dtype
    d = x.shape[-1]
    n = w_i8.shape[1]
    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d)
    rows_pad = _cdiv(rows, block_rows) * block_rows
    if rows_pad != rows:
        x2 = jnp.pad(x2, [(0, rows_pad - rows), (0, 0)])
        if res is not None:
            res = jnp.pad(res.reshape(rows, n), [(0, rows_pad - rows), (0, 0)])
    elif res is not None:
        res = res.reshape(rows, n)

    sb = jnp.zeros((8, d), jnp.float32)
    if with_ln:
        sb = sb.at[0].set(scale.astype(jnp.float32))
        if bias is not None:
            sb = sb.at[1].set(bias.astype(jnp.float32))
    sw = jnp.zeros((8, n), jnp.float32).at[0].set(scale_w.astype(jnp.float32))

    in_specs = [
        pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [x2, sb, w_i8, sw]
    if res is not None:
        in_specs.append(pl.BlockSpec((block_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(res)

    out = pl.pallas_call(
        functools.partial(_lnmm_q_kernel, eps=eps, with_ln=with_ln, with_res=res is not None),
        grid=(rows_pad // block_rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, n), dt),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * d * n,
            bytes_accessed=rows_pad * (d * dt.itemsize + n * dt.itemsize) + d * n
            + (rows_pad * n * dt.itemsize if res is not None else 0),
            transcendentals=0,
        ),
    )(*args)
    return out[:rows].reshape(*lead, n)


def reference_ln_matmul_q(x, scale, bias, w, *, eps, with_ln):
    """XLA composition of the SAME quantized math (for parity tests)."""
    dt = x.dtype
    if with_ln:
        if bias is None:
            bias = jnp.zeros((x.shape[-1],), jnp.float32)
        y = _ln_f32(
            x.astype(jnp.float32), scale.astype(jnp.float32), bias.astype(jnp.float32), eps
        )
    else:
        y = x.astype(jnp.float32)
    wq, sw = quantize_weight_int8(w)
    q, sa = _quant_rows_int8(y)
    acc = jax.lax.dot_general(
        q, wq, (((q.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * sa * sw).astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _ln_matmul_q(x, scale, bias, w, res, eps, with_ln, block_rows):
    from ..utils.platform import active_mesh, dp_rows_ok, dp_shard_rows

    wq, sw = quantize_weight_int8(w)
    mesh = active_mesh()
    if mesh is not None and dp_rows_ok(mesh, x):
        has_bias = bias is not None
        has_res = res is not None

        def call(x_, res_, scale_, bias_, wq_, sw_):
            return _pallas_ln_matmul_q(
                x_, scale_, bias_ if has_bias else None, wq_, sw_,
                res_ if has_res else None,
                eps=eps, with_ln=with_ln, block_rows=block_rows,
            )

        dummy_b = scale if not has_bias else bias
        dummy_r = x if not has_res else res
        return dp_shard_rows(mesh, call, (x, dummy_r), (scale, dummy_b, wq, sw))
    return _pallas_ln_matmul_q(
        x, scale, bias, wq, sw, res, eps=eps, with_ln=with_ln, block_rows=block_rows
    )


def _ln_matmul_q_fwd(x, scale, bias, w, res, eps, with_ln, block_rows):
    # under autodiff: exact bf16 composition forward (training math unchanged,
    # same contract as _ln_matmul) — W8A8 runs only on no-grad primals
    out = reference_ln_matmul(x, scale, bias, w, res, eps=eps, with_ln=with_ln)
    return out, (x, scale, bias, w, res)


def _ln_matmul_q_bwd(eps, with_ln, block_rows, resid, g):
    return _ln_matmul_bwd(eps, with_ln, block_rows, resid, g)


_ln_matmul_q.defvjp(_ln_matmul_q_fwd, _ln_matmul_q_bwd)


def fused_ln_matmul_q(
    x, w, *, scale=None, bias=None, residual=None, eps: float = 1e-5, block_rows: int = 512
):
    """W8A8 (residual +) LN(x) @ w; LN skipped when ``scale`` is None.

    No-grad primal runs the int8 kernel; under autodiff the exact bf16
    composition runs instead (gradients/training unaffected)."""
    with_ln = scale is not None
    if not with_ln:
        scale = jnp.ones((x.shape[-1],), jnp.float32)
    return _ln_matmul_q(x, scale, bias, w, residual, eps, with_ln, block_rows)
