"""Fused LayerNorm + GeGLU FFN Pallas kernel (pre-norm MLP half-block).

Motivation (docs/ROADMAP.md "speed-of-light accounting"): the non-attention
stack runs at its *combined* matmul + HBM bound because XLA materializes the
(R, 2·F) GeGLU intermediate and the LayerNorm output in HBM between matmuls
— ~10 GB/layer of elementwise traffic at the packed extraction shape. This
kernel computes

    out = x + Wo( act(a) * b )   where  [a | b] = Wi( LN(x) )

entirely on VMEM-resident blocks: both weight matrices stay resident across
grid steps (bf16 Wi+Wo = 5.2 MB at the beatmap-tower shape), each (rows, D)
row block is read once and written once, and the LN statistics, the (rows,
2F) intermediate, and the gating never touch HBM.

Differentiation contract (same pattern as the in-kernel rope in
flash_attention.py): the no-grad primal runs the Pallas kernel; under
autodiff the custom_vjp ``fwd`` runs the exact XLA composition the flax
modules would (bit-identical training forward) and the backward is the
analytic gradient of that composition — the same four matmuls XLA autodiff
emits, with the cheap LN/GeGLU elementwise pieces recomputed from the saved
``x`` and pre-split intermediate ``h``.

Replaces the separate LayerNormF32 -> GeGLU modules on the encoder hot path
(models/modernbert.py); reference counterpart: ``modeling_cm3p.py:607-619``'s
ModernBERT MLP (mlp_norm -> Wi -> GeLU*gate -> Wo).
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)

FUSED_FFN_ENABLED = os.environ.get("CM3P_FUSED_FFN", "1") != "0"

# Second-stage W8A8: also run the FFN's Wo (1152 -> 768) matmul in int8.
# The GeGLU output is already fp32 and VMEM-resident in the kernel, so the
# per-row quant rides for free on top of the elementwise gelu*gate pass;
# independent gate so perf/accuracy can be A/B'd separately from CM3P_W8A8
# (which covers the N=2304 projections). Extraction-path only, like w8a8.
W8A8_WO_ENABLED = os.environ.get("CM3P_W8A8_WO", "0") == "1"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ln_f32(xf: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float):
    """flax nn.LayerNorm formula (order-faithful), fp32 in/out."""
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mu * mu, 0.0)
    mul = jax.lax.rsqrt(var + eps) * scale
    return (xf - mu) * mul + bias


def _gelu_exact_f32(u: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * u * (1.0 + jax.lax.erf(u / _SQRT2))


def _erf_approx_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 rational erf: ~4e-7 max abs error in fp32
    (1.5e-7 approximation bound + polynomial rounding; measured).

    Mosaic has no ``erf`` lowering (only exp/exp2 transcendentals); 4e-7
    absolute error vanishes entirely in the bf16 cast the kernel emits.
    """
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_kernel_f32(u: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * u * (1.0 + _erf_approx_f32(u * (1.0 / _SQRT2)))


def quantize_weight_int8(w):
    """Per-output-channel symmetric int8: returns (w_i8 (D, N), scale_w (N,) f32)."""
    wf = w.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-30)
    sw = amax / 127.0
    wq = jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8)
    return wq, sw


def _quant_rows_int8(y: jnp.ndarray):
    """Per-row symmetric int8 over fp32 activations: (q i8, row_scale f32)."""
    amax = jnp.maximum(jnp.max(jnp.abs(y), axis=-1, keepdims=True), 1e-30)
    sa = amax * (1.0 / 127.0)
    q = jnp.clip(jnp.round(y / sa), -127.0, 127.0).astype(jnp.int8)
    return q, sa


def _gelu_exact_grad_f32(u: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (1.0 + jax.lax.erf(u / _SQRT2)) + u * jnp.exp(-0.5 * u * u) * _INV_SQRT_2PI


def reference_ln_ffn(x, scale, bias, wi, wo, *, eps: float, residual: bool = True):
    """XLA composition matching LayerNormF32 + GeGLU(gelu) module semantics.

    x: (..., D) activation dtype; scale/bias: (D,) fp32 (bias may be zeros);
    wi: (D, 2F) fp32 params; wo: (F, D) fp32 params.
    """
    dt = x.dtype
    if bias is None:
        bias = jnp.zeros((x.shape[-1],), jnp.float32)
    y = _ln_f32(x.astype(jnp.float32), scale.astype(jnp.float32), bias.astype(jnp.float32), eps)
    yb = y.astype(dt)
    h = jnp.dot(yb, wi.astype(dt))  # bf16 matmul like flax Dense(dtype=dt)
    f = wo.shape[0]
    inp, gate = h[..., :f], h[..., f:]
    a = jax.nn.gelu(inp, approximate=False)
    gb = (a * gate).astype(dt)
    o = jnp.dot(gb, wo.astype(dt))
    return x + o if residual else o


# ------------------------------------------------------------------- kernel


def _ffn_kernel(x_ref, sb_ref, wi_ref, wo_ref, *rest, eps, d_ff, residual, w8a8, w8a8_wo):
    pos = 0
    swi_ref = swo_ref = None
    if w8a8:
        swi_ref = rest[pos]
        pos += 1
    if w8a8_wo:
        swo_ref = rest[pos]
        pos += 1
    out_ref = rest[pos]
    x = x_ref[...]  # (rows, D) activation dtype
    xf = x.astype(jnp.float32)
    scale = sb_ref[0:1, :].astype(jnp.float32)
    bias = sb_ref[1:2, :].astype(jnp.float32)
    y = _ln_f32(xf, scale, bias, eps)
    if w8a8:
        # int8 MXU for the 2304-wide Wi (the only matmul where W8A8 nets a
        # win, tools/bench_int8.py); Wo at N=768 stays bf16
        q, sa = _quant_rows_int8(y)
        acc = jax.lax.dot_general(
            q, wi_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        h = (acc.astype(jnp.float32) * sa * swi_ref[0:1, :]).astype(x.dtype)
    else:
        yb = y.astype(x.dtype)
        h = jax.lax.dot_general(
            yb, wi_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)  # cast to match the XLA path's bf16 intermediate
    inp = h[:, :d_ff].astype(jnp.float32)
    gate = h[:, d_ff:].astype(jnp.float32)
    gf = _gelu_kernel_f32(inp) * gate
    if w8a8_wo:
        # int8 Wo: the fp32 GeGLU product is already VMEM-resident — per-row
        # quant is one absmax+round pass on top of the gelu*gate elementwise
        gq, sg = _quant_rows_int8(gf)
        acc = jax.lax.dot_general(
            gq, wo_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        o = (acc.astype(jnp.float32) * sg * swo_ref[0:1, :]).astype(x.dtype)
    else:
        gb = gf.astype(x.dtype)
        o = jax.lax.dot_general(
            gb, wo_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(x.dtype)
    out_ref[...] = x + o if residual else o


def _pallas_ln_ffn(
    x, scale, bias, wi, wo, *, eps, residual, block_rows, w8a8=False, w8a8_wo=False,
    interpret=False,
):
    dt = x.dtype
    d = x.shape[-1]
    d_ff = wo.shape[0]
    lead = x.shape[:-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = x.reshape(rows, d)
    rows_pad = _cdiv(rows, block_rows) * block_rows
    if rows_pad != rows:
        x2 = jnp.pad(x2, [(0, rows_pad - rows), (0, 0)])

    # scale row 0 / bias row 1, 8-sublane-aligned block
    sb = jnp.zeros((8, d), jnp.float32)
    sb = sb.at[0].set(scale.astype(jnp.float32))
    sb = sb.at[1].set(bias.astype(jnp.float32))

    in_specs = [
        pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 2 * d_ff), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d_ff, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if w8a8:
        wi_arg = quantize_weight_int8(wi)
    else:
        wi_arg = (wi.astype(dt), None)
    if w8a8_wo:
        wo_arg = quantize_weight_int8(wo)
    else:
        wo_arg = (wo.astype(dt), None)
    args = [x2, sb, wi_arg[0], wo_arg[0]]
    if w8a8:
        in_specs.append(pl.BlockSpec((8, 2 * d_ff), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.append(jnp.zeros((8, 2 * d_ff), jnp.float32).at[0].set(wi_arg[1]))
    if w8a8_wo:
        in_specs.append(pl.BlockSpec((8, d), lambda i: (0, 0), memory_space=pltpu.VMEM))
        args.append(jnp.zeros((8, d), jnp.float32).at[0].set(wo_arg[1]))

    # NB: pass `interpret` only when set — tests monkeypatch pl.pallas_call
    # with interpret=True, and an explicit False here would override it
    kwargs = {"interpret": True} if interpret else {}
    out = pl.pallas_call(
        functools.partial(
            _ffn_kernel, eps=eps, d_ff=d_ff, residual=residual, w8a8=w8a8, w8a8_wo=w8a8_wo
        ),
        grid=(rows_pad // block_rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_pad, d), dt),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows_pad * d * 2 * d_ff + 2 * rows_pad * d_ff * d,
            bytes_accessed=2 * rows_pad * d * dt.itemsize + (d * 2 * d_ff + d_ff * d) * dt.itemsize,
            transcendentals=rows_pad * d_ff,
        ),
        **kwargs,
    )(*args)
    return out[:rows].reshape(*lead, d)


# -------------------------------------------------------------- custom vjp


# Memoized inline-jit dispatch: pallas_call has no kernel-trace cache, so
# 22 FFN layers would re-trace the identical kernel 22 times per outer jit
# trace. A stable jitted function per static config makes layers 2..22 hit
# pjit's jaxpr cache; inline=True keeps the lowered HLO identical. The key
# carries the live pl.pallas_call (tests monkeypatch it to interpret mode).
# See the longer rationale in ops/flash_attention.py.
JIT_DISPATCH = os.environ.get("CM3P_JIT_DISPATCH", "1") != "0"


@functools.lru_cache(maxsize=256)
def _jitted_pallas_ffn(eps, residual, block_rows, w8a8, w8a8_wo, _key):
    def call(x, scale, bias, wi, wo):
        return _pallas_ln_ffn(
            x, scale, bias, wi, wo, eps=eps, residual=residual,
            block_rows=block_rows, w8a8=w8a8, w8a8_wo=w8a8_wo,
        )

    return jax.jit(call, inline=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _ln_ffn(x, scale, bias, wi, wo, eps, residual, block_rows, w8a8, w8a8_wo):
    from ..utils.platform import active_mesh, dp_rows_ok, dp_shard_rows

    if JIT_DISPATCH:
        call = _jitted_pallas_ffn(eps, residual, block_rows, w8a8, w8a8_wo, pl.pallas_call)
    else:
        def call(x_, scale_, bias_, wi_, wo_):
            return _pallas_ln_ffn(
                x_, scale_, bias_, wi_, wo_, eps=eps, residual=residual,
                block_rows=block_rows, w8a8=w8a8, w8a8_wo=w8a8_wo,
            )

    # mesh-aware no-grad primal: run per data-shard (rows are independent);
    # GSPMD would otherwise all-gather the opaque pallas_call's operands
    mesh = active_mesh()
    if mesh is not None and dp_rows_ok(mesh, x):
        return dp_shard_rows(mesh, call, (x,), (scale, bias, wi, wo))
    return call(x, scale, bias, wi, wo)


def _ln_ffn_fwd(x, scale, bias, wi, wo, eps, residual, block_rows, w8a8, w8a8_wo):
    # Differentiated forward: run the exact XLA composition (training math is
    # identical to the unfused modules) and save x + the pre-split GeGLU
    # intermediate h — the same activation set XLA autodiff keeps live.
    dt = x.dtype
    y = _ln_f32(x.astype(jnp.float32), scale.astype(jnp.float32), bias.astype(jnp.float32), eps)
    yb = y.astype(dt)
    h = jnp.dot(yb, wi.astype(dt))
    f = wo.shape[0]
    inp, gate = h[..., :f], h[..., f:]
    a = jax.nn.gelu(inp, approximate=False)
    gb = (a * gate).astype(dt)
    o = jnp.dot(gb, wo.astype(dt))
    out = x + o if residual else o
    return out, (x, scale, bias, wi, wo, h)


def _ln_ffn_bwd(eps, residual, block_rows, w8a8, w8a8_wo, res, g):
    x, scale, bias, wi, wo, h = res
    dt = x.dtype
    d = x.shape[-1]
    f = wo.shape[0]

    # recompute the cheap elementwise pieces (no forward matmuls)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - mu * mu, 0.0)
    r = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * r
    yb = (xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dt)
    inp, gate = h[..., :f], h[..., f:]
    inp_f = inp.astype(jnp.float32)
    a = _gelu_exact_f32(inp_f)
    gate_f = gate.astype(jnp.float32)
    gb = (a * gate_f).astype(dt)

    go = g  # residual passes g through to both x and the FFN output
    # flatten leading dims for the weight-grad contractions
    g2 = go.reshape(-1, d)
    gb2 = gb.reshape(-1, f)
    yb2 = yb.reshape(-1, d)

    dwo = jax.lax.dot_general(
        gb2, g2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dgb = jnp.dot(go, wo.astype(dt).T).astype(jnp.float32)
    da = dgb * gate_f
    dgate = dgb * a
    dinp = da * _gelu_exact_grad_f32(inp_f)
    dh = jnp.concatenate([dinp, dgate], axis=-1).astype(dt)
    dh2 = dh.reshape(-1, 2 * f)
    dwi = jax.lax.dot_general(
        yb2, dh2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dy = jnp.dot(dh, wi.astype(dt).T).astype(jnp.float32)

    dscale = jnp.sum(dy * xhat, axis=tuple(range(dy.ndim - 1)))
    dbias = jnp.sum(dy, axis=tuple(range(dy.ndim - 1)))
    dxhat = dy * scale.astype(jnp.float32)
    dxf = r * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dx = dxf.astype(dt)
    if residual:
        dx = dx + g
    return dx, dscale, dbias, dwi, dwo


_ln_ffn.defvjp(_ln_ffn_fwd, _ln_ffn_bwd)


def fused_ln_ffn(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray | None,
    wi: jnp.ndarray,
    wo: jnp.ndarray,
    *,
    eps: float,
    residual: bool = True,
    block_rows: int = 512,  # measured optimum: 16.4/15.4/15.0 ms/layer at
    # 128/256/512 rows (B123-packed shape, v5e); 1024 fails to compile
    w8a8: bool = False,  # int8 Wi on the no-grad primal (CM3P_W8A8 gate)
    w8a8_wo: bool = False,  # int8 Wo too (CM3P_W8A8_WO gate)
) -> jnp.ndarray:
    """x + Wo(gelu(a) * b) with [a|b] = Wi(LN(x)); Pallas on the no-grad path.

    ``bias`` may be None (norm_bias=False configs) — a zero vector is
    substituted; its gradient is discarded by the caller's param structure.
    """
    if bias is None:
        bias = jnp.zeros((x.shape[-1],), jnp.float32)
    return _ln_ffn(x, scale, bias, wi, wo, eps, residual, block_rows, w8a8, w8a8_wo)


def fusable(
    d_model: int,
    d_ff: int,
    activation: str,
    mlp_bias: bool,
    dropout_active: bool,
    dtype=jnp.bfloat16,
) -> bool:
    """Shapes/flags the kernel supports: lane-aligned dims, exact gelu, no
    mlp bias, no active dropout.

    fp32 activations additionally require the resident weights to stay small:
    the 768/1152 beatmap shape (10.6 MB fp32 Wi+Wo) crashes the Mosaic
    compiler at every block size tried on v5e (tools/tpu_smoke.py), while the
    audio (6 MB) and metadata (1.5 MB) shapes compile and run. bf16 passes
    at all three tower shapes."""
    if dtype == jnp.float32 and 4 * (d_model * 2 * d_ff + d_ff * d_model) > 7_000_000:
        return False
    return (
        FUSED_FFN_ENABLED
        and activation == "gelu"
        and not mlp_bias
        and not dropout_active
        and d_model % 128 == 0
        and (2 * d_ff) % 128 == 0
        and d_ff % 128 == 0
    )
