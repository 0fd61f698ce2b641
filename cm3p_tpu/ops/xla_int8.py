"""W8A8 matmul on the plain XLA path — no Pallas boundary.

Why this exists: the in-Pallas int8 paths (``CM3P_W8A8`` riding the
lnmm/FFN kernels) proved the v5e int8 MXU rate is real (~1.9x on the
micro, tools/bench_lnmm_q.py) but the standalone lnmm kernel they rode on
costs -30% end to end — the pallas_call boundary defeats XLA's
surrounding fusion/layout choices (BASELINE.md round-2c; docs/ROADMAP.md
"Ideas that didn't pay off"). This module quantizes with ordinary XLA ops
instead: the absmax/round/clip chain fuses into neighboring elementwise
work, the int8 x int8 -> int32 ``lax.dot_general`` lowers straight to the
MXU, and XLA keeps its full fusion/layout freedom because no opaque
custom call is introduced.

Covers the dense projections that stay on the XLA path in the production
config: Wqkv (768 -> 2304) and attention Wo (768 -> 768) — together ~47%
of the dense stack's flops (the FFN pair normally runs inside
ops/fused_ffn.py, which has its own in-kernel int8 gates). When the fused
FFN kernel declines — attn_impl="xla", fp32 activations at the beatmap
shape, active mlp_dropout — the unfused GeGLU ALSO routes Wi/Wo through
this module (models/modernbert.py GeGLU), so in those configs the gate
covers all four projections, not 47%. Reference counterpart: the
ModernBERT attention projections, /root/reference/cm3p/modeling_cm3p.py
:607-619 (always bf16 there).

Accuracy prior: end-to-end ALL-int8 embedding drift measured 2.7e-5 max
on real v5e (tools/bench_int8_drift.py) — 40x inside the 1e-3 parity
budget. Throughput must be established by a same-day end-to-end A/B
before the gate defaults on (the lnmm lesson).

Gate: ``CM3P_XLA_INT8=1`` (default OFF). Training math is untouched
either way: ``int8_dot`` is a custom_vjp whose differentiated forward
runs the exact bf16 product (the same trick as ops/fused_ffn.py), so
autodiff — and therefore every gradient test and the train step — sees
the bf16 path bit for bit.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

XLA_INT8_ENABLED = os.environ.get("CM3P_XLA_INT8", "0") == "1"


def _quant_rows_int8(x: jnp.ndarray):
    """Per-row symmetric int8 over the last axis: (q int8, scale f32 (..., 1))."""
    xf = x.astype(jnp.float32)
    sa = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(xf / sa), -127.0, 127.0).astype(jnp.int8)
    return q, sa


def _quant_weight_int8(w: jnp.ndarray):
    """Per-output-channel symmetric int8 for a (D, N) weight: (q, scale (N,))."""
    wf = w.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / sw), -127.0, 127.0).astype(jnp.int8)
    return q, sw


@jax.custom_vjp
def int8_dot(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``x @ w`` with both operands quantized to int8 (W8A8), out in x.dtype.

    x: (..., D) activations (any float dtype); w: (D, N) fp32 weight.
    Primal only — under autodiff the bf16 product runs instead (custom_vjp
    forward below), keeping training math identical to ``nn.Dense``.
    """
    q, sa = _quant_rows_int8(x)
    wq, sw = _quant_weight_int8(w)
    acc = jax.lax.dot_general(
        q, wq, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * sa * sw).astype(x.dtype)


def _int8_dot_fwd(x, w):
    # differentiated forward: the exact product nn.Dense(dtype=x.dtype)
    # computes — training math unchanged by the gate
    return jnp.dot(x, w.astype(x.dtype)), (x, w)


def _int8_dot_bwd(res, g):
    x, w = res
    dx = jnp.dot(g, w.astype(x.dtype).T)
    g2 = g.reshape(-1, g.shape[-1])
    x2 = x.reshape(-1, x.shape[-1])
    dw = jax.lax.dot_general(
        x2, g2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dx, dw


int8_dot.defvjp(_int8_dot_fwd, _int8_dot_bwd)
