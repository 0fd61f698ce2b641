"""ModernBERT-style encoder in flax.linen, designed TPU-first.

This is the single encoder implementation backing all three CM3P towers
(beatmap / metadata / audio), replacing the reference's dependency on HF
``ModernBertModel`` (``modeling_cm3p.py:10``). Architectural contract kept
for checkpoint-conversion parity:

* no position embeddings — rotary (RoPE) inside attention, with dual theta:
  ``global_rope_theta`` on global layers, ``local_rope_theta`` on local ones
* alternating attention: layer ``i`` is global iff
  ``i % global_attn_every_n_layers == 0``; local layers use a sliding window
  of ``local_attention`` tokens (|i-j| <= window // 2)
* pre-norm blocks with fused QKV and GeGLU MLP; layer 0 skips the attention
  pre-norm (identity), exactly like ModernBERT
* exact (erf) GELU, LayerNorm eps/bias per config

TPU-first choices: static padded shapes with additive mask bias (no varlen
unpadding — see SURVEY.md §5), fp32 softmax/LayerNorm with bf16 matmuls via
the ``dtype`` knob, optional Pallas flash-attention path
(``attn_impl='pallas'``) that skips fully-masked key blocks on local layers.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import EncoderConfig

NEG_INF = -1e9  # additive mask value; fp32-safe, bf16-castable


def trunc_normal_init(std: float, cutoff_factor: float = 2.0):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(key, -cutoff_factor, cutoff_factor, shape, dtype)

    return init


def exact_gelu(x):
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "gelu": exact_gelu,
    "gelu_tanh": partial(jax.nn.gelu, approximate=True),
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float, dtype=jnp.float32):
    """cos/sin tables for llama-style rotary embedding: (..., L, head_dim)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (..., L, head_dim/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _rotate_half_matrix(d: int, dtype) -> jnp.ndarray:
    """(D, D) permutation matrix R with x @ R == rotate_half(x).

    The split+concat form costs ~12 ms/layer at B64 on TPU (the 64-wide
    last-dim slices defeat XLA's fusion and run at a fraction of HBM rate —
    measured 267 ms of a 1.57 s forward, tools/bench_decompose_rope.py);
    as a +-1 single-nonzero-per-column matmul it rides the MXU inside one
    fused pass and is numerically EXACT in any dtype (each output element
    is one input element, possibly negated — no summation rounding).
    """
    half = d // 2
    r = jnp.zeros((d, d), dtype)
    r = r.at[jnp.arange(half) + half, jnp.arange(half)].set(-1)  # out[:half] = -x[half:]
    r = r.at[jnp.arange(half), jnp.arange(half) + half].set(1)   # out[half:] = x[:half]
    return r


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """Apply rotary embedding. q/k: head-minor (B, L, H, D); cos/sin: (B, L, D) or (L, D)."""
    if cos.ndim == 2:
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    else:
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    r = _rotate_half_matrix(q.shape[-1], q.dtype)
    dn = (((q.ndim - 1,), (0,)), ((), ()))
    q = q * cos + jax.lax.dot_general(q, r, dn, preferred_element_type=q.dtype) * sin
    k = k * cos + jax.lax.dot_general(k, r, dn, preferred_element_type=k.dtype) * sin
    return q, k


def sliding_window_bias(seq_len: int, window: int, dtype=jnp.float32) -> jnp.ndarray:
    """(L, L) additive bias masking |i-j| > window // 2."""
    idx = jnp.arange(seq_len)
    dist = jnp.abs(idx[:, None] - idx[None, :])
    return jnp.where(dist <= window // 2, 0.0, NEG_INF).astype(dtype)


def padding_bias(attention_mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, 1, 1, L) additive bias from a 0/1 padding mask."""
    return jnp.where(attention_mask[:, None, None, :] > 0, 0.0, NEG_INF).astype(dtype)


def xla_attention(q, k, v, bias, dropout_rate=0.0, deterministic=True, dropout_rng=None):
    """Reference attention over head-minor (B, L, H, D): fp32 softmax."""
    head_dim = q.shape[-1]
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / math.sqrt(head_dim)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep / (1.0 - dropout_rate)
    probs = probs.astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class SelfAttention(nn.Module):
    """Fused-QKV rotary self-attention block.

    ``sp_mesh``: optional Mesh with a ``sp_axis`` axis — activates
    sequence-parallel allgather-KV attention (parallel/sequence.py) for
    windows beyond one chip's memory; queries stay sharded, k/v ride one
    tiled all-gather over ICI per layer. Packed segments are incompatible
    with SP (packing already bounds the window) and raise.
    """

    config: EncoderConfig
    layer_id: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    sp_mesh: Any = None
    sp_axis: str = "seq"

    @nn.compact
    def __call__(
        self,
        x,
        bias,
        cos,
        sin,
        flash_window=None,
        segment_ids=None,
        deterministic=True,
        fuse_rope=False,
        pre_norm=None,
        residual=None,
    ):
        cfg = self.config
        hidden = cfg.hidden_size
        heads = cfg.num_attention_heads
        head_dim = cfg.head_dim
        wo_std = cfg.initializer_range / math.sqrt(2.0 * cfg.num_hidden_layers)

        if pre_norm is not None or residual is not None:
            from ..ops.fused_ln_matmul import fused_ln_matmul, fused_ln_matmul_q

        if pre_norm is not None:
            # fused attn_norm -> Wqkv: x arrives RAW, the pre-norm's params
            # come from the EncoderLayer proxy; the LN output never reaches
            # HBM on no-grad forwards (ops/fused_ln_matmul.py)
            ln_scale, ln_bias = pre_norm
            wqkv = _KernelParam(
                (hidden, 3 * hidden),
                cfg.initializer_range,
                cfg.initializer_cutoff_factor,
                name="Wqkv",
            )()
            # CM3P_W8A8=1 quantizes the 2304-wide QKV projection in-kernel
            # (int8 MXU; no-grad primal only — autodiff runs the bf16 path)
            from ..ops.fused_ln_matmul import W8A8_ENABLED

            lnmm = fused_ln_matmul_q if W8A8_ENABLED else fused_ln_matmul
            qkv = lnmm(
                x.astype(self.dtype), wqkv, scale=ln_scale, bias=ln_bias, eps=cfg.norm_eps
            )
        else:
            from ..ops.xla_int8 import XLA_INT8_ENABLED, int8_dot

            if XLA_INT8_ENABLED and not cfg.attention_bias:
                # W8A8 on the plain XLA path (CM3P_XLA_INT8): same param
                # path/init as the nn.Dense below (checkpoints interchange);
                # autodiff runs the exact bf16 product (ops/xla_int8.py)
                wqkv = _KernelParam(
                    (hidden, 3 * hidden),
                    cfg.initializer_range,
                    cfg.initializer_cutoff_factor,
                    name="Wqkv",
                )()
                qkv = int8_dot(x.astype(self.dtype), wqkv)
            else:
                qkv = nn.Dense(
                    3 * hidden,
                    use_bias=cfg.attention_bias,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    kernel_init=trunc_normal_init(cfg.initializer_range, cfg.initializer_cutoff_factor),
                    name="Wqkv",
                )(x)
        b, l, _ = qkv.shape
        # head-minor (B, L, H, D): the layout the Pallas kernels take — no
        # (B, H, L, D) transposes anywhere on the flash path (they were real
        # HBM copies, and head-major DMAs run ~4x slower; see ops/flash_attention.py)
        qkv = qkv.reshape(b, l, 3, heads, head_dim)
        q, k, v = (qkv[:, :, i] for i in range(3))  # (B, L, H, D)

        # in-kernel rope (fuse_rope): the flash kernel rotates q/k on its
        # VMEM-resident blocks, deleting this standalone pass and one q/k
        # HBM round trip (ops/flash_attention.py fused-rope block comment)
        rope_theta = None
        if fuse_rope and flash_window is not None and self.sp_mesh is None:
            rope_theta = (
                cfg.global_rope_theta if flash_window < 0 else cfg.local_rope_theta
            )
        else:
            q, k = apply_rope(q, k, cos, sin)

        if self.sp_mesh is not None and flash_window is not None:
            # sequence-parallel path: L sharded over sp_axis, allgather-KV
            if segment_ids is not None:
                raise ValueError("sequence parallelism does not support packed segment_ids")
            from ..parallel.sequence import sequence_sharded_attention

            key_mask = None
            if bias is not None:
                key_mask = (bias.reshape(bias.shape[0], bias.shape[-1]) >= -0.5).astype(jnp.int32)
            window = None if flash_window < 0 else flash_window
            out = sequence_sharded_attention(
                q, k, v, key_mask, self.sp_mesh, seq_axis=self.sp_axis, window=window
            )
        elif flash_window is not None:
            # Pallas flash kernel. flash_window > 0 → windowed local layer
            # (4-5x faster than XLA's dense-masked path at 4k on v5e);
            # flash_window == -1 → global layer, streamed to avoid the
            # O(B·H·L²) score materialization that OOMs XLA at batch ≥ 16.
            from ..ops.flash_attention import FUSED_WO_ENABLED, flash_attention, wo_fusable

            window = None if flash_window < 0 else flash_window
            if (
                residual is not None
                and FUSED_WO_ENABLED
                and wo_fusable(window, 0, 0, hidden, hidden, l, l)
            ):
                # Wo-epilogue fusion: the attention output never reaches HBM
                # on no-grad forwards — the kernel finalize applies
                # residual + out @ Wo itself (CM3P_FUSED_WO gate)
                wo = _KernelParam(
                    (hidden, hidden), wo_std, cfg.initializer_cutoff_factor, name="Wo"
                )()
                return flash_attention(
                    q, k, v, bias=bias, window=window, segment_ids=segment_ids,
                    rope_theta=rope_theta, wo=wo, out_residual=residual,
                )
            out = flash_attention(
                q, k, v, bias=bias, window=window, segment_ids=segment_ids, rope_theta=rope_theta
            )
        else:
            out = xla_attention(
                q,
                k,
                v,
                bias,
                dropout_rate=cfg.attention_dropout,
                deterministic=deterministic,
                dropout_rng=None if deterministic else self.make_rng("dropout"),
            )

        out = out.reshape(b, l, hidden)
        if residual is not None:
            # Wo projection + residual add applied here (caller must NOT
            # re-add the residual). Three routes by gate:
            #   CM3P_FUSED_LNMM_WO -> one Pallas pass (optionally int8 via
            #   CM3P_W8A8_WO, which covers both Wo-side matmuls);
            #   otherwise -> plain XLA dot + add (fuses into the matmul
            #   epilogue; this is also the path when only the in-kernel Wo
            #   epilogue (CM3P_FUSED_WO) is on but wo_fusable declined).
            from ..ops.fused_ffn import W8A8_WO_ENABLED
            from ..ops.fused_ln_matmul import FUSED_LNMM_WO_ENABLED, fused_ln_matmul_q

            wo = _KernelParam(
                (hidden, hidden), wo_std, cfg.initializer_cutoff_factor, name="Wo"
            )()
            if FUSED_LNMM_WO_ENABLED:
                lnmm_wo = fused_ln_matmul_q if W8A8_WO_ENABLED else fused_ln_matmul
                return lnmm_wo(out, wo, residual=residual)
            from ..ops.xla_int8 import XLA_INT8_ENABLED, int8_dot

            if XLA_INT8_ENABLED:
                return residual + int8_dot(out.astype(self.dtype), wo)
            return residual + jnp.dot(out, wo.astype(self.dtype))
        from ..ops.xla_int8 import XLA_INT8_ENABLED, int8_dot

        if XLA_INT8_ENABLED and not cfg.attention_bias:
            wo = _KernelParam(
                (hidden, hidden), wo_std, cfg.initializer_cutoff_factor, name="Wo"
            )()
            return int8_dot(out.astype(self.dtype), wo)
        out = nn.Dense(
            hidden,
            use_bias=cfg.attention_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(wo_std, cfg.initializer_cutoff_factor),
            name="Wo",
        )(out)
        return out


class GeGLU(nn.Module):
    """ModernBERT MLP: Wi -> split(input, gate) -> act(input) * gate -> Wo."""

    config: EncoderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        act = ACTIVATIONS[cfg.hidden_activation]
        wo_std = cfg.initializer_range / math.sqrt(2.0 * cfg.num_hidden_layers)
        from ..ops.xla_int8 import XLA_INT8_ENABLED, int8_dot

        # CM3P_XLA_INT8 also covers this unfused path (it only runs when the
        # fused FFN kernel declines — fp32 shapes, dropout; the fused kernel
        # has its own in-kernel int8 gates). Param paths mirror the Dense
        # branch so checkpoints interchange.
        use_int8 = XLA_INT8_ENABLED and not cfg.mlp_bias
        if use_int8:
            wi = _KernelParam(
                (cfg.hidden_size, 2 * cfg.intermediate_size),
                cfg.initializer_range,
                cfg.initializer_cutoff_factor,
                name="Wi",
            )()
            h = int8_dot(x.astype(self.dtype), wi)
        else:
            h = nn.Dense(
                2 * cfg.intermediate_size,
                use_bias=cfg.mlp_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=trunc_normal_init(cfg.initializer_range, cfg.initializer_cutoff_factor),
                name="Wi",
            )(x)
        inp, gate = jnp.split(h, 2, axis=-1)
        h = act(inp) * gate
        if cfg.mlp_dropout > 0.0 and not deterministic:
            h = nn.Dropout(cfg.mlp_dropout)(h, deterministic=False)
        if use_int8:
            wo = _KernelParam(
                (cfg.intermediate_size, cfg.hidden_size),
                wo_std,
                cfg.initializer_cutoff_factor,
                name="Wo",
            )()
            return int8_dot(h.astype(self.dtype), wo)
        return nn.Dense(
            cfg.hidden_size,
            use_bias=cfg.mlp_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(wo_std, cfg.initializer_cutoff_factor),
            name="Wo",
        )(h)


class LayerNormF32(nn.Module):
    """LayerNorm computed in fp32 regardless of activation dtype."""

    eps: float
    use_bias: bool

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        out = nn.LayerNorm(epsilon=self.eps, use_bias=self.use_bias, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return out.astype(dtype)


class _LNParams(nn.Module):
    """Declares nn.LayerNorm's params (same child path ``LayerNorm_0``)
    without applying it — the fused FFN kernel consumes them directly.
    Param paths and path-keyed init RNGs match LayerNormF32 exactly, so
    checkpoints are interchangeable between the fused and unfused branches."""

    dim: int
    use_bias: bool

    class _Inner(nn.Module):
        dim: int
        use_bias: bool

        @nn.compact
        def __call__(self):
            scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
            bias = (
                self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
                if self.use_bias
                else None
            )
            return scale, bias

    @nn.compact
    def __call__(self):
        return _LNParams._Inner(self.dim, self.use_bias, name="LayerNorm_0")()


class _KernelParam(nn.Module):
    """Declares a Dense module's ``kernel`` param (same path, shape, and
    path-keyed init) without applying the Dense — fused kernels consume the
    raw weight. Checkpoints interchange with the nn.Dense the proxy mirrors."""

    shape: tuple
    std: float
    cutoff: float

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", trunc_normal_init(self.std, self.cutoff), self.shape, jnp.float32
        )


class _GeGLUParams(nn.Module):
    """Declares GeGLU's Dense kernels (paths ``Wi/kernel``, ``Wo/kernel``)
    with the same shapes/inits, without applying them (see _LNParams)."""

    config: EncoderConfig

    @nn.compact
    def __call__(self):
        cfg = self.config
        wo_std = cfg.initializer_range / math.sqrt(2.0 * cfg.num_hidden_layers)
        wi = _KernelParam(
            (cfg.hidden_size, 2 * cfg.intermediate_size),
            cfg.initializer_range,
            cfg.initializer_cutoff_factor,
            name="Wi",
        )()
        wo = _KernelParam(
            (cfg.intermediate_size, cfg.hidden_size),
            wo_std,
            cfg.initializer_cutoff_factor,
            name="Wo",
        )()
        return wi, wo


class EncoderLayer(nn.Module):
    config: EncoderConfig
    layer_id: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    sp_mesh: Any = None
    sp_axis: str = "seq"

    @nn.compact
    def __call__(
        self, x, bias, cos, sin, flash_window=None, segment_ids=None, deterministic=True, fuse_rope=False
    ):
        cfg = self.config
        from ..ops.flash_attention import FUSED_WO_ENABLED
        from ..ops.fused_ln_matmul import (
            FUSED_LNMM_QKV_ENABLED,
            FUSED_LNMM_WO_ENABLED,
            lnmm_fusable,
        )

        pallas_ok = self.attn_impl == "pallas" and not cfg.attention_bias
        # the QKV-side and Wo-side fusions gate independently (the lnmm QKV
        # kernel measured a headline LOSS in situ despite micro-neutrality;
        # see ops/fused_ln_matmul.py gate comment)
        fuse_attn_proj = (
            pallas_ok
            and FUSED_LNMM_QKV_ENABLED
            and lnmm_fusable(cfg.hidden_size, 3 * cfg.hidden_size, self.dtype)
        )
        # residual handed to SelfAttention => it applies Wo + residual itself
        # (in-flash-kernel epilogue, lnmm kernel, or XLA dot — its choice)
        fuse_wo = (
            pallas_ok
            and (FUSED_LNMM_WO_ENABLED or FUSED_WO_ENABLED)
            and lnmm_fusable(cfg.hidden_size, cfg.hidden_size, self.dtype)
        )
        # layer 0 has an identity attention pre-norm (ModernBERT quirk)
        pre_norm = None
        if self.layer_id == 0:
            attn_in = x
        elif fuse_attn_proj:
            # raw x in; SelfAttention fuses attn_norm into the QKV matmul.
            # Proxy declares the same attn_norm param paths/inits.
            pre_norm = _LNParams(cfg.hidden_size, cfg.norm_bias, name="attn_norm")()
            attn_in = x
        else:
            attn_in = LayerNormF32(cfg.norm_eps, cfg.norm_bias, name="attn_norm")(x)
        attn_out = SelfAttention(
            cfg, self.layer_id, self.dtype, self.attn_impl, self.sp_mesh, self.sp_axis, name="attn"
        )(
            attn_in,
            bias,
            cos,
            sin,
            flash_window,
            segment_ids,
            deterministic,
            fuse_rope,
            pre_norm=pre_norm,
            residual=x if fuse_wo else None,
        )
        x = attn_out if fuse_wo else x + attn_out

        from ..ops.fused_ffn import fusable, fused_ln_ffn

        if self.attn_impl == "pallas" and fusable(
            cfg.hidden_size,
            cfg.intermediate_size,
            cfg.hidden_activation,
            cfg.mlp_bias,
            cfg.mlp_dropout > 0.0 and not deterministic,
            self.dtype,
        ):
            # Fused LN+GeGLU half-block: one Pallas pass on no-grad forwards
            # (the GeGLU intermediate and LN output never touch HBM); under
            # autodiff its custom_vjp runs the exact composition below, so
            # training math is identical. The proxy modules declare the SAME
            # param paths as the unfused branch — checkpoints interchange.
            from ..ops.fused_ffn import W8A8_WO_ENABLED
            from ..ops.fused_ln_matmul import W8A8_ENABLED

            scale, ln_bias = _LNParams(cfg.hidden_size, cfg.norm_bias, name="mlp_norm")()
            wi, wo = _GeGLUParams(cfg, name="mlp")()
            x = fused_ln_ffn(
                x, scale, ln_bias, wi, wo, eps=cfg.norm_eps,
                w8a8=W8A8_ENABLED, w8a8_wo=W8A8_WO_ENABLED,
            )
        else:
            mlp_in = LayerNormF32(cfg.norm_eps, cfg.norm_bias, name="mlp_norm")(x)
            x = x + GeGLU(cfg, self.dtype, name="mlp")(mlp_in, deterministic)
        return x


class ModernBertEncoder(nn.Module):
    """Token/feature encoder with alternating local-global attention.

    Call with either ``input_ids`` (int32 (B, L)) or ``inputs_embeds``
    ((B, L, H)). Returns the final-norm hidden states (B, L, H).
    """

    config: EncoderConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: Any = False  # False | True (full) | "dots"
    sp_mesh: Any = None  # Mesh with an `sp_axis` axis -> sequence parallelism
    sp_axis: str = "seq"

    def setup(self):
        cfg = self.config
        self.tok_embeddings = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            embedding_init=trunc_normal_init(cfg.initializer_range, cfg.initializer_cutoff_factor),
        )
        self.embeddings_norm = LayerNormF32(cfg.norm_eps, cfg.norm_bias)
        # remat: False = none, True = full per-layer recompute, "dots" =
        # full recompute except weight matmuls (qkv/o/GLU projections stay
        # materialized — jax.checkpoint_policies.dots_with_no_batch_dims) —
        # trades HBM for less backward recompute
        if self.remat == "dots":
            layer_cls = nn.remat(
                EncoderLayer,
                static_argnums=(5, 7, 8),
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        elif self.remat:
            layer_cls = nn.remat(EncoderLayer, static_argnums=(5, 7, 8))
        else:
            layer_cls = EncoderLayer
        self.layers = [
            layer_cls(cfg, i, self.dtype, self.attn_impl, self.sp_mesh, self.sp_axis, name=f"layers_{i}")
            for i in range(cfg.num_hidden_layers)
        ]
        self.final_norm = LayerNormF32(cfg.norm_eps, cfg.norm_bias)

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """Raw token embeddings (pre-norm), for audio-placeholder scatter."""
        return self.tok_embeddings(input_ids)

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config

        if inputs_embeds is None:
            inputs_embeds = self.tok_embeddings(input_ids)
        x = self.embeddings_norm(inputs_embeds.astype(self.dtype))
        if cfg.embedding_dropout > 0.0 and not deterministic:
            x = nn.Dropout(cfg.embedding_dropout)(x, deterministic=False)

        b, l, _ = x.shape
        if position_ids is None:
            positions = jnp.arange(l)
        else:
            positions = position_ids

        # rope tables per theta family, computed once
        cos_g, sin_g = rope_cos_sin(positions, cfg.head_dim, cfg.global_rope_theta, self.dtype)
        need_local = cfg.global_attn_every_n_layers > 1
        if need_local and cfg.local_rope_theta != cfg.global_rope_theta:
            cos_l, sin_l = rope_cos_sin(positions, cfg.head_dim, cfg.local_rope_theta, self.dtype)
        else:
            cos_l, sin_l = cos_g, sin_g

        # Flash routing: past a few hundred tokens, both layer kinds go
        # through the Pallas kernel (local for the O(L·w) win, global to
        # avoid XLA's O(B·H·L²) fp32 score materialization — already
        # HBM-bound at the audio tower's L=800). Short sequences (metadata
        # tower, L≈14) stay on XLA dense attention. The kernel masks
        # padding, window, and packed segments in-kernel.
        use_flash = self.attn_impl == "pallas" and l >= 512
        local_flash = cfg.local_attention // 2 if (use_flash and need_local) else None
        global_flash = -1 if use_flash else None
        # in-kernel rope needs default arange positions (per-batch
        # position_ids would need per-row tables) and no SP sharding
        fuse_rope = use_flash and position_ids is None and self.sp_mesh is None

        pad_bias = padding_bias(attention_mask) if attention_mask is not None else None
        if segment_ids is not None and not use_flash:
            seg = jnp.where(segment_ids[:, None, :, None] == segment_ids[:, None, None, :], 0.0, NEG_INF)
            pad_bias = seg if pad_bias is None else pad_bias + seg
        global_bias = pad_bias
        if need_local and local_flash is None:
            win = sliding_window_bias(l, cfg.local_attention)[None, None]
            local_bias = win if pad_bias is None else pad_bias + win
        else:
            local_bias = pad_bias  # flash kernel applies the window in-kernel

        for i, layer in enumerate(self.layers):
            is_global = cfg.layer_is_global(i)
            x = layer(
                x,
                global_bias if is_global else local_bias,
                cos_g if is_global else cos_l,
                sin_g if is_global else sin_l,
                global_flash if is_global else local_flash,
                segment_ids,
                deterministic,
                fuse_rope,
            )

        return self.final_norm(x)


def pool_hidden(
    hidden: jnp.ndarray, attention_mask: Optional[jnp.ndarray], cls_embed: bool
) -> jnp.ndarray:
    """CLS-token or masked-mean pooling (modeling_cm3p.py:382-396,624-642)."""
    if cls_embed:
        return hidden[..., 0, :]
    if attention_mask is not None:
        mask = attention_mask[..., None].astype(jnp.float32)
        summed = jnp.sum(hidden.astype(jnp.float32) * mask, axis=-2)
        denom = jnp.clip(jnp.sum(mask, axis=-2), 1e-9, None)
        return (summed / denom).astype(hidden.dtype)
    return jnp.mean(hidden, axis=-2)
