"""Fused LN+GeGLU FFN kernel: parity with the flax modules and autodiff.

The kernel (ops/fused_ffn.py) replaces LayerNormF32 -> GeGLU on the encoder
hot path. Three contracts:

1. the XLA composition ``reference_ln_ffn`` is bit-identical to the flax
   module pair it replaces (training math unchanged when wired in);
2. the Pallas kernel matches that composition to bf16 rounding;
3. the custom backward matches jax autodiff of the composition.
"""
import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cm3p_tpu.configs import EncoderConfig
from cm3p_tpu.models.modernbert import GeGLU, LayerNormF32
from cm3p_tpu.ops.fused_ffn import (
    _pallas_ln_ffn,
    fusable,
    fused_ln_ffn,
    reference_ln_ffn,
)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


class _MlpHalf(nn.Module):
    """mlp_norm -> GeGLU -> residual, exactly as EncoderLayer composes it."""

    config: EncoderConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        mlp_in = LayerNormF32(self.config.norm_eps, self.config.norm_bias, name="mlp_norm")(x)
        return x + GeGLU(self.config, self.dtype, name="mlp")(mlp_in)


def _setup(d=256, f=512, rows=320, dtype=jnp.bfloat16, seed=0):
    cfg = EncoderConfig(hidden_size=d, intermediate_size=f, num_attention_heads=4)
    mod = _MlpHalf(cfg, dtype)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, rows // 2, d)), dtype)
    params = mod.init(jax.random.PRNGKey(seed), x)
    scale = params["params"]["mlp_norm"]["LayerNorm_0"]["scale"]
    wi = params["params"]["mlp"]["Wi"]["kernel"]
    wo = params["params"]["mlp"]["Wo"]["kernel"]
    # non-trivial weights (init is trunc-normal, fine) but scale=1 is trivial:
    scale = scale * jnp.asarray(rng.uniform(0.5, 1.5, scale.shape), jnp.float32)
    params["params"]["mlp_norm"]["LayerNorm_0"]["scale"] = scale
    return cfg, mod, params, x, scale, wi, wo


class TestFusedFFN:
    def test_reference_matches_flax_modules_exactly(self):
        cfg, mod, params, x, scale, wi, wo = _setup()
        want = mod.apply(params, x)
        ln_bias = (
            params["params"]["mlp_norm"]["LayerNorm_0"]["bias"] if cfg.norm_bias else None
        )
        got = reference_ln_ffn(x, scale, ln_bias, wi, wo, eps=cfg.norm_eps)
        # same ops in the same order -> identical floats
        assert jnp.array_equal(want, got), float(jnp.abs(want.astype(jnp.float32) - got.astype(jnp.float32)).max())

    def test_kernel_matches_reference_bf16(self):
        cfg, mod, params, x, scale, wi, wo = _setup()
        bias = jnp.zeros((x.shape[-1],), jnp.float32)
        want = reference_ln_ffn(x, scale, bias, wi, wo, eps=cfg.norm_eps).astype(jnp.float32)
        got = _pallas_ln_ffn(x, scale, bias, wi, wo, eps=cfg.norm_eps, residual=True,
                             block_rows=128, interpret=True).astype(jnp.float32)
        # kernel keeps GeGLU in fp32 between the bf16 casts; bf16-ulp band
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05, rtol=0.02)

    def test_kernel_fp32_tight(self):
        cfg, mod, params, x, scale, wi, wo = _setup(dtype=jnp.float32)
        bias = jnp.zeros((x.shape[-1],), jnp.float32)
        want = reference_ln_ffn(x, scale, bias, wi, wo, eps=cfg.norm_eps)
        got = _pallas_ln_ffn(x, scale, bias, wi, wo, eps=cfg.norm_eps, residual=True,
                             block_rows=128, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def test_row_padding(self):
        cfg, mod, params, x, scale, wi, wo = _setup(rows=2 * 77)  # 154 rows, pad to 256
        bias = jnp.zeros((x.shape[-1],), jnp.float32)
        want = reference_ln_ffn(x, scale, bias, wi, wo, eps=cfg.norm_eps).astype(jnp.float32)
        got = _pallas_ln_ffn(x, scale, bias, wi, wo, eps=cfg.norm_eps, residual=True,
                             block_rows=128, interpret=True).astype(jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0.05, rtol=0.02)

    def test_backward_matches_autodiff(self):
        cfg, mod, params, x, scale, wi, wo = _setup(dtype=jnp.float32)
        bias = jnp.zeros((x.shape[-1],), jnp.float32)

        def loss_ref(x, scale, bias, wi, wo):
            out = reference_ln_ffn(x, scale, bias, wi, wo, eps=cfg.norm_eps)
            return jnp.sum(out.astype(jnp.float32) * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))

        def loss_fused(x, scale, bias, wi, wo):
            out = fused_ln_ffn(x, scale, bias, wi, wo, eps=cfg.norm_eps)
            return jnp.sum(out.astype(jnp.float32) * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.01))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, scale, bias, wi, wo)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, scale, bias, wi, wo)
        for a, b, name in zip(g_ref, g_fused, ["dx", "dscale", "dbias", "dwi", "dwo"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4, err_msg=name
            )

    def test_grad_forward_value_matches_reference(self):
        # under autodiff the fwd rule must produce the exact XLA-composition
        # value (training forward unchanged)
        cfg, mod, params, x, scale, wi, wo = _setup()
        bias = jnp.zeros((x.shape[-1],), jnp.float32)
        want = reference_ln_ffn(x, scale, bias, wi, wo, eps=cfg.norm_eps)
        val, _ = jax.vjp(
            lambda *a: fused_ln_ffn(*a, eps=cfg.norm_eps), x, scale, bias, wi, wo
        )
        assert jnp.array_equal(val, want)

    def test_encoder_layer_params_identical_across_branches(self):
        # the fused branch's proxy modules must declare the same param paths
        # AND the same path-keyed init values as the unfused modules
        from cm3p_tpu.models.modernbert import EncoderLayer

        cfg = EncoderConfig(hidden_size=256, intermediate_size=512, num_attention_heads=4,
                            num_hidden_layers=2)
        x = jnp.zeros((1, 640, 256), jnp.bfloat16)
        cos = jnp.zeros((640, 64)); sin = jnp.zeros((640, 64))
        p_xla = EncoderLayer(cfg, 1, jnp.bfloat16, attn_impl="xla").init(
            jax.random.PRNGKey(7), x, None, cos, sin)
        p_pal = EncoderLayer(cfg, 1, jnp.bfloat16, attn_impl="pallas").init(
            jax.random.PRNGKey(7), x, None, cos, sin, 64)
        flat_a = jax.tree_util.tree_leaves_with_path(p_xla)
        flat_b = jax.tree_util.tree_leaves_with_path(p_pal)
        assert [k for k, _ in flat_a] == [k for k, _ in flat_b]
        for (ka, va), (_, vb) in zip(flat_a, flat_b):
            assert jnp.array_equal(va, vb), ka

    def test_encoder_layer_grad_forward_identical(self):
        # under autodiff the pallas-attn layer's FFN half must equal the
        # unfused composition exactly (training math unchanged)
        from cm3p_tpu.models.modernbert import EncoderLayer

        cfg = EncoderConfig(hidden_size=256, intermediate_size=512, num_attention_heads=4,
                            num_hidden_layers=2)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 640, 256)), jnp.bfloat16)
        cos = jnp.ones((640, 64), jnp.bfloat16)
        sin = jnp.zeros((640, 64), jnp.bfloat16)
        layer = EncoderLayer(cfg, 1, jnp.bfloat16, attn_impl="pallas")
        params = layer.init(jax.random.PRNGKey(7), x, None, cos, sin, 64)

        def fwd(p):
            return layer.apply(p, x, None, cos, sin, 64).astype(jnp.float32)

        # value under vjp (grad-mode forward, XLA composition) vs plain
        # no-grad forward (Pallas kernel): elementwise within the bf16 band
        # (the kernel keeps GeGLU in fp32 between the matched bf16 casts)
        val, vjp_fn = jax.vjp(fwd, params)
        nograd = fwd(params)
        np.testing.assert_allclose(np.asarray(val), np.asarray(nograd), atol=0.05, rtol=0.02)
        (grads,) = vjp_fn(jnp.ones_like(val))
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_erf_approx_accuracy(self):
        from cm3p_tpu.ops.fused_ffn import _erf_approx_f32

        x = jnp.linspace(-6.0, 6.0, 4001, dtype=jnp.float32)
        want = jax.lax.erf(x)
        got = _erf_approx_f32(x)
        assert float(jnp.abs(want - got).max()) < 1e-6

    def test_fusable_gate(self):
        assert fusable(768, 1152, "gelu", False, False)
        assert fusable(256, 512, "gelu", False, False)
        assert not fusable(768, 1152, "gelu_tanh", False, False)
        assert not fusable(768, 1152, "gelu", True, False)
        assert not fusable(768, 1152, "gelu", False, True)
        assert not fusable(700, 1152, "gelu", False, False)
        assert not fusable(768, 1000, "gelu", False, False)
        # fp32 beatmap-shape weights crash Mosaic (10.6 MB resident) — gated
        assert not fusable(768, 1152, "gelu", False, False, jnp.float32)
        assert fusable(512, 1024, "gelu", False, False, jnp.float32)
        assert fusable(256, 512, "gelu", False, False, jnp.float32)


class TestFFNW8A8:
    """Int8 Wi inside the fused FFN kernel (CM3P_W8A8 extraction path)."""

    def test_kernel_matches_quantized_composition(self):
        from cm3p_tpu.ops.fused_ffn import (
            _ln_f32,
            _pallas_ln_ffn,
            _quant_rows_int8,
            quantize_weight_int8,
        )

        cfg, mod, params, x, scale, wi, wo = _setup()
        bias = jnp.zeros((x.shape[-1],), jnp.float32)
        got = _pallas_ln_ffn(
            x, scale, bias, wi, wo, eps=1e-5, residual=True, block_rows=128, w8a8=True
        )
        # same int8 math composed in XLA
        y = _ln_f32(x.astype(jnp.float32), scale, bias, 1e-5)
        q, sa = _quant_rows_int8(y)
        wq, swi = quantize_weight_int8(wi)
        acc = jax.lax.dot_general(
            q, wq, (((q.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        h = (acc.astype(jnp.float32) * sa * swi).astype(x.dtype)
        f = wo.shape[0]
        a = jax.nn.gelu(h[..., :f].astype(jnp.float32), approximate=False)
        gb = (a * h[..., f:].astype(jnp.float32)).astype(x.dtype)
        want = x + jnp.dot(gb, wo.astype(x.dtype))
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.02, rtol=0.02
        )

    def test_w8a8_close_to_fp_path(self):
        from cm3p_tpu.ops.fused_ffn import _pallas_ln_ffn, reference_ln_ffn

        cfg, mod, params, x, scale, wi, wo = _setup()
        bias = jnp.zeros((x.shape[-1],), jnp.float32)
        exact = np.asarray(reference_ln_ffn(x, scale, bias, wi, wo, eps=1e-5), np.float32)
        q = np.asarray(
            _pallas_ln_ffn(
                x, scale, bias, wi, wo, eps=1e-5, residual=True, block_rows=128, w8a8=True
            ),
            np.float32,
        )
        cos = np.sum(q * exact) / (np.linalg.norm(q) * np.linalg.norm(exact))
        assert cos > 0.9999, cos

    def test_grad_path_ignores_w8a8(self):
        from cm3p_tpu.ops.fused_ffn import fused_ln_ffn, reference_ln_ffn

        cfg, mod, params, x, scale, wi, wo = _setup(dtype=jnp.float32)
        bias = jnp.zeros((x.shape[-1],), jnp.float32)

        def loss_q(x, wi, wo):
            return jnp.sum(fused_ln_ffn(x, scale, bias, wi, wo, eps=1e-5, w8a8=True) ** 2)

        def loss_ref(x, wi, wo):
            return jnp.sum(reference_ln_ffn(x, scale, bias, wi, wo, eps=1e-5) ** 2)

        v_q, g_q = jax.value_and_grad(loss_q, argnums=(0, 1, 2))(x, wi, wo)
        v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, wi, wo)
        # under autodiff the exact composition runs: value and grads match it
        np.testing.assert_allclose(float(v_q), float(v_r), rtol=1e-6)
        for a, b, name in zip(g_r, g_q, ["dx", "dwi", "dwo"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4, err_msg=name
            )


class TestFFNW8A8Wo:
    """Int8 Wo stage (CM3P_W8A8_WO): quant rides on the VMEM-resident
    GeGLU product; independent gate from the Wi-side w8a8."""

    @pytest.mark.parametrize("w8a8", [False, True])
    def test_close_to_fp_path(self, w8a8):
        from cm3p_tpu.ops.fused_ffn import _pallas_ln_ffn, reference_ln_ffn

        cfg, mod, params, x, scale, wi, wo = _setup()
        bias = jnp.zeros((x.shape[-1],), jnp.float32)
        exact = np.asarray(reference_ln_ffn(x, scale, bias, wi, wo, eps=1e-5), np.float32)
        q = np.asarray(
            _pallas_ln_ffn(
                x, scale, bias, wi, wo, eps=1e-5, residual=True, block_rows=128,
                w8a8=w8a8, w8a8_wo=True,
            ),
            np.float32,
        )
        assert not np.array_equal(q, exact)  # the int8 Wo actually ran
        cos = np.sum(q * exact) / (np.linalg.norm(q) * np.linalg.norm(exact))
        assert cos > 0.9999, cos

    def test_grad_path_ignores_w8a8_wo(self):
        from cm3p_tpu.ops.fused_ffn import fused_ln_ffn, reference_ln_ffn

        cfg, mod, params, x, scale, wi, wo = _setup(dtype=jnp.float32)
        bias = jnp.zeros((x.shape[-1],), jnp.float32)

        def loss_q(x, wi, wo):
            return jnp.sum(
                fused_ln_ffn(x, scale, bias, wi, wo, eps=1e-5, w8a8=True, w8a8_wo=True) ** 2
            )

        def loss_ref(x, wi, wo):
            return jnp.sum(reference_ln_ffn(x, scale, bias, wi, wo, eps=1e-5) ** 2)

        v_q, g_q = jax.value_and_grad(loss_q, argnums=(0, 1, 2))(x, wi, wo)
        v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, wi, wo)
        np.testing.assert_allclose(float(v_q), float(v_r), rtol=1e-6)
        for a, b, name in zip(g_r, g_q, ["dx", "dwi", "dwo"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4, err_msg=name
            )
