"""Fused LN->matmul (+residual) kernel: parity with flax modules + autodiff.

Same contracts as tests/test_fused_ffn.py for the companion op
(ops/fused_ln_matmul.py): exact XLA-composition match with the module pair
it replaces, Pallas-kernel agreement within the bf16 band, analytic
backward == jax autodiff. The EncoderLayer wiring (param-path identity,
grad-mode forward) is covered by test_fused_ffn's encoder-level tests,
which exercise all three fusions at once.
"""
import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from cm3p_tpu.models.modernbert import LayerNormF32, trunc_normal_init
from cm3p_tpu.ops.fused_ln_matmul import (
    _pallas_ln_matmul,
    fused_ln_matmul,
    lnmm_fusable,
    reference_ln_matmul,
)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


class _NormDense(nn.Module):
    """attn_norm -> Wqkv, exactly as the unfused EncoderLayer composes it."""

    d_out: int
    eps: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        y = LayerNormF32(self.eps, False, name="norm")(x)
        return nn.Dense(
            self.d_out, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(0.02, 2.0), name="W",
        )(y)


def _setup(d=256, n=768, rows=300, dtype=jnp.bfloat16, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, rows // 2, d)), dtype)
    mod = _NormDense(n, 1e-5, dtype)
    params = mod.init(jax.random.PRNGKey(seed), x)
    scale = params["params"]["norm"]["LayerNorm_0"]["scale"] * jnp.asarray(
        rng.uniform(0.5, 1.5, (d,)), jnp.float32
    )
    params["params"]["norm"]["LayerNorm_0"]["scale"] = scale
    w = params["params"]["W"]["kernel"]
    return mod, params, x, scale, w


class TestFusedLnMatmul:
    def test_reference_matches_flax_modules_exactly(self):
        mod, params, x, scale, w = _setup()
        want = mod.apply(params, x)
        got = reference_ln_matmul(x, scale, None, w, None, eps=1e-5, with_ln=True)
        assert jnp.array_equal(want, got)

    def test_kernel_matches_reference(self):
        mod, params, x, scale, w = _setup()
        want = reference_ln_matmul(x, scale, None, w, None, eps=1e-5, with_ln=True)
        got = _pallas_ln_matmul(x, scale, None, w, None, eps=1e-5, with_ln=True, block_rows=128)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05, rtol=0.02
        )

    def test_kernel_residual_no_ln(self):
        mod, params, x, scale, w = _setup(d=256, n=256)
        rng = np.random.default_rng(1)
        res = jnp.asarray(rng.standard_normal(x.shape[:-1] + (256,)), x.dtype)
        want = reference_ln_matmul(x, scale, None, w, res, eps=1e-5, with_ln=False)
        got = _pallas_ln_matmul(x, scale, None, w, res, eps=1e-5, with_ln=False, block_rows=128)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05, rtol=0.02
        )
        # and the residual actually participates
        assert not jnp.array_equal(
            got, reference_ln_matmul(x, scale, None, w, None, eps=1e-5, with_ln=False)
        )

    def test_backward_matches_autodiff_with_ln(self):
        mod, params, x, scale, w = _setup(dtype=jnp.float32)

        def weigh(out):
            return jnp.sum(out * jnp.sin(jnp.arange(out.size).reshape(out.shape) * 0.01))

        def loss_ref(x, scale, w):
            return weigh(reference_ln_matmul(x, scale, None, w, None, eps=1e-5, with_ln=True))

        def loss_fused(x, scale, w):
            return weigh(fused_ln_matmul(x, w, scale=scale, eps=1e-5))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, w)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, w)
        for a, b, name in zip(g_ref, g_fused, ["dx", "dscale", "dw"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4, err_msg=name
            )

    def test_backward_matches_autodiff_residual(self):
        mod, params, x, scale, w = _setup(d=256, n=256, dtype=jnp.float32)
        rng = np.random.default_rng(2)
        res = jnp.asarray(rng.standard_normal(x.shape[:-1] + (256,)), jnp.float32)

        def weigh(out):
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape) * 0.02))

        def loss_ref(x, w, res):
            return weigh(reference_ln_matmul(x, scale, None, w, res, eps=1e-5, with_ln=False))

        def loss_fused(x, w, res):
            return weigh(fused_ln_matmul(x, w, residual=res))

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, res)
        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, res)
        for a, b, name in zip(g_ref, g_fused, ["dx", "dw", "dres"]):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4, err_msg=name
            )

    def test_grad_forward_value_matches_reference(self):
        mod, params, x, scale, w = _setup()
        want = reference_ln_matmul(x, scale, None, w, None, eps=1e-5, with_ln=True)
        val, _ = jax.vjp(lambda *a: fused_ln_matmul(a[0], a[2], scale=a[1], eps=1e-5), x, scale, w)
        assert jnp.array_equal(val, want)

    def test_fusable_gate(self):
        assert lnmm_fusable(768, 2304)
        assert lnmm_fusable(768, 768)
        assert not lnmm_fusable(700, 2304)
        assert not lnmm_fusable(768, 2304, jnp.float32)  # 7.1 MB fp32 weights
        assert lnmm_fusable(256, 768, jnp.float32)


class TestW8A8:
    """Fused LN -> int8 quant -> int8 matmul (extraction-path W8A8)."""

    def test_kernel_matches_quantized_reference_exactly(self):
        from cm3p_tpu.ops.fused_ln_matmul import (
            _pallas_ln_matmul_q,
            quantize_weight_int8,
            reference_ln_matmul_q,
        )

        mod, params, x, scale, w = _setup(d=256, n=512)
        want = reference_ln_matmul_q(x, scale, None, w, eps=1e-5, with_ln=True)
        wq, sw = quantize_weight_int8(w)
        got = _pallas_ln_matmul_q(
            x, scale, None, wq, sw, eps=1e-5, with_ln=True, block_rows=128
        )
        # same int8 math inside and out: bit-identical
        assert jnp.array_equal(want, got)

    def test_quantization_error_band(self):
        """W8A8 output stays within ~1% relative of the fp path on
        LN-normalized activations (the regime the gate would enable it in)."""
        from cm3p_tpu.ops.fused_ln_matmul import fused_ln_matmul_q

        mod, params, x, scale, w = _setup(d=256, n=512)
        exact = np.asarray(
            reference_ln_matmul(x, scale, None, w, None, eps=1e-5, with_ln=True), np.float32
        )
        q = np.asarray(fused_ln_matmul_q(x, w, scale=scale, eps=1e-5), np.float32)
        denom = np.sqrt(np.mean(exact**2))
        rel_rmse = np.sqrt(np.mean((q - exact) ** 2)) / denom
        assert rel_rmse < 0.02, rel_rmse
        cos = np.sum(q * exact) / (np.linalg.norm(q) * np.linalg.norm(exact))
        assert cos > 0.9999, cos

    def test_residual_variant_matches_composition(self):
        """fused_ln_matmul_q(residual=...) — the attn-Wo int8 path
        (CM3P_W8A8_WO) — equals residual + the quantized matmul."""
        from cm3p_tpu.ops.fused_ln_matmul import (
            fused_ln_matmul_q,
            reference_ln_matmul_q,
        )

        mod, params, x, scale, w = _setup(d=256, n=256)
        res = x * 0.5
        want = res + reference_ln_matmul_q(x, scale, None, w, eps=1e-5, with_ln=False)
        got = fused_ln_matmul_q(x, w, residual=res, eps=1e-5)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1e-5
        )

    def test_residual_variant_grads_run_bf16_composition(self):
        from cm3p_tpu.ops.fused_ln_matmul import fused_ln_matmul, fused_ln_matmul_q

        mod, params, x, scale, w = _setup(d=256, n=256)
        res = x * 0.5

        def loss_q(x_, w_, r_):
            return jnp.sum(fused_ln_matmul_q(x_, w_, residual=r_) ** 2)

        def loss_ref(x_, w_, r_):
            return jnp.sum(fused_ln_matmul(x_, w_, residual=r_) ** 2)

        vq, gq = jax.value_and_grad(loss_q, argnums=(0, 1, 2))(x, w, res)
        vr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(x, w, res)
        np.testing.assert_allclose(float(vq), float(vr), rtol=1e-6)
        for a, b in zip(gq, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_weight_quantizer_round_trip(self):
        from cm3p_tpu.ops.fused_ln_matmul import quantize_weight_int8

        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.standard_normal((128, 256)).astype(np.float32) * 0.02)
        wq, sw = quantize_weight_int8(w)
        assert wq.dtype == jnp.int8
        back = np.asarray(wq, np.float32) * np.asarray(sw)[None, :]
        np.testing.assert_allclose(back, np.asarray(w), atol=float(np.max(np.asarray(sw))) / 2 + 1e-6)


class TestW8A8ModelWiring:
    def test_encoder_w8a8_close_to_fp(self, monkeypatch):
        """CM3P_W8A8 reaches both call sites (QKV + FFN Wi) and the encoder
        output stays within the quantization band of the fp path."""
        import cm3p_tpu.ops.fused_ln_matmul as lnmm
        from cm3p_tpu.models.modernbert import EncoderLayer
        from cm3p_tpu.configs import EncoderConfig

        cfg = EncoderConfig(hidden_size=256, intermediate_size=512,
                            num_attention_heads=4, num_hidden_layers=2)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((1, 640, 256)), jnp.bfloat16)
        cos = jnp.ones((640, 64), jnp.bfloat16)
        sin = jnp.zeros((640, 64), jnp.bfloat16)
        layer = EncoderLayer(cfg, 1, jnp.bfloat16, attn_impl="pallas")
        # the QKV quant rides the lnmm kernel, whose production default is
        # now OFF — force it on so the wiring under test actually engages
        monkeypatch.setattr(lnmm, "FUSED_LNMM_QKV_ENABLED", True)
        params = layer.init(jax.random.PRNGKey(7), x, None, cos, sin, 64)
        fp = np.asarray(layer.apply(params, x, None, cos, sin, 64), np.float32)

        monkeypatch.setattr(lnmm, "W8A8_ENABLED", True)
        q = np.asarray(layer.apply(params, x, None, cos, sin, 64), np.float32)

        assert not np.array_equal(fp, q)  # the quantized path actually ran
        cos_sim = np.sum(fp * q) / (np.linalg.norm(fp) * np.linalg.norm(q))
        assert cos_sim > 0.999, cos_sim

    def test_encoder_w8a8_wo_close_to_fp(self, monkeypatch):
        """CM3P_W8A8_WO reaches both Wo-side call sites (attn out-projection
        + FFN Wo) independently of CM3P_W8A8."""
        import cm3p_tpu.ops.fused_ffn as ffn
        from cm3p_tpu.models.modernbert import EncoderLayer
        from cm3p_tpu.configs import EncoderConfig

        cfg = EncoderConfig(hidden_size=256, intermediate_size=512,
                            num_attention_heads=4, num_hidden_layers=2)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((1, 640, 256)), jnp.bfloat16)
        cos = jnp.ones((640, 64), jnp.bfloat16)
        sin = jnp.zeros((640, 64), jnp.bfloat16)
        layer = EncoderLayer(cfg, 1, jnp.bfloat16, attn_impl="pallas")
        # the attn-Wo int8 route rides the lnmm-Wo kernel (default OFF now)
        import cm3p_tpu.ops.fused_ln_matmul as lnmm
        monkeypatch.setattr(lnmm, "FUSED_LNMM_WO_ENABLED", True)
        params = layer.init(jax.random.PRNGKey(8), x, None, cos, sin, 64)
        fp = np.asarray(layer.apply(params, x, None, cos, sin, 64), np.float32)

        monkeypatch.setattr(ffn, "W8A8_WO_ENABLED", True)
        q = np.asarray(layer.apply(params, x, None, cos, sin, 64), np.float32)

        assert not np.array_equal(fp, q)  # the quantized Wo paths actually ran
        cos_sim = np.sum(fp * q) / (np.linalg.norm(fp) * np.linalg.norm(q))
        assert cos_sim > 0.999, cos_sim


class TestGateCombos:
    """Every (LNMM_QKV, LNMM_WO, FUSED_WO) combo produces the same encoder
    output — the sub-gates exist so the hardware A/B can measure each half
    independently; math must be identical whichever route is active."""

    def test_all_combos_match(self, monkeypatch):
        import itertools

        from cm3p_tpu.configs import MetadataConfig
        from cm3p_tpu.models.modernbert import ModernBertEncoder
        from cm3p_tpu.ops import flash_attention as fa
        from cm3p_tpu.ops import fused_ln_matmul as lnmm

        cfg = MetadataConfig(
            vocab_size=128, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=128, max_position_embeddings=256,
            global_attn_every_n_layers=2, local_attention=128,
        )
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 128)))
        mask = jnp.ones((2, 128), jnp.int32)

        def run():
            model = ModernBertEncoder(cfg, attn_impl="pallas")
            params = model.init(jax.random.PRNGKey(0), input_ids=ids, attention_mask=mask)
            return np.asarray(model.apply(params, input_ids=ids, attention_mask=mask), np.float32)

        base = None
        for qkv_on, wo_on, epi_on in itertools.product([False, True], repeat=3):
            monkeypatch.setattr(lnmm, "FUSED_LNMM_QKV_ENABLED", qkv_on)
            monkeypatch.setattr(lnmm, "FUSED_LNMM_WO_ENABLED", wo_on)
            monkeypatch.setattr(fa, "FUSED_WO_ENABLED", epi_on)
            out = run()
            if base is None:
                base = out
            else:
                np.testing.assert_allclose(out, base, atol=1e-5, err_msg=f"{qkv_on} {wo_on} {epi_on}")
