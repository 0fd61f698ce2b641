"""Wo-epilogue fusion tests (interpret mode).

``flash_attention(..., wo=, out_residual=)`` fuses the out-projection +
residual into the kernel finalize on no-grad forwards; under autodiff the
custom_vjp runs the exact unfused composition. These tests pin:
* fused forward == unfused composition (windowed, global/packed, rope, fp32)
* gradients == the unfused composition's gradients
* the XLA-epilogue fallback for non-fusable shapes
* model-level: gate ON == gate OFF output
"""
import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import cm3p_tpu.ops.flash_attention as fa
from cm3p_tpu.ops.flash_attention import flash_attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def make_inputs(B=2, H=4, L=256, D=64, dm=None, seed=0, dtype=jnp.float32, with_segments=False):
    dm = dm or H * D
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), dtype)
    wo = jnp.asarray(rng.standard_normal((H * D, dm)) * 0.05, jnp.float32)
    res = jnp.asarray(rng.standard_normal((B, L, dm)), dtype)
    seg = None
    if with_segments:
        s = np.ones((B, L), np.int32)
        s[:, L // 2 :] = 2
        s[:, -L // 8 :] = 0
        seg = jnp.asarray(s)
    return q, k, v, wo, res, seg


def unfused(q, k, v, wo, res, **kw):
    o = flash_attention(q, k, v, **kw)
    b, l, h, d = o.shape
    of = o.reshape(b, l, h * d)
    return res + jnp.dot(of, wo.astype(of.dtype))


class TestFusedWoForward:
    @pytest.mark.parametrize("window", [None, 64])
    @pytest.mark.parametrize("with_segments", [False, True])
    def test_matches_unfused(self, window, with_segments):
        q, k, v, wo, res, seg = make_inputs(with_segments=with_segments)
        want = unfused(q, k, v, wo, res, window=window, segment_ids=seg)
        got = flash_attention(q, k, v, window=window, segment_ids=seg, wo=wo, out_residual=res)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    @pytest.mark.parametrize("window", [None, 64])
    def test_with_fused_rope(self, window):
        q, k, v, wo, res, _ = make_inputs()
        want = unfused(q, k, v, wo, res, window=window, rope_theta=10000.0)
        got = flash_attention(q, k, v, window=window, rope_theta=10000.0, wo=wo, out_residual=res)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_bf16(self):
        q, k, v, wo, res, seg = make_inputs(dtype=jnp.bfloat16, with_segments=True)
        want = unfused(q, k, v, wo, res, segment_ids=seg)
        got = flash_attention(q, k, v, segment_ids=seg, wo=wo, out_residual=res)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
        )

    def test_rect_dm(self):
        # d_model != H*D exercises the (hd, dm) epilogue shapes
        q, k, v, wo, res, _ = make_inputs(dm=512)
        want = unfused(q, k, v, wo, res, window=64)
        got = flash_attention(q, k, v, window=64, wo=wo, out_residual=res)
        assert got.shape == (2, 256, 512)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_key_mask(self):
        q, k, v, wo, res, _ = make_inputs()
        mask = jnp.asarray(
            np.concatenate([np.ones((2, 192)), np.zeros((2, 64))], axis=1), jnp.int32
        )
        want = unfused(q, k, v, wo, res, key_mask=mask)
        got = flash_attention(q, k, v, key_mask=mask, wo=wo, out_residual=res)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_unfusable_falls_back_to_xla_epilogue(self):
        # dm=200 not lane-aligned -> XLA epilogue, same semantics
        q, k, v, wo, res, _ = make_inputs(dm=200)
        want = unfused(q, k, v, wo, res, window=64)
        got = flash_attention(q, k, v, window=64, wo=wo, out_residual=res)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_wide_window_falls_back(self):
        # window too wide for the single-pass kernel -> streaming route is
        # not fusable -> XLA epilogue
        q, k, v, wo, res, _ = make_inputs(L=1024)
        assert not fa.wo_fusable(384, 0, 0, 256, 256, 1024, 1024)
        want = unfused(q, k, v, wo, res, window=384)
        got = flash_attention(q, k, v, window=384, wo=wo, out_residual=res)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_missing_residual_raises(self):
        q, k, v, wo, _, _ = make_inputs()
        with pytest.raises(ValueError, match="out_residual"):
            flash_attention(q, k, v, wo=wo)


class TestFusedWoQ:
    """Int8 Wo epilogue (CM3P_FUSED_WO_Q): per-row quant of the normalized
    attention output + per-channel int8 Wo inside the kernel finalize."""

    @pytest.fixture(autouse=True)
    def enable_wo_q(self, monkeypatch):
        monkeypatch.setattr(fa, "FUSED_WO_Q", True)

    def int8_reference(self, q, k, v, wo, res, **kw):
        """The same quantized math composed in XLA."""
        from cm3p_tpu.ops.fused_ffn import _quant_rows_int8, quantize_weight_int8

        o = flash_attention(q, k, v, **kw)
        b, l, h, d = o.shape
        of = o.reshape(b, l, h * d)
        gq, sg = _quant_rows_int8(of.astype(jnp.float32))
        wq, sw = quantize_weight_int8(wo)
        acc = jax.lax.dot_general(
            gq, wq, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return res + (acc.astype(jnp.float32) * sg * sw).astype(res.dtype)

    @pytest.mark.parametrize("window", [None, 64])
    @pytest.mark.parametrize("with_segments", [False, True])
    def test_matches_int8_composition(self, window, with_segments):
        q, k, v, wo, res, seg = make_inputs(with_segments=with_segments)
        want = self.int8_reference(q, k, v, wo, res, window=window, segment_ids=seg)
        got = flash_attention(q, k, v, window=window, segment_ids=seg, wo=wo, out_residual=res)
        assert not np.array_equal(
            np.asarray(got), np.asarray(unfused(q, k, v, wo, res, window=window, segment_ids=seg))
        )  # the int8 path actually ran
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_close_to_fp_path(self):
        q, k, v, wo, res, seg = make_inputs(with_segments=True)
        fp = np.asarray(unfused(q, k, v, wo, res, segment_ids=seg), np.float32)
        got = np.asarray(
            flash_attention(q, k, v, segment_ids=seg, wo=wo, out_residual=res), np.float32
        )
        cos = np.sum(fp * got) / (np.linalg.norm(fp) * np.linalg.norm(got))
        assert cos > 0.999, cos

    def test_grads_ignore_wo_q(self):
        q, k, v, wo, res, _ = make_inputs()

        def loss_fused(q_, wo_):
            return jnp.sum(flash_attention(q_, k, v, window=64, wo=wo_, out_residual=res) ** 2)

        def loss_unfused(q_, wo_):
            return jnp.sum(unfused(q_, k, v, wo_, res, window=64) ** 2)

        vq, gq = jax.value_and_grad(loss_fused, argnums=(0, 1))(q, wo)
        vr, gr = jax.value_and_grad(loss_unfused, argnums=(0, 1))(q, wo)
        np.testing.assert_allclose(float(vq), float(vr), rtol=1e-6)
        for a, b in zip(gq, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


class TestFusedWoGrad:
    @pytest.mark.parametrize("window", [None, 64])
    def test_grads_match_unfused(self, window):
        q, k, v, wo, res, seg = make_inputs(B=2, L=128, with_segments=True)

        def loss_fused(q_, k_, v_, wo_, r_):
            o = flash_attention(q_, k_, v_, window=window, segment_ids=seg, wo=wo_, out_residual=r_)
            return jnp.sum(o * o)

        def loss_unfused(q_, k_, v_, wo_, r_):
            o = unfused(q_, k_, v_, wo_, r_, window=window, segment_ids=seg)
            return jnp.sum(o * o)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, v, wo, res)
        gu = jax.grad(loss_unfused, argnums=(0, 1, 2, 3, 4))(q, k, v, wo, res)
        for a, b in zip(gf, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)

    def test_grads_with_rope(self):
        q, k, v, wo, res, _ = make_inputs(B=2, L=128)

        def loss_fused(q_, k_, v_):
            o = flash_attention(q_, k_, v_, rope_theta=10000.0, wo=wo, out_residual=res)
            return jnp.sum(o * o)

        def loss_unfused(q_, k_, v_):
            o = unfused(q_, k_, v_, wo, res, rope_theta=10000.0)
            return jnp.sum(o * o)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gu = jax.grad(loss_unfused, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


class TestFusedWoMesh:
    def test_dp_mesh_matches(self):
        from jax.sharding import Mesh

        q, k, v, wo, res, seg = make_inputs(B=8, with_segments=True)
        want = flash_attention(q, k, v, segment_ids=seg, wo=wo, out_residual=res)
        devs = np.array(jax.devices()).reshape(4, 2)
        with Mesh(devs, ("data", "model")):
            got = flash_attention(q, k, v, segment_ids=seg, wo=wo, out_residual=res)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


class TestModelGate:
    def test_model_output_same_with_gate(self, monkeypatch):
        """Encoder forward with CM3P_FUSED_WO on == off (interpret kernels)."""
        from cm3p_tpu.configs import MetadataConfig
        from cm3p_tpu.models.modernbert import ModernBertEncoder

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
            return model.apply(params, input_ids=ids, attention_mask=mask)

        monkeypatch.setattr(fa, "FUSED_WO_ENABLED", False)
        base = run()
        monkeypatch.setattr(fa, "FUSED_WO_ENABLED", True)
        fused = run()
        np.testing.assert_allclose(
            np.asarray(fused, np.float32), np.asarray(base, np.float32), atol=1e-5
        )
