"""Flash-attention kernel tests (interpret mode): forward + backward parity."""
import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import cm3p_tpu.ops.flash_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def make_inputs(B=2, H=4, L=512, D=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.float32)
    mask = jnp.asarray((rng.integers(0, 2, (B, L)) | (np.arange(L) < L // 2)).astype(np.int32))
    return q, k, v, mask


class TestForward:
    @pytest.mark.parametrize("window", [None, 64, 128])
    @pytest.mark.parametrize("block", [128, 256])
    def test_key_mask_parity(self, window, block):
        q, k, v, mask = make_inputs()
        out = fa.flash_attention(q, k, v, key_mask=mask, window=window, block_q=block, block_k=block)
        ref = fa._xla_reference(q, k, v, jnp.ones_like(mask), mask, window)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_no_mask(self):
        q, k, v, _ = make_inputs()
        out = fa.flash_attention(q, k, v)
        ref = fa._xla_reference(q, k, v, None, None, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_unaligned_length_pads(self):
        q, k, v, mask = make_inputs(L=384, D=32)
        out = fa.flash_attention(q, k, v, key_mask=mask, window=64)
        ref = fa._xla_reference(q, k, v, jnp.ones_like(mask), mask, 64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    @pytest.mark.parametrize("window", [None, 64])
    def test_segments(self, window):
        q, k, v, _ = make_inputs()
        seg = np.zeros((2, 512), np.int32)
        seg[:, :200] = 1
        seg[:, 200:480] = 2
        segj = jnp.asarray(seg)
        out = fa.flash_attention(q, k, v, segment_ids=segj, window=window)
        ref = fa._xla_reference(q, k, v, segj, segj, window)
        valid = (seg > 0)[:, None, :, None]
        err = np.max(np.abs(np.where(valid, np.asarray(out) - np.asarray(ref), 0.0)))
        assert err < 2e-5
        # fully-masked (padding) rows produce zeros, not NaN
        assert np.isfinite(np.asarray(out)).all()
        assert (np.abs(np.asarray(out)[:, :, 480:, :]) < 1e-6).all()

    def test_bias_converts_to_key_mask(self):
        q, k, v, mask = make_inputs()
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0, -1e9)
        out_b = fa.flash_attention(q, k, v, bias=bias)
        out_m = fa.flash_attention(q, k, v, key_mask=mask)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_m), atol=1e-6)


class TestBackward:
    @pytest.mark.parametrize("window", [None, 64])
    def test_grads_match_autodiff(self, window):
        q, k, v, mask = make_inputs()
        g_out = jnp.asarray(np.random.default_rng(1).standard_normal(q.shape), jnp.float32) * 0.1

        def loss_pallas(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, key_mask=mask, window=window) * g_out)

        def loss_ref(q, k, v):
            return jnp.sum(fa._xla_reference(q, k, v, jnp.ones_like(mask), mask, window) * g_out)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip(("dq", "dk", "dv"), gp, gr):
            rel = float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-9)
            assert rel < 5e-4, (name, rel)

    @pytest.mark.parametrize("window", [None, 64])
    def test_segment_grads(self, window):
        q, k, v, _ = make_inputs()
        seg = np.zeros((2, 512), np.int32)
        seg[:, :200] = 1
        seg[:, 200:480] = 2
        segj = jnp.asarray(seg)
        # gradients only flow through valid rows (masked rows are don't-care)
        valid = jnp.asarray((seg > 0)[:, None, :, None].astype(np.float32))
        g_out = jnp.asarray(np.random.default_rng(1).standard_normal(q.shape), jnp.float32) * 0.1 * valid

        def loss_pallas(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, segment_ids=segj, window=window) * g_out)

        def loss_ref(q, k, v):
            return jnp.sum(fa._xla_reference(q, k, v, segj, segj, window) * g_out)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip(("dq", "dk", "dv"), gp, gr):
            rel = float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-9)
            assert rel < 5e-4, (name, rel)

    def test_xla_fallback_backward(self, monkeypatch):
        monkeypatch.setattr(fa, "BACKWARD_MODE", "xla")
        q, k, v, mask = make_inputs(L=256)

        def loss(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, key_mask=mask[:, :256]) ** 2)

        g = jax.grad(loss)(q, k, v)
        assert np.isfinite(np.asarray(g)).all()
