"""XLA-path W8A8 (ops/xla_int8.py, CM3P_XLA_INT8 gate).

Three contracts:
1. int8_dot tracks the fp32 product within int8 quantization error.
2. Autodiff through int8_dot is bit-identical to the bf16 path (the
   custom_vjp differentiated forward runs the exact product) — training
   math is unchanged by the gate.
3. The model-level gate: same param structure (checkpoints interchange),
   output within quantization drift of the ungated forward, gradients
   identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cm3p_tpu.ops.xla_int8 as xi
from cm3p_tpu.ops.xla_int8 import int8_dot


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


class TestInt8Dot:
    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_matches_exact_product(self, dtype):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 96, 256)), dtype)
        w = jnp.asarray(rng.normal(size=(256, 768)) * 0.02, jnp.float32)
        got = jax.jit(int8_dot)(x, w)
        assert got.dtype == dtype
        want = np.asarray(x, np.float32) @ np.asarray(w)
        assert _cosine(got, want) > 0.9995
        # per-element: bounded by the row/col quantization steps
        err = np.abs(np.asarray(got, np.float32) - want)
        scale = np.abs(want).max()
        assert err.max() < 0.02 * scale

    def test_outlier_rows_stay_bounded(self):
        # a row with one huge element stresses per-row absmax quantization
        rng = np.random.default_rng(1)
        x = rng.normal(size=(8, 128)).astype(np.float32)
        x[3, 7] = 100.0
        w = rng.normal(size=(128, 64)).astype(np.float32) * 0.05
        got = np.asarray(int8_dot(jnp.asarray(x), jnp.asarray(w)), np.float32)
        want = x @ w
        # the outlier row loses precision but must not corrupt other rows
        others = [i for i in range(8) if i != 3]
        assert _cosine(got[others], want[others]) > 0.9995

    def test_grad_identical_to_bf16_path(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(6, 64)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(64, 32)) * 0.1, jnp.float32)
        g = jnp.asarray(rng.normal(size=(6, 32)), jnp.bfloat16)

        def f_int8(x_, w_):
            return jnp.sum(int8_dot(x_, w_) * g)

        def f_bf16(x_, w_):
            return jnp.sum(jnp.dot(x_, w_.astype(x_.dtype)) * g)

        gi = jax.grad(f_int8, argnums=(0, 1))(x, w)
        gb = jax.grad(f_bf16, argnums=(0, 1))(x, w)
        np.testing.assert_array_equal(np.asarray(gi[0], np.float32), np.asarray(gb[0], np.float32))
        # dw accumulates in fp32 (same convention as ops/fused_ffn.py's bwd)
        # — exact vs the bf16 chain's rounding, so compare to the fp32 truth
        truth = np.asarray(x, np.float32).T @ np.asarray(g, np.float32)
        np.testing.assert_allclose(np.asarray(gi[1]), truth, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gb[1]), truth, atol=0.1)

    def test_value_and_grad_uses_exact_forward(self):
        # under autodiff the PRIMAL OUTPUT is the bf16 product, not int8
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(4, 64)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(64, 16)) * 0.1, jnp.float32)
        val, _ = jax.value_and_grad(lambda x_: jnp.sum(int8_dot(x_, w)))(x)
        exact = jnp.sum(jnp.dot(x, w.astype(x.dtype)))
        np.testing.assert_array_equal(np.asarray(val, np.float32), np.asarray(exact, np.float32))


def _tiny_cfg():
    from cm3p_tpu.configs import MetadataConfig

    return MetadataConfig(
        vocab_size=128, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128, max_position_embeddings=256,
        global_attn_every_n_layers=2, local_attention=128,
    )


class TestModelGate:
    def _run(self, gate, monkeypatch, attn_impl="xla"):
        from cm3p_tpu.models.modernbert import ModernBertEncoder

        monkeypatch.setattr(xi, "XLA_INT8_ENABLED", gate)
        cfg = _tiny_cfg()
        ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, (2, 128)))
        mask = jnp.ones((2, 128), jnp.int32)
        model = ModernBertEncoder(cfg, dtype=jnp.bfloat16, attn_impl=attn_impl)
        params = model.init(jax.random.PRNGKey(0), input_ids=ids, attention_mask=mask)
        out = model.apply(params, input_ids=ids, attention_mask=mask)
        return params, out, (model, ids, mask)

    def test_param_structure_interchanges(self, monkeypatch):
        p_off, out_off, _ = self._run(False, monkeypatch)
        p_on, out_on, _ = self._run(True, monkeypatch)
        flat_off = jax.tree_util.tree_leaves_with_path(p_off)
        flat_on = jax.tree_util.tree_leaves_with_path(p_on)
        assert [jax.tree_util.keystr(k) for k, _ in flat_off] == [
            jax.tree_util.keystr(k) for k, _ in flat_on
        ]
        for (_, a), (_, b) in zip(flat_off, flat_on):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # same params, int8 forward within quantization drift of the exact one
        assert _cosine(np.asarray(out_on, np.float32), np.asarray(out_off, np.float32)) > 0.999

    def test_grads_identical_with_gate(self, monkeypatch):
        p, _, (model, ids, mask) = self._run(False, monkeypatch)

        def loss(params, gate):
            monkeypatch.setattr(xi, "XLA_INT8_ENABLED", gate)
            out = model.apply(params, input_ids=ids, attention_mask=mask)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_off = jax.grad(lambda q: loss(q, False))(p)
        g_on = jax.grad(lambda q: loss(q, True))(p)
        # forward under autodiff is the exact product either way; weight
        # grads differ only by the custom bwd's fp32 accumulation vs the
        # Dense path's bf16 rounding (see TestInt8Dot)
        for a, b in zip(jax.tree_util.tree_leaves(g_off), jax.tree_util.tree_leaves(g_on)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            np.testing.assert_allclose(a, b, atol=2e-2 * max(1.0, np.abs(a).max()))
