"""Memoized inline-jit dispatch for the Pallas ops (ops/flash_attention.py,
ops/fused_ffn.py) — trace-count collapse + bit-parity with the direct path.

JAX re-traces a pallas_call's kernel on every bind; the dispatch layer
gives each static config a stable jitted identity so pjit's jaxpr cache
collapses per-layer re-traces. These tests pin (a) the collapse actually
happens, (b) outputs and grads are bit-identical to the unwrapped path,
(c) monkeypatched module flags land in fresh cache slots instead of
reusing a stale jaxpr.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jax.experimental.pallas as pl
import jax._src.pallas.pallas_call as pcall

import cm3p_tpu.ops.flash_attention as fa
import cm3p_tpu.ops.fused_ffn as ffn
from cm3p_tpu.configs import tiny_cm3p_config
from cm3p_tpu.models.modernbert import ModernBertEncoder



pytestmark = pytest.mark.slow  # see pytest.ini: excluded from the quick gate
@pytest.fixture
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


@pytest.fixture
def trace_counter(monkeypatch):
    count = {"n": 0}
    orig = pcall._trace_kernel_to_jaxpr

    def counted(*a, **k):
        count["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(pcall, "_trace_kernel_to_jaxpr", counted)
    return count


def _encoder():
    cfg = tiny_cm3p_config().beatmap_config
    cfg.num_hidden_layers = 6
    cfg.hidden_size = 256
    cfg.num_attention_heads = 4
    cfg.intermediate_size = 128
    cfg.local_attention = 64
    cfg.global_attn_every_n_layers = 2
    enc = ModernBertEncoder(cfg, attn_impl="pallas")
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 400, (2, 512)), jnp.int32)  # >=512 routes to flash
    params = enc.init(jax.random.PRNGKey(0), input_ids=ids)
    return enc, params, ids


def _set_dispatch(monkeypatch, enabled: bool):
    monkeypatch.setattr(fa, "JIT_DISPATCH", enabled)
    monkeypatch.setattr(ffn, "JIT_DISPATCH", enabled)


class TestTraceCollapse:
    def test_forward_traces_collapse(self, interpret_mode, trace_counter, monkeypatch):
        enc, params, ids = _encoder()
        _set_dispatch(monkeypatch, False)
        trace_counter["n"] = 0
        out_off = np.asarray(jax.jit(lambda p, i: enc.apply(p, input_ids=i))(params, ids))
        n_off = trace_counter["n"]

        _set_dispatch(monkeypatch, True)
        trace_counter["n"] = 0
        out_on = np.asarray(jax.jit(lambda p, i: enc.apply(p, input_ids=i))(params, ids))
        n_on = trace_counter["n"]

        # 6 layers, 3 unique kernel configs (local attn, global attn, ffn)
        assert n_on < n_off, (n_on, n_off)
        assert n_on <= 4
        np.testing.assert_array_equal(out_off, out_on)

    def test_retrace_is_fully_cached(self, interpret_mode, trace_counter, monkeypatch):
        enc, params, ids = _encoder()
        _set_dispatch(monkeypatch, True)
        np.asarray(jax.jit(lambda p, i: enc.apply(p, input_ids=i))(params, ids))
        trace_counter["n"] = 0
        # a fresh outer jit re-traces the flax module, but every kernel
        # trace must hit the dispatch cache
        np.asarray(jax.jit(lambda p, i: enc.apply(p, input_ids=i))(params, ids))
        assert trace_counter["n"] == 0

    def test_grads_bit_identical(self, interpret_mode, trace_counter, monkeypatch):
        enc, params, ids = _encoder()

        def loss(p):
            return (enc.apply(p, input_ids=ids).astype(jnp.float32) ** 2).sum()

        _set_dispatch(monkeypatch, False)
        trace_counter["n"] = 0
        g_off = jax.tree.map(np.asarray, jax.jit(jax.grad(loss))(params))
        n_off = trace_counter["n"]
        _set_dispatch(monkeypatch, True)
        trace_counter["n"] = 0
        g_on = jax.tree.map(np.asarray, jax.jit(jax.grad(loss))(params))
        n_on = trace_counter["n"]
        assert n_on < n_off, (n_on, n_off)
        jax.tree.map(np.testing.assert_array_equal, g_off, g_on)


class TestFlagKeying:
    def test_flag_flip_lands_in_fresh_cache_slot(self, interpret_mode, trace_counter, monkeypatch):
        """A monkeypatched module flag must force a re-trace (the stale-jaxpr
        hazard: a cached trace from the old flag value being silently reused)."""
        enc, params, ids = _encoder()
        _set_dispatch(monkeypatch, True)
        np.asarray(jax.jit(lambda p, i: enc.apply(p, input_ids=i))(params, ids))
        trace_counter["n"] = 0
        monkeypatch.setattr(fa, "ONLINE_MAX", not fa.ONLINE_MAX)
        np.asarray(jax.jit(lambda p, i: enc.apply(p, input_ids=i))(params, ids))
        assert trace_counter["n"] > 0

    def test_pallas_call_patch_lands_in_fresh_cache_slot(self, interpret_mode, trace_counter, monkeypatch):
        """Re-patching pl.pallas_call (what every interpret-mode test does)
        must also miss the cache — the key carries the live object."""
        enc, params, ids = _encoder()
        _set_dispatch(monkeypatch, True)
        np.asarray(jax.jit(lambda p, i: enc.apply(p, input_ids=i))(params, ids))
        trace_counter["n"] = 0
        monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call))
        np.asarray(jax.jit(lambda p, i: enc.apply(p, input_ids=i))(params, ids))
        assert trace_counter["n"] > 0
