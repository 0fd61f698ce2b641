"""Mesh-aware Pallas dispatch: flash_attention self-wraps in shard_map.

Under an ambient (data, model) mesh the public ``flash_attention`` runs the
kernel per-shard via ``jax.shard_map`` (GSPMD would otherwise all-gather the
pallas_call's operands to replicated). These tests assert the sharded result
— forward AND gradients — is bit-comparable to the unsharded kernel, across
dp-only, tp-only, dp×tp, windowed/global/segmented/rope variants, and that
non-divisible shapes fall back to the plain path.
"""
import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import cm3p_tpu.ops.flash_attention as fa
from cm3p_tpu.ops.flash_attention import flash_attention
from cm3p_tpu.utils import platform



pytestmark = pytest.mark.slow  # see pytest.ini: excluded from the quick gate
@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def make_mesh(data=4, model=2):
    devs = np.array(jax.devices()[: data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def make_inputs(B=8, H=4, L=256, D=64, seed=0, with_segments=False):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    seg = None
    if with_segments:
        # two segments + trailing padding per row
        s = np.ones((B, L), np.int32)
        s[:, L // 2 :] = 2
        s[:, -L // 8 :] = 0
        seg = jnp.asarray(s)
    return q, k, v, seg


class TestMeshForward:
    @pytest.mark.parametrize("window", [None, 64])
    @pytest.mark.parametrize("with_segments", [False, True])
    def test_matches_unsharded(self, window, with_segments):
        q, k, v, seg = make_inputs(with_segments=with_segments)
        base = flash_attention(q, k, v, window=window, segment_ids=seg)
        with make_mesh():
            sharded = flash_attention(q, k, v, window=window, segment_ids=seg)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)

    def test_rope_fused(self):
        q, k, v, _ = make_inputs()
        base = flash_attention(q, k, v, rope_theta=10000.0)
        with make_mesh():
            sharded = flash_attention(q, k, v, rope_theta=10000.0)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)

    def test_dp_only_mesh(self):
        q, k, v, seg = make_inputs(with_segments=True)
        base = flash_attention(q, k, v, segment_ids=seg)
        devs = np.array(jax.devices()).reshape(8, 1)
        with Mesh(devs, ("data", "model")):
            sharded = flash_attention(q, k, v, segment_ids=seg)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)

    def test_tp_only_mesh(self):
        # H=4, tp=4 -> 1 head/shard = 64 lanes < 128: tp not ok -> dp axis 1,
        # falls through to the plain path; H=8, tp=4 -> 2 heads = 128 ok.
        q, k, v, _ = make_inputs(B=2, H=8)
        base = flash_attention(q, k, v)
        devs = np.array(jax.devices()[:4]).reshape(1, 4)
        with Mesh(devs, ("data", "model")):
            sharded = flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)

    def test_indivisible_shapes_fall_back(self):
        # B=3 not divisible by 4, H=4/tp=2 -> 2 heads*64=128 ok on model axis
        q, k, v, _ = make_inputs(B=3, H=4, L=128)
        base = flash_attention(q, k, v)
        with make_mesh():
            sharded = flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)

    def test_kill_switch(self, monkeypatch):
        monkeypatch.setattr(platform, "MESH_PALLAS_ENABLED", False)
        with make_mesh():
            assert platform.active_mesh() is None

    def test_active_mesh_engages(self):
        """Positive probe: the private-API path in active_mesh() must return
        the ambient mesh — if a JAX upgrade moves those internals, the whole
        mesh dispatch silently degrades to replicated and only THIS test
        notices (the allclose tests pass trivially on the fallback path)."""
        assert platform.active_mesh() is None
        with make_mesh() as m:
            got = platform.active_mesh()
            assert got is not None
            assert dict(got.shape) == {"data": 4, "model": 2}


class TestMeshFusedLnOps:
    """The fused LN->matmul / LN->FFN primals self-wrap in a dp shard_map
    under an ambient mesh (same GSPMD-opacity problem as flash_attention)."""

    def _xw(self, d=256, n=768, B=8, L=32, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((B, L, d)), jnp.float32)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
        w = jnp.asarray(rng.standard_normal((d, n)) * 0.02, jnp.float32)
        return x, scale, w

    def test_lnmm_qkv_matches_unsharded(self):
        from cm3p_tpu.ops.fused_ln_matmul import fused_ln_matmul

        x, scale, w = self._xw()
        base = fused_ln_matmul(x, w, scale=scale)
        with make_mesh():
            sharded = fused_ln_matmul(x, w, scale=scale)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)

    def test_lnmm_wo_residual_matches_unsharded(self):
        from cm3p_tpu.ops.fused_ln_matmul import fused_ln_matmul

        x, _, w = self._xw(n=256)
        res = x * 0.5
        base = fused_ln_matmul(x, w, residual=res)
        with make_mesh():
            sharded = fused_ln_matmul(x, w, residual=res)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)

    def test_lnmm_q_matches_unsharded(self):
        from cm3p_tpu.ops.fused_ln_matmul import fused_ln_matmul_q

        x, scale, w = self._xw()
        base = fused_ln_matmul_q(x, w, scale=scale)
        with make_mesh():
            sharded = fused_ln_matmul_q(x, w, scale=scale)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)

    def test_lnmm_q_residual_matches_unsharded(self):
        from cm3p_tpu.ops.fused_ln_matmul import fused_ln_matmul_q

        x, _, w = self._xw(n=256)
        res = x * 0.5
        base = fused_ln_matmul_q(x, w, residual=res)
        with make_mesh():
            sharded = fused_ln_matmul_q(x, w, residual=res)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)

    def test_ffn_matches_unsharded(self):
        from cm3p_tpu.ops.fused_ffn import fused_ln_ffn

        rng = np.random.default_rng(1)
        d, f = 256, 512
        x = jnp.asarray(rng.standard_normal((8, 32, d)), jnp.bfloat16)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
        wi = jnp.asarray(rng.standard_normal((d, 2 * f)) * 0.02, jnp.float32)
        wo = jnp.asarray(rng.standard_normal((f, d)) * 0.02, jnp.float32)
        base = fused_ln_ffn(x, scale, None, wi, wo, eps=1e-5)
        with make_mesh():
            sharded = fused_ln_ffn(x, scale, None, wi, wo, eps=1e-5)
        np.testing.assert_allclose(
            np.asarray(sharded, np.float32), np.asarray(base, np.float32), atol=1e-5
        )

    def test_indivisible_rows_fall_back(self):
        from cm3p_tpu.ops.fused_ln_matmul import fused_ln_matmul

        x, scale, w = self._xw(B=3)
        base = fused_ln_matmul(x, w, scale=scale)
        with make_mesh():
            sharded = fused_ln_matmul(x, w, scale=scale)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)

    def test_grads_unaffected_by_mesh(self):
        from cm3p_tpu.ops.fused_ffn import fused_ln_ffn

        rng = np.random.default_rng(2)
        d, f = 256, 512
        x = jnp.asarray(rng.standard_normal((4, 16, d)), jnp.float32)
        scale = jnp.asarray(rng.uniform(0.5, 1.5, d), jnp.float32)
        wi = jnp.asarray(rng.standard_normal((d, 2 * f)) * 0.02, jnp.float32)
        wo = jnp.asarray(rng.standard_normal((f, d)) * 0.02, jnp.float32)

        def loss(x_, wi_, wo_):
            return jnp.sum(fused_ln_ffn(x_, scale, None, wi_, wo_, eps=1e-5) ** 2)

        gbase = jax.grad(loss, argnums=(0, 1, 2))(x, wi, wo)
        with make_mesh():
            gsh = jax.grad(loss, argnums=(0, 1, 2))(x, wi, wo)
        for a, b_ in zip(gsh, gbase):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


class TestMeshModelLevel:
    """Full EncoderLayer with attn_impl='pallas' under an ambient mesh.

    Two compositions since the LNMM default flip (commit 32d2d42):

    - default path: XLA attn pre-LN + QKV/Wo dots around the mesh-aware
      flash kernel + fused FFN. Under the (data, model) mesh GSPMD shards
      the QKV/Wo contractions over `model` (Megatron-style partial sums +
      psum), so bf16 accumulation order differs from the unsharded dot —
      correct math, different rounding. Assert to a bf16-rounding bound
      plus a tight mean-drift bound (a real wiring bug diverges O(1) on
      most elements, far outside both).
    - lnmm-forced path: the fused QKV/Wo kernels run per data shard with
      identical per-row math, so sharded == unsharded stays exact.
    """

    def _run(self, layer_id):
        from cm3p_tpu.configs import EncoderConfig
        from cm3p_tpu.models.modernbert import EncoderLayer

        cfg = EncoderConfig(
            hidden_size=256, intermediate_size=512,
            num_attention_heads=4, num_hidden_layers=2,
        )
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.standard_normal((8, 640, 256)), jnp.bfloat16)
        cos = jnp.ones((640, 64), jnp.bfloat16)
        sin = jnp.zeros((640, 64), jnp.bfloat16)
        layer = EncoderLayer(cfg, layer_id, jnp.bfloat16, attn_impl="pallas")
        params = layer.init(jax.random.PRNGKey(3), x, None, cos, sin, 64)
        base = np.asarray(layer.apply(params, x, None, cos, sin, 64), np.float32)
        with make_mesh():
            sharded = np.asarray(layer.apply(params, x, None, cos, sin, 64), np.float32)
        return sharded, base

    @pytest.mark.parametrize("layer_id", [0, 1])  # 0 = global layer, 1 = local
    def test_encoder_layer_matches_unsharded(self, layer_id):
        sharded, base = self._run(layer_id)
        np.testing.assert_allclose(sharded, base, atol=6e-2)
        assert np.mean(np.abs(sharded - base)) < 3e-3

    @pytest.mark.parametrize("layer_id", [0, 1])
    def test_encoder_layer_matches_unsharded_lnmm(self, layer_id, monkeypatch):
        from cm3p_tpu.ops import fused_ln_matmul as lnmm

        monkeypatch.setattr(lnmm, "FUSED_LNMM_QKV_ENABLED", True)
        monkeypatch.setattr(lnmm, "FUSED_LNMM_WO_ENABLED", True)
        monkeypatch.setattr(lnmm, "FUSED_LNMM_ENABLED", True)
        sharded, base = self._run(layer_id)
        np.testing.assert_allclose(sharded, base, atol=1e-5)


class TestMeshFusedWo:
    @pytest.mark.parametrize("window", [None, 64])
    @pytest.mark.parametrize("with_segments", [False, True])
    def test_wo_epilogue_matches_unsharded(self, window, with_segments):
        """The dp shard_map wrap of the Wo-epilogue path (incl. the
        no-segments case, where the dummy operand must NOT reach the kernel
        as segment ids)."""
        rng = np.random.default_rng(3)
        q, k, v, seg = make_inputs(with_segments=with_segments)
        wo = jnp.asarray(rng.standard_normal((256, 256)) * 0.05, jnp.float32)
        res = jnp.asarray(rng.standard_normal((8, 256, 256)), jnp.float32)
        base = flash_attention(
            q, k, v, window=window, segment_ids=seg, wo=wo, out_residual=res
        )
        with make_mesh():
            sharded = flash_attention(
                q, k, v, window=window, segment_ids=seg, wo=wo, out_residual=res
            )
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(base), atol=1e-5)


class TestMeshGrad:
    @pytest.mark.parametrize("window", [None, 64])
    def test_grads_match_unsharded(self, window):
        q, k, v, seg = make_inputs(B=4, L=128, with_segments=True)

        def loss(q_, k_, v_):
            o = flash_attention(q_, k_, v_, window=window, segment_ids=seg)
            return jnp.sum(o * o)

        gbase = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        with make_mesh(data=4, model=2):
            gsh = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gsh, gbase):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)

    def test_grads_match_with_rope(self):
        q, k, v, _ = make_inputs(B=4, L=128)

        def loss(q_, k_, v_):
            o = flash_attention(q_, k_, v_, rope_theta=10000.0)
            return jnp.sum(o * o)

        gbase = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        with make_mesh(data=4, model=2):
            gsh = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gsh, gbase):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


class TestMeshJit:
    def test_under_jit_with_sharded_inputs(self):
        """The production shape: jit inside `with mesh:` on device_put inputs."""
        q, k, v, seg = make_inputs(with_segments=True)
        base = flash_attention(q, k, v, segment_ids=seg)
        mesh = make_mesh()
        qs = jax.device_put(q, NamedSharding(mesh, P("data", None, "model", None)))
        ks = jax.device_put(k, NamedSharding(mesh, P("data", None, "model", None)))
        vs = jax.device_put(v, NamedSharding(mesh, P("data", None, "model", None)))
        ss = jax.device_put(seg, NamedSharding(mesh, P("data", None)))
        with mesh:
            fn = jax.jit(lambda a, b, c, s: flash_attention(a, b, c, segment_ids=s))
            out = fn(qs, ks, vs, ss)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)

    def test_sp_path_still_works(self):
        """sequence-parallel wraps flash_attention in its own shard_map; the
        ambient-mesh probe must return None inside it (no nested shard_map)."""
        from cm3p_tpu.parallel.sequence import sequence_sharded_attention

        q, k, v, _ = make_inputs(B=2, H=4, L=256)
        mesh = Mesh(np.array(jax.devices()), ("seq",))
        base = flash_attention(q, k, v, window=32)
        out = sequence_sharded_attention(q, k, v, None, mesh=mesh, window=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)
