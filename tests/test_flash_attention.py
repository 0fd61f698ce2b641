"""Flash-attention kernel tests (interpret mode): forward + backward parity."""
import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import cm3p_tpu.ops.flash_attention as fa



pytestmark = pytest.mark.slow  # see pytest.ini: excluded from the quick gate
@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


def make_inputs(B=2, H=4, L=512, D=64, seed=0):
    """Head-minor (B, L, H, D) inputs — the kernels' native layout."""
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    mask = jnp.asarray((rng.integers(0, 2, (B, L)) | (np.arange(L) < L // 2)).astype(np.int32))
    return q, k, v, mask


def ref(q, k, v, qseg, kseg, window):
    """Dense reference over (B, L, H, D)."""
    b, l, h, d = q.shape
    out = fa._xla_reference(
        q.reshape(b, l, h * d), k.reshape(b, k.shape[1], h * d), v.reshape(b, v.shape[1], h * d),
        qseg, kseg, window, h,
    )
    return out.reshape(b, l, h, d)


class TestForward:
    @pytest.mark.parametrize("window", [None, 64, 128])
    @pytest.mark.parametrize("block", [128, 256])
    def test_key_mask_parity(self, window, block):
        q, k, v, mask = make_inputs()
        out = fa.flash_attention(q, k, v, key_mask=mask, window=window, block_q=block, block_k=block)
        expected = ref(q, k, v, jnp.ones_like(mask), mask, window)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    def test_no_mask(self):
        q, k, v, _ = make_inputs()
        out = fa.flash_attention(q, k, v)
        expected = ref(q, k, v, None, None, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    def test_unaligned_length_pads(self):
        q, k, v, mask = make_inputs(L=384, D=32)
        out = fa.flash_attention(q, k, v, key_mask=mask, window=64)
        expected = ref(q, k, v, jnp.ones_like(mask), mask, 64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    @pytest.mark.parametrize("window", [None, 64])
    def test_segments(self, window):
        q, k, v, _ = make_inputs()
        seg = np.zeros((2, 512), np.int32)
        seg[:, :200] = 1
        seg[:, 200:480] = 2
        segj = jnp.asarray(seg)
        out = fa.flash_attention(q, k, v, segment_ids=segj, window=window)
        expected = ref(q, k, v, segj, segj, window)
        valid = (seg > 0)[:, :, None, None]
        err = np.max(np.abs(np.where(valid, np.asarray(out) - np.asarray(expected), 0.0)))
        assert err < 2e-5
        # fully-masked (padding) rows produce zeros, not NaN
        assert np.isfinite(np.asarray(out)).all()
        assert (np.abs(np.asarray(out)[:, 480:, :, :]) < 1e-6).all()

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
            return jnp.sum(ref(q, k, v, jnp.ones_like(mask), mask, window) * g_out)

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
        valid = jnp.asarray((seg > 0)[:, :, None, None].astype(np.float32))
        g_out = jnp.asarray(np.random.default_rng(1).standard_normal(q.shape), jnp.float32) * 0.1 * valid

        def loss_pallas(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, segment_ids=segj, window=window) * g_out)

        def loss_ref(q, k, v):
            return jnp.sum(ref(q, k, v, segj, segj, window) * g_out)

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


class TestSegmentBlockSkipping:
    """Global layers visit only key blocks whose segment interval intersects
    the query block's (scalar-prefetch dynamic ranges). Shapes here span
    many 256-token blocks with short segments so ranges genuinely shrink."""

    def test_block_range_computation(self):
        b, l, bq, bk = 2, 1024, 256, 256
        seg = np.zeros((b, l), np.int32)
        # row 0: 4 segments of 250 + padding tail; row 1: one long segment
        for i, s in enumerate(range(0, 1000, 250)):
            seg[0, s : s + 250] = i + 1
        seg[1, :700] = 1
        segj = jnp.asarray(seg)
        start, count = fa._block_ranges(b, l // bq, l // bk, l // bk, bq, bk, None, segj, segj)
        start, count = np.asarray(start), np.asarray(count)
        # row 0 q-block 0 holds segs 1-2 -> key blocks 0-1
        assert start[0, 0] == 0 and count[0, 0] == 2
        # row 0 q-block 3 holds segs 4 (+padding) -> key blocks 2-3
        assert start[0, 3] == 2 and count[0, 3] == 2
        # row 1 q-block 3 is all padding -> nothing to visit
        assert count[1, 3] == 0
        # row 1 q-blocks 0-2 share seg 1 spanning key blocks 0-2
        assert start[1, 0] == 0 and count[1, 0] == 3

    def test_global_packed_parity_multiblock(self):
        rng = np.random.default_rng(11)
        b, h, l, d = 2, 4, 1024, 64
        q = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
        seg = np.zeros((b, l), np.int32)
        for i, s in enumerate(range(0, 900, 300)):
            seg[0, s : s + 300] = i + 1
        seg[1, :512] = 1
        seg[1, 512:800] = 2
        segj = jnp.asarray(seg)
        out = fa.flash_attention(q, k, v, segment_ids=segj)
        expected = ref(q, k, v, segj, segj, None)
        valid = (seg > 0)[:, :, None, None]
        err = np.max(np.abs(np.where(valid, np.asarray(out) - np.asarray(expected), 0.0)))
        assert err < 2e-5
        assert np.isfinite(np.asarray(out)).all()

    def test_global_packed_grads_multiblock(self):
        rng = np.random.default_rng(12)
        b, h, l, d = 1, 2, 1024, 32
        q = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
        seg = np.zeros((b, l), np.int32)
        seg[0, :300] = 1
        seg[0, 300:640] = 2
        seg[0, 640:900] = 3
        segj = jnp.asarray(seg)
        # masked rows are don't-care (kernel zeroes them, reference softmax
        # spreads uniformly) — gradients only compared through valid rows
        valid = jnp.asarray((seg > 0)[:, :, None, None].astype(np.float32))
        g_out = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32) * valid

        def f(q, k, v):
            return jnp.sum(fa.flash_attention(q, k, v, segment_ids=segj) * g_out)

        def fr(q, k, v):
            return jnp.sum(ref(q, k, v, segj, segj, None) * g_out)

        g1 = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=5e-4)


class TestPathCoverage:
    def test_streaming_windowed_path(self):
        """window=160 at 128-blocks needs 5 key blocks: falls back from the
        fused single-pass kernel to the streaming online-softmax kernel."""
        q, k, v, mask = make_inputs()
        out = fa.flash_attention(q, k, v, key_mask=mask, window=160, block_q=128, block_k=128)
        expected = ref(q, k, v, jnp.ones_like(mask), mask, 160)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    def test_streaming_windowed_grads(self):
        q, k, v, mask = make_inputs(L=256)
        mask = mask[:, :256]
        g_out = jnp.asarray(np.random.default_rng(3).standard_normal(q.shape), jnp.float32) * 0.1

        def loss_pallas(q, k, v):
            return jnp.sum(
                fa.flash_attention(q, k, v, key_mask=mask, window=96, block_q=64, block_k=64) * g_out
            )

        def loss_ref(q, k, v):
            return jnp.sum(ref(q, k, v, jnp.ones_like(mask), mask, 96) * g_out)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b in zip(("dq", "dk", "dv"), gp, gr):
            rel = float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(b))) + 1e-9)
            assert rel < 5e-4, (name, rel)

    @pytest.mark.parametrize("window", [None, 64])
    def test_nograd_forward_matches_grad_forward(self, window):
        """The no-grad path drops the lse output (with_lse=False); the primal
        of the differentiated path must produce the identical output."""
        q, k, v, _ = make_inputs(L=256)
        seg = np.zeros((2, 256), np.int32)
        seg[:, :100] = 1
        seg[:, 100:240] = 2
        segj = jnp.asarray(seg)
        out_nograd = fa.flash_attention(q, k, v, segment_ids=segj, window=window)
        out_grad, _ = jax.vjp(
            lambda q_: fa.flash_attention(q_, k, v, segment_ids=segj, window=window), q
        )
        np.testing.assert_allclose(np.asarray(out_nograd), np.asarray(out_grad), atol=1e-6)


class TestOnlineMaxOptOut:
    """CM3P_FA_ONLINE_MAX=1 restores the running-max softmax; keep both
    forms producing identical results so the debug switch doesn't rot."""

    @pytest.mark.parametrize("window", [None, 64])
    def test_online_max_matches_fixed_shift(self, monkeypatch, window):
        q, k, v, _ = make_inputs(L=256)
        seg = np.zeros((2, 256), np.int32)
        seg[:, :150] = 1
        seg[:, 150:230] = 2
        segj = jnp.asarray(seg)
        out_fixed = fa.flash_attention(q, k, v, segment_ids=segj, window=window)
        monkeypatch.setattr(fa, "ONLINE_MAX", True)
        out_online = fa.flash_attention(q, k, v, segment_ids=segj, window=window)
        np.testing.assert_allclose(np.asarray(out_fixed), np.asarray(out_online), atol=2e-6)


def rope_ref(q, k, theta):
    """Reference rope application (production apply_rope, arange positions)."""
    from cm3p_tpu.models.modernbert import apply_rope, rope_cos_sin

    cos, sin = rope_cos_sin(jnp.arange(q.shape[1]), q.shape[-1], theta)
    return apply_rope(q, k, cos, sin)


class TestFusedRope:
    """In-kernel rotary embedding (rope_theta): fwd + grads == rope-then-attend."""

    @pytest.mark.parametrize("window", [None, 64])
    @pytest.mark.parametrize("theta", [10000.0, 160000.0])
    def test_forward_parity(self, window, theta):
        q, k, v, mask = make_inputs()
        qr, kr = rope_ref(q, k, theta)
        expected = fa.flash_attention(qr, kr, v, key_mask=mask, window=window)
        out = fa.flash_attention(q, k, v, key_mask=mask, window=window, rope_theta=theta)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    @pytest.mark.parametrize("window", [None, 64])
    def test_segments_forward_parity(self, window):
        q, k, v, _ = make_inputs()
        seg = jnp.asarray(
            np.concatenate([np.full(180, 1), np.full(200, 2), np.zeros(132)]).astype(np.int32)
        )[None].repeat(2, 0)
        qr, kr = rope_ref(q, k, 10000.0)
        expected = fa.flash_attention(qr, kr, v, segment_ids=seg, window=window)
        out = fa.flash_attention(q, k, v, segment_ids=seg, window=window, rope_theta=10000.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    @pytest.mark.parametrize("window", [None, 64])
    def test_grads_match(self, window):
        q, k, v, mask = make_inputs(L=256)

        def loss_fused(q, k, v):
            out = fa.flash_attention(q, k, v, key_mask=mask, window=window, rope_theta=10000.0)
            return jnp.sum(out * out)

        def loss_ref(q, k, v):
            qr, kr = rope_ref(q, k, 10000.0)
            out = fa.flash_attention(qr, kr, v, key_mask=mask, window=window)
            return jnp.sum(out * out)

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)

    def test_fallback_small_head_dim(self):
        """d != 64 falls back to an XLA rope pass, same numbers."""
        q, k, v, mask = make_inputs(D=32)
        qr, kr = rope_ref(q, k, 10000.0)
        expected = fa.flash_attention(qr, kr, v, key_mask=mask, window=64)
        out = fa.flash_attention(q, k, v, key_mask=mask, window=64, rope_theta=10000.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    def test_fallback_streaming_window(self):
        """A window too wide for the fused kernel streams with XLA rope."""
        q, k, v, mask = make_inputs(L=1024)
        qr, kr = rope_ref(q, k, 10000.0)
        expected = fa.flash_attention(qr, kr, v, key_mask=mask, window=300, block_q=128, block_k=128)
        out = fa.flash_attention(
            q, k, v, key_mask=mask, window=300, block_q=128, block_k=128, rope_theta=10000.0
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    def test_rectangular_with_rope_rejected(self):
        """lq != lk with rope_theta is ambiguous (shard-local vs absolute q
        positions) — must raise, not silently fuse wrong positions."""
        q, k, v, _ = make_inputs(L=256)
        kk = jnp.concatenate([k, k], axis=1)
        vv = jnp.concatenate([v, v], axis=1)
        mask = jnp.ones((q.shape[0], kk.shape[1]), jnp.int32)
        with pytest.raises(ValueError, match="rope"):
            fa.flash_attention(q, kk, vv, key_mask=mask, window=None, rope_theta=10000.0)

    @pytest.mark.parametrize("theta", [10000.0, 160000.0])
    def test_helpers_match_model_rope(self, theta):
        """ops' numpy-side rope helpers (_rope_tables/_rot_matrix/
        _apply_rope_xla) must stay formula-identical to the model's
        rope_cos_sin/_rotate_half_matrix/apply_rope — model-path vs
        kernel-path parity depends on it (review finding: two independent
        implementations can silently desynchronize)."""
        from cm3p_tpu.models.modernbert import (
            _rotate_half_matrix,
            apply_rope,
            rope_cos_sin,
        )

        d, l = 64, 192
        np.testing.assert_array_equal(
            np.asarray(fa._rot_matrix(d)), np.asarray(_rotate_half_matrix(d, jnp.float32))
        )
        cos2, sin2 = fa._rope_tables(l, d, theta, jnp.float32)
        cos_m, sin_m = rope_cos_sin(jnp.arange(l), d, theta)
        # ops builds tables in float64, the model in float32 — identical
        # formulas differ by fp32 rounding of theta**(i/d); a formula
        # desync would be orders of magnitude larger
        np.testing.assert_allclose(
            np.asarray(cos2[:, :d]), np.asarray(cos_m), atol=1e-4, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(sin2[:, :d]), np.asarray(sin_m), atol=1e-4, rtol=1e-4
        )

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, l, 4, d)), jnp.float32)
        got = fa._apply_rope_xla(x.reshape(2, l, 4 * d), theta, d).reshape(2, l, 4, d)
        want, _ = apply_rope(x, x, cos_m, sin_m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def seg_ids(B, L, n_seg, seed=1):
    rng = np.random.default_rng(seed)
    bounds = np.sort(rng.integers(1, L, (B, n_seg - 1)), axis=1)
    seg = np.zeros((B, L), np.int32)
    for b in range(B):
        seg[b] = np.searchsorted(bounds[b], np.arange(L), side="right") + 1
    seg[:, -L // 8:] = 0  # padding tail
    return jnp.asarray(seg)


class TestTrainFusedRope:
    """CM3P_TRAIN_FUSED_ROPE: rope entirely in-kernel under autodiff.

    Raw residuals; the backward kernels rotate q/k on load and
    counter-rotate dq/dk at finalize (VERDICT r2 next #4). Gradients must
    match the default path (XLA rope + rotated residuals) on every route:
    window-fused, global-unrolled (segments), and the XLA fallbacks."""

    def _grads(self, q, k, v, window, theta, mask=None, seg=None):
        def loss(q, k, v):
            out = fa.flash_attention(
                q, k, v, key_mask=mask, segment_ids=seg, window=window, rope_theta=theta
            )
            return jnp.sum(out * jnp.cos(out))

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    @pytest.mark.parametrize("window", [64, None])
    def test_grads_match_default_path(self, window, monkeypatch):
        q, k, v, mask = make_inputs(L=256)
        g_ref = self._grads(q, k, v, window, 10000.0, mask=mask)
        monkeypatch.setattr(fa, "TRAIN_FUSED_ROPE", True)
        g_fused = self._grads(q, k, v, window, 10000.0, mask=mask)
        for a, b, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)

    @pytest.mark.parametrize("window", [64, None])
    def test_segment_grads_match(self, window, monkeypatch):
        q, k, v, _ = make_inputs(L=256, seed=4)
        seg = seg_ids(2, 256, 3)
        g_ref = self._grads(q, k, v, window, 160000.0, seg=seg)
        monkeypatch.setattr(fa, "TRAIN_FUSED_ROPE", True)
        g_fused = self._grads(q, k, v, window, 160000.0, seg=seg)
        for a, b, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)

    def test_natural_exp_backward(self, monkeypatch):
        import cm3p_tpu.ops.flash_attention_bwd as fab

        q, k, v, mask = make_inputs(L=256, seed=5)
        g_ref = self._grads(q, k, v, 64, 10000.0, mask=mask)
        monkeypatch.setattr(fa, "TRAIN_FUSED_ROPE", True)
        monkeypatch.setattr(fab, "BWD_EXP2", False)
        g_fused = self._grads(q, k, v, 64, 10000.0, mask=mask)
        for a, b, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)

    def test_streaming_window_fallback_grads(self, monkeypatch):
        """Window too wide for the fused route: the backward XLA-rotates raw
        residuals and counter-rotates after — same numbers as the default."""
        q, k, v, mask = make_inputs(L=1024, seed=6)

        def grads(q, k, v):
            def loss(q, k, v):
                out = fa.flash_attention(
                    q, k, v, key_mask=mask, window=300, block_q=128, block_k=128,
                    rope_theta=10000.0,
                )
                return jnp.sum(out * out)

            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

        g_ref = grads(q, k, v)
        monkeypatch.setattr(fa, "TRAIN_FUSED_ROPE", True)
        g_fused = grads(q, k, v)
        for a, b, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)

    def test_small_head_dim_falls_back(self, monkeypatch):
        """d != 64 can't fuse: the gate must not change numbers."""
        q, k, v, mask = make_inputs(D=32, seed=7)
        g_ref = self._grads(q, k, v, 64, 10000.0, mask=mask)
        monkeypatch.setattr(fa, "TRAIN_FUSED_ROPE", True)
        g_fused = self._grads(q, k, v, 64, 10000.0, mask=mask)
        for a, b, name in zip(g_fused, g_ref, "qkv"):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name)

    def test_forward_value_unchanged(self, monkeypatch):
        """The differentiated forward's primal must equal the no-grad path."""
        q, k, v, mask = make_inputs(L=256, seed=8)
        expected = fa.flash_attention(q, k, v, key_mask=mask, window=64, rope_theta=10000.0)
        monkeypatch.setattr(fa, "TRAIN_FUSED_ROPE", True)

        def f(q):
            return fa.flash_attention(q, k, v, key_mask=mask, window=64, rope_theta=10000.0)

        out, _ = jax.vjp(f, q)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=2e-5)

    def test_bf16_uses_fused_route_and_matches(self, monkeypatch):
        """fp32 now declines the trainable in-kernel route outright (Mosaic
        crashes on the fp32 fused-rope fwd+lse and global bwd — r12/r15
        smokes), so bf16 — the training dtype — is the route that matters:
        verify the gate actually fuses there and grads match the default
        path within bf16 tolerance."""
        import cm3p_tpu.ops.flash_attention as fa_mod

        assert not fa_mod._train_rope_in_kernel(1e4, 256, 4, jnp.float32)
        monkeypatch.setattr(fa_mod, "TRAIN_FUSED_ROPE", True)
        assert not fa_mod._train_rope_in_kernel(1e4, 256, 4, jnp.float32)
        assert fa_mod._train_rope_in_kernel(1e4, 256, 4, jnp.bfloat16)
        assert fa_mod._train_rope_in_kernel(1e4, 256, 4, None)

        q, k, v, mask = make_inputs(L=256, seed=9)
        qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
        monkeypatch.setattr(fa_mod, "TRAIN_FUSED_ROPE", False)
        g_ref = self._grads(qb, kb, vb, 64, 10000.0, mask=mask)
        monkeypatch.setattr(fa_mod, "TRAIN_FUSED_ROPE", True)
        g_fused = self._grads(qb, kb, vb, 64, 10000.0, mask=mask)
        for a, b, name in zip(g_fused, g_ref, "qkv"):
            # bf16 summation-order noise between the two routes: a few
            # elements land one bf16 ulp apart (~4% relative at |g|~0.7)
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=2e-2, rtol=8e-2, err_msg=name,
            )
