"""Metadata sequence packing (CM3PModule.meta_pack) == unpacked, exactly.

The metadata tower runs huge batches of ~24-token sequences; meta_pack=G
packs G of them along the length axis with block-diagonal segment masking
and per-segment restarting rope positions (tools/bench_meta_tower.py has
the measured motivation). These tests pin that the packed path is the same
function: same features, same gradients, ragged row counts and padded
masks included.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3p_tpu.configs import tiny_cm3p_config
from cm3p_tpu.models import CM3PModule


def _model(meta_pack, dtype=jnp.float32):
    cfg = tiny_cm3p_config()
    return CM3PModule(cfg, dtype=dtype, attn_impl="xla", meta_pack=meta_pack), cfg


def _inputs(w=3, v=5, l=8, vocab=None, with_mask=True, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, (w, v, l)).astype(np.int32)
    if not with_mask:
        return jnp.asarray(ids), None
    mask = np.ones((w, v, l), np.int32)
    mask[:, :, l - 2 :] = 0  # tail padding inside every sequence
    mask[1, 2, 1:] = 0  # nearly-empty variation (CLS only)
    return jnp.asarray(ids), jnp.asarray(mask)


class TestMetaPackParity:
    @pytest.mark.parametrize("g", [2, 4, 5])
    @pytest.mark.parametrize("with_mask", [True, False])
    def test_features_match_unpacked(self, g, with_mask):
        base, cfg = _model(0)
        packed, _ = _model(g)
        ids, mask = _inputs(vocab=cfg.metadata_config.vocab_size, with_mask=with_mask)
        params = base.init(
            jax.random.PRNGKey(0),
            metadata_ids=ids,
            metadata_attention_mask=mask,
            method=CM3PModule.get_metadata_features,
        )

        def feats(m):
            return m.apply(
                params,
                metadata_ids=ids,
                metadata_attention_mask=mask,
                normalize=True,
                method=CM3PModule.get_metadata_features,
            )

        # w*v = 15 rows: g=2/4 exercise the pad path, g=5 divides exactly
        np.testing.assert_allclose(
            np.asarray(feats(packed)), np.asarray(feats(base)), atol=1e-5, rtol=1e-5
        )

    def test_grads_match_unpacked(self):
        base, cfg = _model(0)
        packed, _ = _model(4)
        ids, mask = _inputs(vocab=cfg.metadata_config.vocab_size)
        params = base.init(
            jax.random.PRNGKey(0),
            metadata_ids=ids,
            metadata_attention_mask=mask,
            method=CM3PModule.get_metadata_features,
        )

        def loss(p, m):
            out = m.apply(
                p,
                metadata_ids=ids,
                metadata_attention_mask=mask,
                method=CM3PModule.get_metadata_features,
            )
            return (out.astype(jnp.float32) ** 2).sum()

        g_base = jax.grad(loss)(params, base)
        g_packed = jax.grad(loss)(params, packed)
        flat_b = jax.tree_util.tree_leaves(g_base)
        flat_p = jax.tree_util.tree_leaves(g_packed)
        assert len(flat_b) == len(flat_p)
        for a, b in zip(flat_p, flat_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4)

    def test_long_row_xla_path_matches(self):
        """g * l > 512 on the XLA path still reproduces unpacked exactly."""
        base, cfg = _model(0)
        packed, _ = _model(128)  # 128 * 8 = 1024 tokens per row
        ids, mask = _inputs(w=16, v=16, vocab=cfg.metadata_config.vocab_size)
        params = base.init(
            jax.random.PRNGKey(0),
            metadata_ids=ids,
            metadata_attention_mask=mask,
            method=CM3PModule.get_metadata_features,
        )

        def feats(m):
            return m.apply(
                params,
                metadata_ids=ids,
                metadata_attention_mask=mask,
                method=CM3PModule.get_metadata_features,
            )

        np.testing.assert_allclose(
            np.asarray(feats(packed)), np.asarray(feats(base)), atol=1e-5, rtol=1e-5
        )

    def test_flash_path_matches(self, monkeypatch):
        """g*l >= 512 with attn_impl='pallas' routes through the segmented
        flash kernels (interpret mode) and matches the unpacked XLA path."""
        import functools

        from jax.experimental import pallas as pl

        from cm3p_tpu.ops import flash_attention as fa

        monkeypatch.setattr(
            fa.pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
        )
        base, cfg = _model(0)
        cfgp = tiny_cm3p_config()
        packed = CM3PModule(cfgp, dtype=jnp.float32, attn_impl="pallas", meta_pack=64)
        ids, mask = _inputs(w=8, v=16, vocab=cfg.metadata_config.vocab_size)  # 64*8 = 512
        params = base.init(
            jax.random.PRNGKey(0),
            metadata_ids=ids,
            metadata_attention_mask=mask,
            method=CM3PModule.get_metadata_features,
        )

        def feats(m):
            return m.apply(
                params,
                metadata_ids=ids,
                metadata_attention_mask=mask,
                method=CM3PModule.get_metadata_features,
            )

        np.testing.assert_allclose(
            np.asarray(feats(packed)), np.asarray(feats(base)), atol=2e-5, rtol=1e-5
        )

    def test_full_forward_with_pack(self):
        """The contrastive forward accepts meta_pack (loss finite, matches)."""
        cfg = tiny_cm3p_config()
        ids, mask = _inputs(w=2, v=3, l=8, vocab=cfg.metadata_config.vocab_size)
        bids = jnp.asarray(
            np.random.default_rng(1).integers(1, cfg.beatmap_config.vocab_size, (2, 16)),
            jnp.int32,
        )
        bmask = jnp.ones((2, 16), jnp.int32)
        classes = jnp.asarray(np.tile([0, 1, 1], (2, 1)), jnp.int32)

        def run(meta_pack):
            model = CM3PModule(cfg, dtype=jnp.float32, attn_impl="xla", meta_pack=meta_pack)
            params = model.init(
                jax.random.PRNGKey(0),
                input_ids=bids,
                attention_mask=bmask,
                metadata_ids=ids,
                metadata_attention_mask=mask,
                metadata_variation_classes=classes,
                return_loss=True,
            )
            return model.apply(
                params,
                input_ids=bids,
                attention_mask=bmask,
                metadata_ids=ids,
                metadata_attention_mask=mask,
                metadata_variation_classes=classes,
                return_loss=True,
            ).loss

        l0, l3 = run(0), run(3)
        assert np.isfinite(float(l0)) and np.isfinite(float(l3))
        np.testing.assert_allclose(float(l3), float(l0), atol=1e-5, rtol=1e-5)
