"""Packing + segment-attention tests: packed forward == per-window forward."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3p_tpu.configs import tiny_cm3p_config
from cm3p_tpu.models.modernbert import ModernBertEncoder
from cm3p_tpu.processing.packing import pack_windows, packing_efficiency, segment_cls_pool


class TestPackWindows:
    def test_basic_packing(self):
        seqs = [np.arange(1, 5), np.arange(1, 9), np.arange(1, 3)]
        out = pack_windows(seqs, max_length=10, pad_id=0)
        assert out["input_ids"].shape[1] == 10
        # 8 + 2 fit in one row; 4 in another → 2 rows
        assert out["input_ids"].shape[0] == 2
        # each window is recoverable at (row, offset)
        for w, seq in enumerate(seqs):
            r, off = out["window_to_row"][w], out["window_offset"][w]
            np.testing.assert_array_equal(out["input_ids"][r, off : off + len(seq)], seq)
            assert (out["segment_ids"][r, off : off + len(seq)] == out["window_segment"][w]).all()

    def test_truncation(self):
        out = pack_windows([np.arange(100)], max_length=16, pad_id=0)
        assert out["input_ids"].shape == (1, 16)

    def test_efficiency_improves(self):
        rng = np.random.default_rng(0)
        seqs = [np.ones(int(n), np.int32) for n in rng.integers(50, 400, 64)]
        packed_rate, padded_rate = packing_efficiency(seqs, 512)
        assert packed_rate > padded_rate * 1.5

    def test_segment_zero_is_padding(self):
        out = pack_windows([np.arange(1, 4)], max_length=8, pad_id=0)
        np.testing.assert_array_equal(out["segment_ids"][0], [1, 1, 1, 0, 0, 0, 0, 0])


class TestPackedForwardEquivalence:
    @pytest.mark.parametrize("attn_impl", ["xla", "pallas"])
    def test_packed_matches_individual(self, attn_impl):
        """Encoding packed windows must equal encoding each window alone."""
        cfg = tiny_cm3p_config().beatmap_config
        cfg.local_attention = 8
        cfg.global_attn_every_n_layers = 2
        enc = ModernBertEncoder(cfg, attn_impl="xla")
        rng = np.random.default_rng(0)
        seqs = [rng.integers(1, 400, n) for n in (48, 96, 30)]
        packed = pack_windows(seqs, max_length=192, pad_id=0)

        params = enc.init(jax.random.PRNGKey(0), input_ids=jnp.asarray(packed["input_ids"]))

        def run_packed():
            if attn_impl == "pallas":
                import jax.experimental.pallas as pl

                orig = pl.pallas_call
                pl.pallas_call = functools.partial(orig, interpret=True)
                try:
                    enc_p = ModernBertEncoder(cfg, attn_impl="pallas")
                    # force flash path even at short length by bumping l>=1024
                    # via padding the packed rows
                    ids = np.zeros((packed["input_ids"].shape[0], 1024), np.int32)
                    segs = np.zeros_like(ids)
                    ids[:, : packed["input_ids"].shape[1]] = packed["input_ids"]
                    segs[:, : packed["segment_ids"].shape[1]] = packed["segment_ids"]
                    hidden = enc_p.apply(
                        params,
                        input_ids=jnp.asarray(ids),
                        attention_mask=jnp.asarray((segs > 0).astype(np.int32)),
                        segment_ids=jnp.asarray(segs),
                    )
                finally:
                    pl.pallas_call = orig
                return hidden
            return enc.apply(
                params,
                input_ids=jnp.asarray(packed["input_ids"]),
                attention_mask=jnp.asarray(packed["attention_mask"]),
                segment_ids=jnp.asarray(packed["segment_ids"]),
            )

        hidden_packed = np.asarray(run_packed())

        for w, seq in enumerate(seqs):
            solo = enc.apply(params, input_ids=jnp.asarray(seq[None, :], jnp.int32))
            r = packed["window_to_row"][w]
            off = packed["window_offset"][w]
            got = hidden_packed[r, off : off + len(seq)]
            np.testing.assert_allclose(got, np.asarray(solo[0]), atol=2e-4)

    def test_packed_audio_features_match_dense(self):
        """get_packed_beatmap_features with audio == per-window dense features.

        The packed path scatters each window's audio tokens at the static
        offset (segment-1)*n_tok within its row; RoPE shift-invariance and
        segment masking make the result bit-equal to the dense path.
        """
        from cm3p_tpu.configs import AudioConfig, BeatmapConfig, CM3PConfig, MetadataConfig
        from cm3p_tpu.models.cm3p import CM3PModule

        ac = AudioConfig(hidden_size=16, intermediate_size=32, num_hidden_layers=1,
                         num_attention_heads=2, projector_intermediate_size=64,
                         projector_dim=32)
        bc = BeatmapConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=2, intermediate_size=64,
                           max_position_embeddings=512, audio_token_id=100,
                           global_attn_every_n_layers=2, local_attention=8,
                           audio_config=ac)
        mc = MetadataConfig(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                            num_attention_heads=2, intermediate_size=32,
                            max_position_embeddings=64)
        model = CM3PModule(CM3PConfig(beatmap_config=bc, metadata_config=mc, projection_dim=16))

        n_tok = 4
        seqs = []
        for i, n in enumerate((20, 12, 16)):
            s = np.random.default_rng(i).integers(5, 90, n)
            s[2 : 2 + n_tok] = 100  # [AUDIO] placeholders
            seqs.append(np.asarray(s))
        feats = np.random.default_rng(9).normal(size=(3, 80, n_tok * 8)).astype(np.float32)
        packed = pack_windows(seqs, max_length=32, pad_id=0)

        ids = np.zeros((3, 24), np.int64)
        mask = np.zeros((3, 24), np.int64)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                            input_features=jnp.asarray(feats),
                            attention_mask=jnp.asarray(mask),
                            method=CM3PModule.get_beatmap_features)
        dense = np.asarray(model.apply(params, jnp.asarray(ids),
                                       input_features=jnp.asarray(feats),
                                       attention_mask=jnp.asarray(mask),
                                       method=CM3PModule.get_beatmap_features,
                                       normalize=True))
        pf = np.asarray(model.apply(params,
                                    input_ids=jnp.asarray(packed["input_ids"]),
                                    segment_ids=jnp.asarray(packed["segment_ids"]),
                                    window_rows=jnp.asarray(packed["window_to_row"]),
                                    window_segments=jnp.asarray(packed["window_segment"]),
                                    input_features=jnp.asarray(feats),
                                    method=CM3PModule.get_packed_beatmap_features,
                                    normalize=True))
        np.testing.assert_allclose((dense * pf).sum(-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(dense, pf, atol=1e-5)

    def test_segment_cls_pool(self):
        hidden = np.arange(2 * 6 * 3).reshape(2, 6, 3)
        pooled = segment_cls_pool(hidden, np.array([0, 1, 1]), np.array([0, 0, 3]))
        np.testing.assert_array_equal(pooled[0], hidden[0, 0])
        np.testing.assert_array_equal(pooled[1], hidden[1, 0])
        np.testing.assert_array_equal(pooled[2], hidden[1, 3])
