"""End-to-end integration tests on the bundled real beatmap.

Mirrors the reference test suite semantics (tests/test_cm3p.py,
test_cm3p_for_masked_lm.py, test_zero_shot_classification.py,
test_ranked_classifier.py) with randomly initialized tiny models — the
full processor → model path on real data, asserting output contracts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3p_tpu.configs import tiny_cm3p_config
from cm3p_tpu.models import ClassifierModule, CM3PModule, MaskedLMModule
from cm3p_tpu.processing import CM3PProcessor
from cm3p_tpu.tokenize import MetadataTokenizer


@pytest.fixture(scope="module")
def processor() -> CM3PProcessor:
    proc = CM3PProcessor(
        metadata_tokenizer=MetadataTokenizer(
            modes={0: "osu", 1: "taiko", 2: "fruits", 3: "mania"},
            mappers={0: "OliBomby", 1: "Cookiezi", 2: "peppy", 3: "Xenon"},
            statuses={1: "ranked", -2: "graveyard"},
        ),
        rng=np.random.default_rng(0),
    )
    proc.default_kwargs["beatmap_kwargs"]["max_length"] = 512
    return proc


@pytest.fixture(scope="module")
def model_setup(processor):
    cfg = tiny_cm3p_config()
    bt = processor.beatmap_tokenizer
    cfg.beatmap_config.vocab_size = bt.vocab_size
    cfg.beatmap_config.audio_token_id = bt.audio_token_id
    cfg.metadata_config.vocab_size = processor.metadata_tokenizer.vocab_size
    model = CM3PModule(cfg)
    return cfg, model


class TestInferenceForward:
    """Reference tests/test_cm3p.py:45-55."""

    def test_forward_on_real_beatmap(self, processor, model_setup, beatmap_path):
        cfg, model = model_setup
        labels = [{"difficulty": 1.5, "mode": "osu", "mapper": "OliBomby", "year": 2020}]
        inputs = processor(metadata=labels, beatmap=beatmap_path, multiply_metadata=True)
        batch = {k: jnp.asarray(v) for k, v in inputs.items()}
        params = model.init(jax.random.PRNGKey(0), **batch)
        out = model.apply(params, **batch)
        logits = out.logits_per_beatmap
        assert logits.ndim == 2 and logits.shape[0] == logits.shape[1]
        assert np.isfinite(np.asarray(logits)).all()
        assert float(out.loss) >= 0


class TestMaskedLM:
    """Reference tests/test_cm3p_for_masked_lm.py + test_masked_prediction.py."""

    def test_masked_prediction_contract(self, processor, beatmap_path):
        cfg = tiny_cm3p_config().beatmap_config
        bt = processor.beatmap_tokenizer
        cfg.vocab_size = bt.vocab_size
        cfg.audio_token_id = bt.audio_token_id
        model = MaskedLMModule(cfg)

        inputs = processor(beatmap=beatmap_path)
        ids = np.asarray(inputs["input_ids"])[:2]
        mask = np.asarray(inputs["attention_mask"])[:2]
        # mask some non-special tokens
        rng = np.random.default_rng(0)
        corrupt = (rng.random(ids.shape) < 0.15) & (mask == 1)
        for sid in bt.all_special_ids:
            corrupt &= ids != sid
        labels = np.where(corrupt, ids, -100).astype(np.int32)
        corrupted = np.where(corrupt, bt.mask_token_id, ids)

        batch = {
            "input_ids": jnp.asarray(corrupted),
            "attention_mask": jnp.asarray(mask),
            "labels": jnp.asarray(labels),
        }
        params = model.init(jax.random.PRNGKey(0), **batch)
        out = model.apply(params, **batch)
        assert out.logits.shape == (*ids.shape, bt.vocab_size)
        assert float(out.loss) > 0
        # untrained model: loss close to uniform ln(V)
        assert abs(float(out.loss) - np.log(bt.vocab_size)) < 2.0


class TestZeroShot:
    """Reference tests/test_zero_shot_classification.py contract (random weights)."""

    def test_zero_shot_ranking_shapes(self, processor, model_setup, beatmap_path):
        cfg, model = model_setup
        metadata = {
            "difficulty": 5.0,
            "year": 2020,
            "status": "ranked",
            "mapper": "OliBomby",
            "mode": "osu",
        }
        inputs = processor(
            metadata=metadata,
            beatmap=beatmap_path,
            multiply_metadata=True,
            populate_metadata=True,
            metadata_variations=6,
        )
        batch = {k: jnp.asarray(v) for k, v in inputs.items()}
        params = model.init(jax.random.PRNGKey(0), **batch)
        out = model.apply(params, **batch)
        n = batch["input_ids"].shape[0]
        assert out.logits_per_beatmap.shape == (n, n, 6)
        # zero-shot metric machinery runs end to end
        from cm3p_tpu.train.metrics import MetricAccumulator

        acc = MetricAccumulator()
        acc.update_zero_shot(np.asarray(out.logits_per_beatmap), np.asarray(batch["metadata_variation_classes"]))
        result = acc.result()
        assert "accuracy_year" in result or "accuracy_status" in result

    def test_get_features_api(self, processor, model_setup, beatmap_path):
        """README quick-start: separate feature extraction calls."""
        cfg, model = model_setup
        inputs = processor(beatmap=beatmap_path)
        batch = {k: jnp.asarray(v) for k, v in inputs.items()}
        params = model.init(
            jax.random.PRNGKey(0), input_ids=batch["input_ids"], attention_mask=batch["attention_mask"]
        )
        feats = model.apply(
            params,
            method=CM3PModule.get_beatmap_features,
            input_ids=batch["input_ids"],
            attention_mask=batch["attention_mask"],
            normalize=True,
        )
        assert feats.shape == (batch["input_ids"].shape[0], cfg.projection_dim)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-3)


class TestRankedClassifier:
    """Reference tests/test_ranked_classifier.py contract (random weights)."""

    def test_classifier_on_real_beatmap(self, processor, beatmap_path):
        cfg = tiny_cm3p_config().beatmap_config
        bt = processor.beatmap_tokenizer
        cfg.vocab_size = bt.vocab_size
        cfg.audio_token_id = bt.audio_token_id
        cfg.num_labels = 2
        model = ClassifierModule(cfg)
        inputs = processor(beatmap=beatmap_path)
        batch = {
            "input_ids": jnp.asarray(inputs["input_ids"]),
            "attention_mask": jnp.asarray(inputs["attention_mask"]),
        }
        params = model.init(jax.random.PRNGKey(0), **batch)
        out = model.apply(params, **batch)
        assert out.logits.shape == (batch["input_ids"].shape[0], 2)
        preds = np.asarray(out.logits).argmax(-1)
        assert set(preds) <= {0, 1}


class TestFlashAttentionInModel:
    def test_pallas_path_matches_xla_path(self, processor, model_setup, beatmap_path):
        """attn_impl='pallas' must produce the same embeddings as 'xla'."""
        cfg, _ = model_setup
        inputs = processor(beatmap=beatmap_path, max_length=2048, padding="max_length")
        batch = {
            "input_ids": jnp.asarray(inputs["input_ids"][:1]),
            "attention_mask": jnp.asarray(inputs["attention_mask"][:1]),
        }
        xla_model = CM3PModule(cfg, attn_impl="xla")
        params = xla_model.init(jax.random.PRNGKey(0), **batch)
        out_xla = xla_model.apply(params, **batch, return_loss=False).beatmap_embeds

        import functools

        import jax.experimental.pallas as pl

        orig = pl.pallas_call
        pl.pallas_call = functools.partial(orig, interpret=True)
        try:
            pallas_model = CM3PModule(cfg, attn_impl="pallas")
            out_pallas = pallas_model.apply(params, **batch, return_loss=False).beatmap_embeds
        finally:
            pl.pallas_call = orig
        np.testing.assert_allclose(np.asarray(out_xla), np.asarray(out_pallas), atol=2e-4)
