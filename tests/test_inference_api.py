"""Tests for the high-level inference API, incl. save → load_pretrained round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3p_tpu import inference
from cm3p_tpu.configs import tiny_cm3p_config
from cm3p_tpu.models import CM3PModule, MaskedLMModule
from cm3p_tpu.processing import CM3PProcessor
from cm3p_tpu.tokenize import MetadataTokenizer
from cm3p_tpu.train.checkpoint import save_model


@pytest.fixture(scope="module")
def processor():
    proc = CM3PProcessor(
        metadata_tokenizer=MetadataTokenizer(
            modes={0: "osu"}, mappers={0: "OliBomby", 1: "peppy"}, statuses={1: "ranked", -2: "graveyard"}
        )
    )
    proc.default_kwargs["beatmap_kwargs"]["max_length"] = 384
    return proc


@pytest.fixture(scope="module")
def saved_artifacts(tmp_path_factory, processor):
    out = tmp_path_factory.mktemp("artifacts")
    cfg = tiny_cm3p_config()
    bt = processor.beatmap_tokenizer
    cfg.beatmap_config.vocab_size = bt.vocab_size
    cfg.beatmap_config.audio_token_id = bt.audio_token_id
    cfg.metadata_config.vocab_size = processor.metadata_tokenizer.vocab_size
    model = CM3PModule(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.ones((1, 16), jnp.int32),
        metadata_ids=jnp.ones((1, 8), jnp.int32),
        return_loss=False,
    )
    save_model(str(out / "model"), jax.device_get(params), config=cfg)
    processor.save_pretrained(str(out / "processor"))
    return out


class TestInferenceAPI:
    def test_load_pretrained_round_trip(self, saved_artifacts):
        processor, model, params = inference.load_pretrained(
            str(saved_artifacts / "model"), str(saved_artifacts / "processor"), dtype=jnp.float32, attn_impl="xla"
        )
        assert isinstance(model, CM3PModule)
        assert processor.beatmap_tokenizer.vocab_size == model.config.beatmap_config.vocab_size

    def test_embed_beatmap(self, saved_artifacts, beatmap_path):
        processor, model, params = inference.load_pretrained(
            str(saved_artifacts / "model"), str(saved_artifacts / "processor"), dtype=jnp.float32, attn_impl="xla"
        )
        emb = inference.embed_beatmap(model, params, processor, beatmap_path)
        assert emb.shape == (model.config.projection_dim,)
        assert abs(np.linalg.norm(emb) - 1.0) < 1e-3
        per_window = inference.embed_beatmap(model, params, processor, beatmap_path, mean_pool=False)
        assert per_window.ndim == 2 and per_window.shape[1] == model.config.projection_dim

    def test_zero_shot_classify(self, saved_artifacts, beatmap_path):
        processor, model, params = inference.load_pretrained(
            str(saved_artifacts / "model"), str(saved_artifacts / "processor"), dtype=jnp.float32, attn_impl="xla"
        )
        candidates = [
            {"mapper": "OliBomby", "mode": "osu"},
            {"mapper": "peppy", "mode": "osu"},
        ]
        scores = inference.zero_shot_classify(model, params, processor, beatmap_path, candidates)
        assert scores.shape[1] == 2
        assert np.isfinite(scores).all()
        # majority vote is well-defined
        preds = scores.argmax(-1)
        assert set(preds) <= {0, 1}

    def test_masked_predict(self, processor, beatmap_path):
        cfg = tiny_cm3p_config().beatmap_config
        bt = processor.beatmap_tokenizer
        cfg.vocab_size = bt.vocab_size
        cfg.audio_token_id = bt.audio_token_id
        model = MaskedLMModule(cfg)
        params = model.init(jax.random.PRNGKey(0), input_ids=jnp.ones((1, 16), jnp.int32))
        positions, true_ids, topk = inference.masked_predict(model, params, processor, beatmap_path)
        assert len(positions) == len(true_ids) == len(topk)
        assert topk.shape[1] == 5
        assert (topk < bt.vocab_size).all()


class TestResolveAttnImpl:
    """CLI entry points downgrade pallas->xla on CPU (a bare pallas_call
    raises 'Only interpret mode is supported on CPU backend')."""

    def test_pallas_downgrades_on_cpu(self):
        from cm3p_tpu.utils.platform import resolve_attn_impl

        # conftest pins the cpu backend, so the downgrade must trigger here
        assert resolve_attn_impl("pallas") == "xla"
        assert resolve_attn_impl("xla") == "xla"
