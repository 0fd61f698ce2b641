"""Processor tests: windowing, audio-token accounting, variations, save/load."""
import numpy as np
import pytest

from cm3p_tpu.audio import LogMelExtractor
from cm3p_tpu.processing import CM3PProcessor, get_metadata
from cm3p_tpu.tokenize import MetadataTokenizer


@pytest.fixture(scope="module")
def processor() -> CM3PProcessor:
    return CM3PProcessor(
        metadata_tokenizer=MetadataTokenizer(
            modes={0: "osu", 1: "taiko", 2: "fruits", 3: "mania"},
            mappers={0: "OliBomby", 1: "Cookiezi", 2: "peppy"},
            statuses={1: "ranked", -2: "graveyard"},
            tags={1: {"name": "jump"}, 2: {"name": "stream"}},
        ),
        rng=np.random.default_rng(1234),
    )


class TestMel:
    def test_frame_count_matches_whisper_convention(self):
        fe = LogMelExtractor()
        wav = np.random.default_rng(0).standard_normal(480000).astype(np.float32)
        mel = fe(wav)
        assert mel.shape == (80, 3000)  # 480000 / 160 frames after drop-last

    def test_normalization_range(self):
        fe = LogMelExtractor()
        wav = 0.5 * np.sin(np.linspace(0, 2000 * np.pi, 160000)).astype(np.float32)
        mel = fe(wav)
        # Whisper affine keeps everything in (-2, +2] after max-8 clamp
        assert mel.max() <= 2.0 + 1e-5
        assert mel.min() >= (mel.max() - 8.0 - 1e-5 + 4.0) / 4.0 - 1.0


class TestProcessor:
    def test_windowing_without_audio(self, processor, beatmap_path):
        out = processor(beatmap=beatmap_path)
        # song ~255.5s, default 30s windows → 9 windows
        assert out["input_ids"].shape[0] == 9
        assert out["attention_mask"].shape == out["input_ids"].shape
        assert "input_features" not in out

    def test_windowing_with_audio(self, processor, beatmap_path):
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(16000 * 65) * 0.05).astype(np.float32)
        out = processor(beatmap=beatmap_path, audio=audio, audio_sampling_rate=16000)
        # song length from audio = 65s → windows at 0/30/60 → 3 windows
        assert out["input_ids"].shape[0] == 3
        assert out["input_features"].shape == (3, 80, 3000)
        # each window: 480000 samples → 3000 frames → 375 audio tokens
        audio_id = processor.beatmap_tokenizer.audio_token_id
        num_audio = (out["input_ids"] == audio_id).sum(axis=1)
        assert (num_audio == 375).all()

    def test_audio_features_cache_identical_and_skips_mel(self, processor, beatmap_path, monkeypatch):
        """audio_features_cache: second call with the same waveform reuses
        the windowed mel + token counts (the difficulty-sharing fast path)
        and produces byte-identical output."""
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(16000 * 65) * 0.05).astype(np.float32)
        base = processor(beatmap=beatmap_path, audio=audio, audio_sampling_rate=16000)

        calls = {"n": 0}
        orig = type(processor.audio_feature_extractor).__call__

        def counting(self_, wav, *args, **kwargs):
            calls["n"] += 1
            return orig(self_, wav, *args, **kwargs)

        monkeypatch.setattr(type(processor.audio_feature_extractor), "__call__", counting)
        cache: dict = {}
        first = processor(
            beatmap=beatmap_path, audio=audio, audio_sampling_rate=16000,
            audio_features_cache=cache,
        )
        mel_calls_first = calls["n"]
        assert mel_calls_first > 0 and len(cache) == 1
        second = processor(
            beatmap=beatmap_path, audio=audio, audio_sampling_rate=16000,
            audio_features_cache=cache,
        )
        assert calls["n"] == mel_calls_first  # no new mel computation
        for key in ("input_ids", "attention_mask", "input_features"):
            np.testing.assert_array_equal(np.asarray(first[key]), np.asarray(base[key]))
            np.testing.assert_array_equal(np.asarray(second[key]), np.asarray(base[key]))

    def test_multiply_and_populate_metadata(self, processor, beatmap_path):
        out = processor(
            beatmap=beatmap_path,
            metadata={"difficulty": 5.0, "year": 2020},
            multiply_metadata=True,
            populate_metadata=True,
        )
        assert out["metadata_ids"].shape[0] == out["input_ids"].shape[0]
        # populated metadata carries song_length → token differs from UNK
        unk_id = processor.metadata_tokenizer.convert_tokens_to_ids("[SONG_LENGTH_UNK]")
        assert not (out["metadata_ids"] == unk_id).any()

    def test_metadata_variations_shape_and_classes(self, processor, beatmap_path):
        out = processor(
            beatmap=beatmap_path,
            metadata={"difficulty": 5.0, "year": 2020, "status": "ranked", "mapper": "peppy", "tags": ["jump"]},
            multiply_metadata=True,
            populate_metadata=True,
            metadata_variations=8,
        )
        n = out["input_ids"].shape[0]
        assert out["metadata_ids"].shape[:2] == (n, 8)
        assert out["metadata_variation_classes"].shape == (n, 8)
        assert (out["metadata_variation_classes"][:, 0] == 0).all()

    def test_max_length_padding_static_shapes(self, processor, beatmap_path):
        out = processor(beatmap=beatmap_path, padding="max_length", max_length=4000)
        assert out["input_ids"].shape[1] == 4000

    def test_window_length_override(self, processor, beatmap_path):
        out = processor(beatmap=beatmap_path, window_length_sec=16.0, window_stride_sec=16.0)
        assert out["input_ids"].shape[0] == 16  # ceil((255.5-1)/16)

    def test_metadata_only(self, processor):
        out = processor(metadata={"year": 2015})
        assert out["input_ids"].shape[0] == 1

    def test_save_load_round_trip(self, processor, tmp_path, beatmap_path):
        processor.save_pretrained(tmp_path)
        restored = CM3PProcessor.from_pretrained(tmp_path)
        a = processor(beatmap=beatmap_path)
        b = restored(beatmap=beatmap_path)
        np.testing.assert_array_equal(a["input_ids"], b["input_ids"])
        assert restored.metadata_tokenizer.get_vocab() == processor.metadata_tokenizer.get_vocab()

    def test_get_metadata_from_beatmap(self, beatmap_path):
        from cm3p_tpu.beatmap import load_beatmap

        bm = load_beatmap(beatmap_path)
        m = get_metadata(beatmap=bm)
        assert m["mode"] == 0
        assert m["cs"] == 4.0
        assert m["hitsounded"] is True
        assert m["global_sv"] == 1.4
        assert abs(m["song_length"] - 255.479) < 0.01
