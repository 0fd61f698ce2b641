"""Mel front-end parity vs transformers.WhisperFeatureExtractor + real audio.

VERDICT.md round-1 gaps #3/#4: our log-mel (cm3p_tpu/audio/mel.py) replaces
the reference's ``WhisperFeatureExtractor`` (processing_cm3p.py:13,284-304)
and was only shape-tested; the WAV decode / resample path had no real-audio
fixture. Here:

* element-wise mel parity vs the installed WhisperFeatureExtractor at both
  hop 160 (processor default) and hop 128 (audio-config value), on sine
  mixes, noise, and near-silence;
* processor-level ``_retrieve_input_features`` parity against the reference's
  chunk/reshape pipeline (processing_cm3p.py:284-304) driven by the real HF
  extractor;
* an actual WAV file on disk driven through load_audio_file -> resample ->
  processor windows -> audio-fused model forward (tiny config, CPU).
"""
import math
import wave
from pathlib import Path

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
from transformers import WhisperFeatureExtractor

from cm3p_tpu.audio.loading import load_audio_file, prepare_waveform, resample
from cm3p_tpu.audio.mel import LogMelExtractor


def _waveforms(n_samples):
    rng = np.random.default_rng(7)
    t = np.arange(n_samples) / 16000.0
    return {
        "sines": (
            0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.25 * np.sin(2 * np.pi * 1873 * t)
            + 0.1 * np.sin(2 * np.pi * 6700 * t)
        ).astype(np.float32),
        "noise": (rng.standard_normal(n_samples) * 0.3).astype(np.float32),
        "quiet": (np.sin(2 * np.pi * 220 * t) * 1e-4).astype(np.float32),
        "impulses": np.where(rng.random(n_samples) < 0.001, 1.0, 0.0).astype(np.float32),
    }


class TestMelParity:
    @pytest.mark.parametrize("hop_length", [160, 128])
    @pytest.mark.parametrize("name", ["sines", "noise", "quiet", "impulses"])
    def test_elementwise_vs_whisper(self, hop_length, name):
        """Whole pipeline: STFT, slaney filterbank, log clamp, affine."""
        wave_len = 480_000  # one 30 s chunk: Whisper pads to exactly this
        waveform = _waveforms(wave_len)[name]
        ref_fe = WhisperFeatureExtractor(
            feature_size=80, sampling_rate=16000, hop_length=hop_length, chunk_length=30, n_fft=400
        )
        ref = ref_fe(
            waveform, sampling_rate=16000, return_tensors="np", padding="max_length"
        )["input_features"][0]
        ours = LogMelExtractor(feature_size=80, sampling_rate=16000, hop_length=hop_length)(waveform)
        assert ours.shape == ref.shape, (ours.shape, ref.shape)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=0)

    @pytest.mark.parametrize("real_len", [256_000, 100_000, 479_599, 479_601, 400, 1, 123_457])
    def test_sparse_mel_bit_exact(self, real_len):
        """total_samples= (implicit zero tail, STFT skipped over the zeros)
        is BIT-identical to materializing the pad — incl. lengths within
        n_fft of the target, which must take the dense fallback."""
        fe = LogMelExtractor(feature_size=80, sampling_rate=16000, hop_length=160)
        waveform = _waveforms(480_000)["noise"][:real_len]
        dense = fe(np.pad(waveform, (0, 480_000 - real_len)))
        sparse = fe(waveform, total_samples=480_000)
        assert sparse.shape == dense.shape
        np.testing.assert_array_equal(sparse, dense)

    def test_torch_stft_backend_matches_scipy(self, monkeypatch):
        """CM3P_TORCH_MEL=1 swaps the STFT backend (MKL batched FFT via
        torch.stft); outputs must stay ~1e-6 of the scipy path (100x inside
        the 1e-4 Whisper budget) and sparse==dense bit-exactness must hold
        WITHIN the backend (same frames, different batch sizes)."""
        import cm3p_tpu.audio.mel as mel_mod

        fe = LogMelExtractor(feature_size=80, sampling_rate=16000, hop_length=160)
        waveform = _waveforms(480_000)["noise"][:256_000]

        monkeypatch.setattr(mel_mod, "_TORCH", False)
        scipy_out = fe(waveform, total_samples=480_000)

        monkeypatch.setenv("CM3P_TORCH_MEL", "1")
        monkeypatch.setattr(mel_mod, "_TORCH", None)
        try:
            torch_sparse = fe(waveform, total_samples=480_000)
            assert mel_mod._TORCH is not False, "torch backend did not engage"
            torch_dense = fe(np.pad(waveform, (0, 480_000 - 256_000)))
        finally:
            monkeypatch.setattr(mel_mod, "_TORCH", None)

        np.testing.assert_allclose(torch_sparse, scipy_out, atol=1e-5, rtol=0)
        np.testing.assert_array_equal(torch_sparse, torch_dense)

    def test_torch_stft_backend_vs_whisper(self, monkeypatch):
        """The torch backend independently meets the Whisper parity budget."""
        import cm3p_tpu.audio.mel as mel_mod

        waveform = _waveforms(480_000)["sines"]
        ref_fe = WhisperFeatureExtractor(
            feature_size=80, sampling_rate=16000, hop_length=160, chunk_length=30, n_fft=400
        )
        ref = ref_fe(
            waveform, sampling_rate=16000, return_tensors="np", padding="max_length"
        )["input_features"][0]

        monkeypatch.setenv("CM3P_TORCH_MEL", "1")
        monkeypatch.setattr(mel_mod, "_TORCH", None)
        try:
            ours = LogMelExtractor(feature_size=80, sampling_rate=16000, hop_length=160)(waveform)
        finally:
            monkeypatch.setattr(mel_mod, "_TORCH", None)
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=0)

    def test_sparse_mel_all_silence(self):
        fe = LogMelExtractor(feature_size=80, sampling_rate=16000, hop_length=160)
        waveform = np.zeros(160_000, dtype=np.float32)
        dense = fe(np.pad(waveform, (0, 320_000)))
        sparse = fe(waveform, total_samples=480_000)
        np.testing.assert_array_equal(sparse, dense)

    def test_processor_chunking_matches_reference_pipeline(self):
        """_retrieve_input_features == WhisperFE + reshape-to-chunks
        (processing_cm3p.py:284-304)."""
        from cm3p_tpu.processing import CM3PProcessor

        waveform = _waveforms(960_000)["sines"]  # two 30 s chunks
        proc = CM3PProcessor()
        max_source_positions = 3000
        ours = proc._retrieve_input_features([(waveform, 960_000)], max_source_positions)

        ref_fe = WhisperFeatureExtractor(
            feature_size=80, sampling_rate=16000, hop_length=160, chunk_length=30, n_fft=400
        )
        # the reference calls the extractor ONCE over the padded waveform with
        # padding=True / truncation=False (CM3PProcessorKwargs audio defaults,
        # processing_cm3p.py:164-173), then reshapes to 30 s chunks
        full = ref_fe(
            waveform, sampling_rate=16000, return_tensors="np", padding=True, truncation=False
        )["input_features"][0]
        ref = full.reshape(80, -1, max_source_positions).swapaxes(0, 1)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=0)


def _write_wav(path, data: np.ndarray, rate: int, channels: int = 2):
    pcm = np.clip(data * 32767.0, -32768, 32767).astype("<i2")
    if channels == 2:
        pcm = np.stack([pcm, pcm], axis=1)
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())


class TestRealAudio:
    def test_wav_decode_resample_roundtrip(self, tmp_path):
        """44.1 kHz stereo WAV -> mono 16 kHz float; tone survives resampling."""
        rate = 44100
        t = np.arange(rate * 3) / rate
        tone = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        path = tmp_path / "tone.wav"
        _write_wav(path, tone, rate)

        out = load_audio_file(path, 16000)
        assert out.dtype == np.float32
        assert abs(len(out) - 48000 * 1) < 200  # ~3 s at 16 kHz
        # the 440 Hz peak must dominate the spectrum after decode+resample
        spec = np.abs(np.fft.rfft(out[: 16000 * 2]))
        peak_hz = np.argmax(spec) / 2.0
        assert abs(peak_hz - 440.0) < 2.0
        # amplitude preserved within a couple percent
        assert abs(out[1000:-1000].max() - 0.5) < 0.02

    def test_speed_augmentation_decodes_shorter(self, tmp_path):
        rate = 22050
        tone = (0.3 * np.sin(2 * np.pi * 330 * np.arange(rate * 2) / rate)).astype(np.float32)
        path = tmp_path / "tone.wav"
        _write_wav(path, tone, rate, channels=1)
        normal = load_audio_file(path, 16000, speed=1.0)
        fast = load_audio_file(path, 16000, speed=1.5)
        # DT decode: same waveform played at 1.5x -> 2/3 the samples
        assert abs(len(fast) - len(normal) / 1.5) < 100

    def test_wav_through_processor_and_audio_fused_model(self, tmp_path):
        """End-to-end: file on disk -> windows + mels -> audio-fused forward."""
        import jax
        import jax.numpy as jnp

        from cm3p_tpu.configs import tiny_cm3p_config
        from cm3p_tpu.models import CM3PModule
        from cm3p_tpu.processing import CM3PProcessor

        beatmap = (
            Path(__file__).parent.parent
            / "resources"
            / "Denkishiki Karen Ongaku Shuudan - Aoki Kotou no Anguis (OliBomby) [Ardens Spes].osu"
        )
        rate = 32000
        n = rate * 40  # 40 s of audio
        rng = np.random.default_rng(3)
        data = (0.2 * np.sin(2 * np.pi * 523 * np.arange(n) / rate) + 0.05 * rng.standard_normal(n)).astype(
            np.float32
        )
        wav = tmp_path / "song.wav"
        _write_wav(wav, data, rate)

        proc = CM3PProcessor()
        out = proc(
            beatmap=str(beatmap),
            audio=str(wav),
            window_length_sec=16.0,
            window_stride_sec=16.0,
            padding="max_length",
            max_length=512,
            truncation=True,
        )
        feats = np.asarray(out["input_features"], dtype=np.float32)
        ids = np.asarray(out["input_ids"])
        # 40 s of audio pads to 60 s -> windows derive from audio length
        assert feats.shape[1] == 80
        assert np.isfinite(feats).all()
        assert (ids == proc.beatmap_tokenizer.audio_token_id).any()

        cfg = tiny_cm3p_config()
        cfg.beatmap_config.vocab_size = proc.beatmap_tokenizer.vocab_size
        vocab = proc.beatmap_tokenizer.get_vocab()
        cfg.beatmap_config.audio_token_id = proc.beatmap_tokenizer.audio_token_id
        cfg.beatmap_config.audio_sos_token_id = vocab[proc.beatmap_tokenizer.audio_bos_token]
        cfg.beatmap_config.audio_eos_token_id = vocab[proc.beatmap_tokenizer.audio_eos_token]
        model = CM3PModule(cfg)
        n_win = min(2, ids.shape[0])
        batch = {
            "input_ids": jnp.asarray(ids[:n_win]),
            "attention_mask": jnp.asarray(np.asarray(out["attention_mask"])[:n_win]),
            "input_features": jnp.asarray(feats[:n_win]),
        }
        params = model.init(jax.random.PRNGKey(0), **batch, return_loss=False)
        emb = model.apply(
            params,
            method=CM3PModule.get_beatmap_features,
            input_ids=batch["input_ids"],
            input_features=batch["input_features"],
            attention_mask=batch["attention_mask"],
            normalize=True,
        )
        emb = np.asarray(emb)
        assert emb.shape[0] == n_win
        assert np.isfinite(emb).all()
        np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-3)
