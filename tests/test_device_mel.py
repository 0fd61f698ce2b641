"""On-device log-mel (audio/device_mel.py): DFT-as-convolution parity.

The PCM wire ships raw waveforms and computes the Whisper log-mel on the
MXU; its dense+tail output must match the host extractor's compact pair
(the 1e-4 Whisper-parity budget governs, tests/test_audio_parity.py) on
the production 16 s-window-in-30 s-chunk shape and the edge cases.
"""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from cm3p_tpu.audio.device_mel import DeviceLogMel  # noqa: E402
from cm3p_tpu.audio.mel import LogMelExtractor  # noqa: E402

SR = 16000
TOTAL = 480000


@pytest.fixture(scope="module")
def extractors():
    fe = LogMelExtractor()
    dm = DeviceLogMel(fe.feature_size, fe.sampling_rate, fe.hop_length, fe.n_fft)
    return fe, jax.jit(dm.__call__)


def run_pair(fe, dm_fn, real: np.ndarray):
    host = fe(real, total_samples=TOTAL)
    f_cap = -(-fe.max_real_frames(len(real) + 1) // 8) * 8 if len(real) else 8
    s_cap = f_cap * fe.hop_length
    assert len(real) <= s_cap - fe.n_fft // 2
    pcm = np.zeros((1, s_cap), np.float32)
    pcm[0, : len(real)] = real
    dense, tail = dm_fn(jnp.asarray(pcm))
    return host, np.asarray(dense)[0], float(np.asarray(tail)[0]), f_cap


class TestDeviceMelParity:
    def test_production_window(self, extractors):
        fe, dm_fn = extractors
        rng = np.random.default_rng(0)
        t = np.arange(SR * 16) / SR
        real = (0.5 * np.sin(2 * np.pi * 220 * t) + 0.1 * rng.standard_normal(SR * 16)).astype(
            np.float32
        )
        host, dense, tail, f_cap = run_pair(fe, dm_fn, real)
        np.testing.assert_allclose(dense, host[:, :f_cap], atol=1e-4)
        # everything past the dense cap is the tail constant
        np.testing.assert_allclose(host[:, f_cap:], tail, atol=1e-4)

    def test_short_window(self, extractors):
        fe, dm_fn = extractors
        real = np.sin(2 * np.pi * 440 * np.arange(SR * 2) / SR).astype(np.float32)
        host, dense, tail, f_cap = run_pair(fe, dm_fn, real)
        np.testing.assert_allclose(dense, host[:, :f_cap], atol=1e-4)
        np.testing.assert_allclose(host[:, f_cap:], tail, atol=1e-4)

    def test_all_zero_window(self, extractors):
        """Silence: the global max IS the tail constant; clamp must match."""
        fe, dm_fn = extractors
        f_cap = 64
        pcm = np.zeros((1, f_cap * fe.hop_length), np.float32)
        dense, tail = dm_fn(jnp.asarray(pcm))
        host = fe(np.zeros(16, np.float32), total_samples=TOTAL)
        np.testing.assert_allclose(np.asarray(dense), host[0, 0], atol=1e-5)
        np.testing.assert_allclose(float(np.asarray(tail)[0]), host[0, -1], atol=1e-5)

    def test_batched_windows_independent(self, extractors):
        """Per-window clamp: a loud window must not shift a quiet one."""
        fe, dm_fn = extractors
        f_cap = 128
        s_cap = f_cap * fe.hop_length
        quiet = 0.001 * np.sin(2 * np.pi * 220 * np.arange(s_cap // 2) / SR).astype(np.float32)
        loud = 0.9 * np.sin(2 * np.pi * 220 * np.arange(s_cap // 2) / SR).astype(np.float32)
        pcm = np.zeros((2, s_cap), np.float32)
        pcm[0, : len(quiet)] = quiet
        pcm[1, : len(loud)] = loud
        dense, tail = dm_fn(jnp.asarray(pcm))
        solo_dense, solo_tail = dm_fn(jnp.asarray(pcm[:1]))
        np.testing.assert_allclose(np.asarray(dense)[0], np.asarray(solo_dense)[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(tail)[0], np.asarray(solo_tail)[0], atol=1e-6)


class TestProcessorPcmWire:
    def test_pcm_wire_emits_padded_windows(self):
        from cm3p_tpu.processing import CM3PProcessor

        proc = CM3PProcessor()
        audio = np.sin(2 * np.pi * 330 * np.arange(SR * 40) / SR).astype(np.float32)
        beatmap = (
            "resources/Denkishiki Karen Ongaku Shuudan - Aoki Kotou no Anguis "
            "(OliBomby) [Ardens Spes].osu"
        )
        out = proc(
            beatmap=beatmap, audio=audio, audio_sampling_rate=SR,
            window_length_sec=16.0, window_stride_sec=16.0, padding="longest",
            pcm_wire=True,
        )
        assert "input_features" not in out
        pcm = np.asarray(out["input_features_pcm"])
        fe = proc.audio_feature_extractor
        f_cap = proc._compact_frames(16.0, SR)
        assert pcm.shape[1] == f_cap * fe.hop_length
        assert pcm.dtype == np.float32
        # ids identical to the mel route (audio token accounting unchanged)
        ref = proc(
            beatmap=beatmap, audio=audio, audio_sampling_rate=SR,
            window_length_sec=16.0, window_stride_sec=16.0, padding="longest",
        )
        np.testing.assert_array_equal(np.asarray(out["input_ids"]), np.asarray(ref["input_ids"]))

    def test_pcm_wire_rejects_full_chunk_windows(self):
        from cm3p_tpu.processing import CM3PProcessor

        proc = CM3PProcessor()
        audio = np.zeros(SR * 35, np.float32)
        beatmap = (
            "resources/Denkishiki Karen Ongaku Shuudan - Aoki Kotou no Anguis "
            "(OliBomby) [Ardens Spes].osu"
        )
        with pytest.raises(ValueError, match="pcm_wire"):
            proc(
                beatmap=beatmap, audio=audio, audio_sampling_rate=SR,
                window_length_sec=30.0, window_stride_sec=30.0, padding="longest",
                pcm_wire=True,
            )
