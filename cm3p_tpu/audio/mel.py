"""Whisper-compatible log-mel spectrogram front-end in pure numpy.

Replaces the reference's ``transformers.WhisperFeatureExtractor``
(``processing_cm3p.py:13,292``): Hann-window STFT (center=True, reflect
padding), power-2 spectrum, slaney-scale/slaney-norm mel filterbank,
log10 with the Whisper dynamic-range clamp ``max(log, max-8)`` and the
``(x + 4) / 4`` affine, dropping the trailing frame.

Runs host-side in data workers; the arrays it emits feed the TPU audio tower.
"""
from __future__ import annotations


import numpy as np

from ..utils.io import JsonConfigMixin


def hertz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    log_region = freq >= min_log_hertz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hertz) * logstep, mels)
    return mels


def mel_to_hertz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    log_region = mels >= min_log_mel
    freq = np.where(log_region, min_log_hertz * np.exp(logstep * (mels - min_log_mel)), freq)
    return freq


def mel_filter_bank(
    num_frequency_bins: int,
    num_mel_filters: int,
    min_frequency: float,
    max_frequency: float,
    sampling_rate: int,
) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filterbank (freq_bins, mels)."""
    fft_freqs = np.linspace(0.0, sampling_rate / 2.0, num_frequency_bins)
    mel_min = hertz_to_mel_slaney(np.array(min_frequency))
    mel_max = hertz_to_mel_slaney(np.array(max_frequency))
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = mel_to_hertz_slaney(mel_freqs)

    filter_diff = np.diff(filter_freqs)
    slopes = np.expand_dims(filter_freqs, 0) - np.expand_dims(fft_freqs, 1)
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    # slaney normalization: scale each filter by 2 / bandwidth
    enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
    fb *= np.expand_dims(enorm, 0)
    return fb


class LogMelExtractor(JsonConfigMixin):
    """Compute Whisper-style log-mel features: waveform -> (n_mels, frames)."""

    config_name = "preprocessor_config.json"

    def __init__(
        self,
        feature_size: int = 80,
        sampling_rate: int = 16000,
        hop_length: int = 160,
        chunk_length: int = 30,
        n_fft: int = 400,
        padding_value: float = 0.0,
        dither: float = 0.0,
        return_attention_mask: bool = False,
        **_unused,
    ):
        self.feature_size = feature_size
        self.sampling_rate = sampling_rate
        self.hop_length = hop_length
        self.chunk_length = chunk_length
        self.n_fft = n_fft
        self.padding_value = padding_value
        self.dither = dither
        self.return_attention_mask = return_attention_mask

        # filterbank/window are designed in float64 for accuracy, then cast:
        # the hot path (pad, frame, FFT, power, filter matmul) runs float32 —
        # scipy.fft computes complex64 natively (numpy's float32 FFT path is
        # ~11x slower than float64 on this host; scipy's is at parity), and
        # the result stays within ~1e-6 of the float64 WhisperFeatureExtractor
        # output (parity asserted at 1e-4, tests/test_audio_parity.py).
        self.window = np.hanning(n_fft + 1)[:-1].astype(np.float32)  # periodic hann
        self.mel_filters = mel_filter_bank(
            num_frequency_bins=1 + n_fft // 2,
            num_mel_filters=feature_size,
            min_frequency=0.0,
            max_frequency=8000.0,
            sampling_rate=sampling_rate,
        )
        self._filters32 = self.mel_filters.astype(np.float32)

    def get_config(self) -> dict:
        return {
            "feature_size": self.feature_size,
            "sampling_rate": self.sampling_rate,
            "hop_length": self.hop_length,
            "chunk_length": self.chunk_length,
            "n_fft": self.n_fft,
            "padding_value": self.padding_value,
            "dither": self.dither,
            "return_attention_mask": self.return_attention_mask,
        }

    def _stft_power(self, waveform: np.ndarray) -> np.ndarray:
        """Centered power spectrogram, shape (num_frames, 1 + n_fft//2)."""
        from scipy.fft import rfft  # float32-native (numpy's is pathologically slow)

        pad = self.n_fft // 2
        waveform = np.pad(np.asarray(waveform, dtype=np.float32), (pad, pad), mode="reflect")
        num_frames = 1 + (len(waveform) - self.n_fft) // self.hop_length
        # strided frame view, then batched rFFT
        stride = waveform.strides[0]
        frames = np.lib.stride_tricks.as_strided(
            waveform,
            shape=(num_frames, self.n_fft),
            strides=(self.hop_length * stride, stride),
            writeable=False,
        )
        spec = rfft(frames * self.window, axis=1)
        return spec.real**2 + spec.imag**2

    def __call__(self, waveform: np.ndarray) -> np.ndarray:
        """waveform (T,) float -> log-mel (feature_size, T // hop_length)."""
        if self.dither:
            waveform = waveform + self.dither * np.random.randn(*waveform.shape)
        power = self._stft_power(np.asarray(waveform))
        mel = (power @ self._filters32).T
        log_spec = np.log10(np.maximum(mel, np.float32(1e-10)))
        log_spec = log_spec[:, :-1]  # Whisper drops the final frame
        log_spec = np.maximum(log_spec, log_spec.max() - np.float32(8.0))
        log_spec += 4.0
        log_spec /= 4.0
        return log_spec
