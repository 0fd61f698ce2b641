"""Audio loading and resampling without external audio stacks.

Replaces the reference's ffmpeg/soxr path (``utils/data_utils.py:12-32``,
``processing_cm3p.py:306-360``): WAV files decode natively via the stdlib;
other formats use the ``ffmpeg`` binary when present. Resampling is
polyphase (scipy) — same role as soxr-HQ.
"""
from __future__ import annotations

import math
import shutil
import subprocess
import wave
from fractions import Fraction
from os import PathLike
from typing import Optional, Union

import numpy as np


def resample(audio: np.ndarray, orig_rate: int, target_rate: int) -> np.ndarray:
    """High-quality polyphase resampling to ``target_rate``."""
    if orig_rate == target_rate:
        return np.asarray(audio, dtype=np.float32)
    from scipy.signal import resample_poly

    frac = Fraction(target_rate, orig_rate).limit_denominator(10_000)
    if max(frac.numerator, frac.denominator) > 256:
        # Exact huge rationals (e.g. 7619/8000 for a 1.05x DT draw) make
        # resample_poly 2-4x slower than a capped approximation for no
        # audible benefit: q <= 128 bounds the playback-rate error by
        # 1/(128*129) ~ 6e-5, far below mel-bin resolution. The output is
        # trimmed/padded to the TRUE expected length below either way.
        frac = Fraction(target_rate, orig_rate).limit_denominator(128)
    out = resample_poly(np.asarray(audio, dtype=np.float32), frac.numerator, frac.denominator)
    # fix off-by-a-sample lengths from the rational approximation
    expected = int(math.ceil(len(audio) * target_rate / orig_rate))
    if len(out) > expected:
        out = out[:expected]
    elif len(out) < expected:
        out = np.pad(out, (0, expected - len(out)))
    return out.astype(np.float32)


def to_mono(audio: np.ndarray) -> np.ndarray:
    audio = np.asarray(audio)
    if audio.ndim == 2:
        # average over the smaller (channel) axis
        axis = 0 if audio.shape[0] <= audio.shape[1] else 1
        audio = audio.mean(axis=axis)
    return audio


def _load_wav(path: Union[str, PathLike]) -> tuple[np.ndarray, int]:
    with wave.open(str(path), "rb") as wf:
        rate = wf.getframerate()
        n_channels = wf.getnchannels()
        sampwidth = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported WAV sample width: {sampwidth}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, rate


def _load_via_ffmpeg(path: Union[str, PathLike], sampling_rate: int) -> np.ndarray:
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            f"Cannot decode {path}: ffmpeg binary not found and the format is not WAV. "
            "Install ffmpeg or provide raw waveform arrays."
        )
    cmd = [
        ffmpeg,
        "-i",
        str(path),
        "-ac",
        "1",
        "-ar",
        str(sampling_rate),
        "-f",
        "f32le",
        "-hide_banner",
        "-loglevel",
        "error",
        "pipe:1",
    ]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    return np.frombuffer(out, dtype=np.float32).copy()


def load_audio_file(path: Union[str, PathLike], sampling_rate: int, speed: float = 1.0) -> np.ndarray:
    """Decode an audio file to a mono float32 waveform at ``sampling_rate``.

    ``speed`` > 1 implements DT augmentation by decoding at a proportionally
    lower rate and playing it back at the target rate (data_utils.py:12-32).
    """
    target = int(sampling_rate // speed)
    path = str(path)
    if path.lower().endswith(".wav"):
        data, rate = _load_wav(path)
        return resample(to_mono(data), rate, target)
    return _load_via_ffmpeg(path, target)


def prepare_waveform(
    audio: np.ndarray,
    audio_sampling_rate: Optional[int],
    sampling_rate: int,
) -> np.ndarray:
    """Mono-ize and resample an in-memory waveform to the model rate."""
    audio = to_mono(np.asarray(audio))
    if audio_sampling_rate is not None and audio_sampling_rate != sampling_rate:
        audio = resample(audio, audio_sampling_rate, sampling_rate)
    return audio.astype(np.float32)
