"""Native audio front end (audio_fast.cpp) parity vs the Python path.

The Python implementation (``loading._load_wav_bytes`` + ``to_mono`` +
``resample``) is the source of truth; the native one-call path must produce
BIT-IDENTICAL float32 output on every supported format, channel count, and
rate pair — including the scipy ``resample_poly`` accumulation order, the
capped-fraction plan, and the true-rate trim/pad.
"""
import io
import math
import struct

import numpy as np
import pytest

from cm3p_tpu.audio import loading
from cm3p_tpu.audio.loading import _load_wav_bytes, _native_wav, resample, to_mono

native_audio = pytest.importorskip("cm3p_tpu.native.audio")
if native_audio._lib() is None:  # pragma: no cover
    pytest.skip("native library unavailable", allow_module_level=True)


def make_wav(data: np.ndarray, rate: int, fmt: str, extra_chunk: bool = False) -> bytes:
    """Build a RIFF/WAVE buffer. ``data``: float in [-1, 1), shape (N,) or (N, C)."""
    if data.ndim == 1:
        data = data[:, None]
    n, ch = data.shape
    if fmt == "pcm16":
        payload = (np.clip(data, -1, 1 - 1e-9) * 32768).astype("<i2").tobytes()
        code, width = 1, 2
    elif fmt == "pcm8":
        payload = ((np.clip(data, -1, 1 - 1e-9) + 1.0) * 128).astype(np.uint8).tobytes()
        code, width = 1, 1
    elif fmt == "pcm24":
        i32 = (np.clip(data, -1, 1 - 1e-9) * 2147483648).astype("<i4")
        b = i32.view(np.uint8).reshape(-1, 4)[:, 1:]  # drop the low byte
        payload = b.tobytes()
        code, width = 1, 3
    elif fmt == "pcm32":
        payload = (np.clip(data, -1, 1 - 1e-9) * 2147483648).astype("<i4").tobytes()
        code, width = 1, 4
    elif fmt == "f32":
        payload = data.astype("<f4").tobytes()
        code, width = 3, 4
    elif fmt == "f64":
        payload = data.astype("<f8").tobytes()
        code, width = 3, 8
    else:
        raise ValueError(fmt)
    block = width * ch
    fmt_chunk = struct.pack("<HHIIHH", code, ch, rate, rate * block, block, width * 8)
    out = io.BytesIO()
    chunks = []
    if extra_chunk:  # a LIST chunk before fmt, and an odd-sized chunk (word alignment)
        chunks.append((b"LIST", b"INFOdata!"))
    chunks.append((b"fmt ", fmt_chunk))
    chunks.append((b"data", payload))
    body = b"WAVE" + b"".join(
        cid + struct.pack("<I", len(c)) + c + (b"\x00" if len(c) % 2 else b"") for cid, c in chunks
    )
    out.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return out.getvalue()


def signal(n, ch, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100.0
    base = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * rng.standard_normal(n)
    if ch == 1:
        return np.clip(base, -0.99, 0.99)
    cols = [np.roll(base, 17 * c) * (1.0 - 0.1 * c) for c in range(ch)]
    return np.clip(np.stack(cols, axis=1), -0.99, 0.99)


def python_path(buf: bytes, target: int) -> np.ndarray:
    data, rate = _load_wav_bytes(buf)
    return resample(to_mono(data), rate, target)


FORMATS = ["pcm16", "pcm8", "pcm24", "pcm32", "f32", "f64"]


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("ch", [1, 2])
def test_decode_parity_no_resample(fmt, ch):
    buf = make_wav(signal(44100, ch), 16000, fmt)  # rate == target: pure decode
    ours = _native_wav(buf, 16000)
    ref = python_path(buf, 16000)
    assert ours is not None
    assert ours.dtype == np.float32 and ref.dtype == np.float32
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("rate", [44100, 48000, 22050, 8000])
@pytest.mark.parametrize("ch", [1, 2])
def test_resample_parity(rate, ch):
    buf = make_wav(signal(rate // 2, ch, seed=rate + ch), rate, "pcm16")
    ours = _native_wav(buf, 16000)
    ref = python_path(buf, 16000)
    assert ours is not None and len(ours) == len(ref)
    np.testing.assert_array_equal(ours, ref)


def test_capped_fraction_parity():
    # DT-speed draw: 16000 / 1.05 -> 15238; Fraction(15238, 44100) caps at
    # limit_denominator(128) — both paths must take the identical plan
    buf = make_wav(signal(44100, 2, seed=3), 44100, "pcm16")
    target = int(16000 // 1.05)
    ours = _native_wav(buf, target)
    ref = python_path(buf, target)
    assert ours is not None and len(ours) == len(ref)
    np.testing.assert_array_equal(ours, ref)


def test_upsample_parity():
    buf = make_wav(signal(8000, 1, seed=5), 8000, "pcm16")
    ours = _native_wav(buf, 16000)
    ref = python_path(buf, 16000)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("ch", [3, 6])
def test_multichannel_downmix(ch):
    # >2 channels: numpy means over the channel axis in float32; tiny
    # accumulation-order differences are possible in principle, so allow
    # one-ulp slack here (stereo/mono above stay bit-exact)
    buf = make_wav(signal(20000, ch, seed=9), 16000, "pcm16")
    ours = _native_wav(buf, 16000)
    ref = python_path(buf, 16000)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-7)


def test_extra_chunks_and_truncated_frame():
    data = signal(10001, 2, seed=11)
    buf = make_wav(data, 44100, "pcm16", extra_chunk=True)
    # chop one byte off the end: a trailing partial frame must be dropped
    buf = buf[:-1]
    # patch the data chunk size down one so the RIFF stays well-formed
    ours = _native_wav(buf, 16000)
    ref = python_path(buf, 16000)
    np.testing.assert_array_equal(ours, ref)


def test_extensible_format():
    # WAVE_FORMAT_EXTENSIBLE wrapping PCM16
    data = signal(30000, 2, seed=13)
    payload = (np.clip(data, -1, 1 - 1e-9) * 32768).astype("<i2").tobytes()
    # cbSize=22, wValidBitsPerSample=16, dwChannelMask, then the sub-format
    # GUID whose first two bytes (fmt[24:26]) carry the real code: 1 = PCM
    fmt_chunk = struct.pack("<HHIIHH", 0xFFFE, 2, 44100, 44100 * 4, 4, 16) + struct.pack("<HHI", 22, 16, 3) + struct.pack("<H", 1) + b"\x00" * 14
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    ours = _native_wav(buf, 16000)
    ref = python_path(buf, 16000)
    assert ours is not None
    np.testing.assert_array_equal(ours, ref)


def test_load_audio_file_uses_native(tmp_path, monkeypatch):
    buf = make_wav(signal(44100, 2, seed=21), 44100, "pcm16")
    p = tmp_path / "t.wav"
    p.write_bytes(buf)
    via_file = loading.load_audio_file(p, 16000)
    monkeypatch.setenv("CM3P_NATIVE_AUDIO", "0")
    via_python = loading.load_audio_file(p, 16000)
    np.testing.assert_array_equal(via_file, via_python)


def test_non_wav_probe_declines():
    assert native_audio.probe(b"OggS" + b"\x00" * 64) is None
    assert _native_wav(b"RIFF\x10\x00\x00\x00JUNK" + b"\x00" * 16, 16000) is None


def test_speed_draw_matches_python(tmp_path):
    buf = make_wav(signal(44100 * 2, 2, seed=33), 44100, "pcm16")
    p = tmp_path / "s.wav"
    p.write_bytes(buf)
    fast = loading.load_audio_file(p, 16000, speed=1.5)
    # expected length: decode at 16000//1.5 then play back at 16000
    target = int(16000 // 1.5)
    assert len(fast) == int(math.ceil(2 * 44100 * target / 44100))
