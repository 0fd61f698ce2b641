"""ctypes bindings for the native audio front end (audio_fast.cpp).

One library call decodes a WAV buffer, downmixes to mono, and polyphase-
resamples — bit-identical to the Python path in ``cm3p_tpu/audio/loading.py``
(``_load_wav`` + ``to_mono`` + ``resample``), which stays the source of truth
and the fallback. The resample *plan* (fraction capping, FIR design, expected
output length) lives in ``loading.py``; this module only marshals it.
"""
from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from . import _load_lib

_u8p = ctypes.POINTER(ctypes.c_uint8)
_f32p = ctypes.POINTER(ctypes.c_float)
_i64p = ctypes.POINTER(ctypes.c_int64)
_DECLARED = False


def _lib():
    global _DECLARED
    lib = _load_lib()
    if lib is None:
        return None
    if not _DECLARED:
        try:
            lib.ct_wav_probe.argtypes = [_u8p, ctypes.c_int64, _i64p]
            lib.ct_wav_probe.restype = ctypes.c_int32
            lib.ct_wav_decode_resample.argtypes = [
                _u8p, ctypes.c_int64, _f32p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, _f32p, ctypes.c_int64,
            ]
            lib.ct_wav_decode_resample.restype = ctypes.c_int32
        except AttributeError:
            return None
        _DECLARED = True
    return lib


def probe(buf: bytes) -> Optional[tuple[int, int, int]]:
    """WAV header probe -> (rate, frames, channels), or None if the buffer
    is not a WAV the native decoder supports (caller falls back)."""
    lib = _lib()
    if lib is None:
        return None
    raw = np.frombuffer(buf, np.uint8)
    info = np.zeros(3, np.int64)
    rc = lib.ct_wav_probe(raw.ctypes.data_as(_u8p), len(raw), info.ctypes.data_as(_i64p))
    if rc != 0:
        return None
    return int(info[0]), int(info[1]), int(info[2])


def decode(buf: bytes, up: int, down: int, h_scaled: Optional[np.ndarray], expected: int) -> Optional[np.ndarray]:
    """Decode + downmix + resample to ``expected`` float32 samples.

    ``h_scaled``: the resample_poly FIR already multiplied by ``up``
    (float32); pass None with up=down=1 for a pure decode.
    """
    lib = _lib()
    if lib is None:
        return None
    raw = np.frombuffer(buf, np.uint8)
    out = np.empty(expected, np.float32)
    if h_scaled is None:
        hp, hl = None, 0
    else:
        h_scaled = np.ascontiguousarray(h_scaled, np.float32)
        hp, hl = h_scaled.ctypes.data_as(_f32p), len(h_scaled)
    rc = lib.ct_wav_decode_resample(
        raw.ctypes.data_as(_u8p), len(raw), hp, hl, up, down,
        out.ctypes.data_as(_f32p), expected,
    )
    if rc != 0:
        return None
    return out
