"""Whisper log-mel on the TPU: DFT-as-convolution on the MXU.

The host mel is ~3.3 ms/window of loader CPU (the largest loader component
in the warm e2e breakdown, BASELINE r10) — but a log-mel spectrogram is
matmul-shaped: a Hann-windowed 400-point rFFT of hop-160 frames is exactly
a stride-160 convolution whose 402 output channels are the windowed DFT
basis (cos/sin pairs), and the mel filterbank + log + clamp are a matmul
and elementwise tail. This module computes the SAME compact form the host
emits (dense frames + the constant zero-tail value, audio/mel.py
``logmel_parts``) from raw PCM shipped over the wire, so the result feeds
the existing ``extract_packed_compact`` reconstruction unchanged.

Wire trade-off (why this is a gate, not the default): PCM fp32 is ~4x the
bytes of the compact bf16 mel (256 k samples vs 80x~810 frames per 16 s
window), so on relay-attached or PCIe-starved hosts the transfer can cost
more than the host mel it saves; on a real TPU-VM (GB/s host link, many
loader cores elsewhere) it removes the biggest loader component entirely.
Measured protocol: tools/bench_mel_wire.py --pcm.

Parity: same float32 math to ~1e-5 (conv accumulates in fp32; scipy rFFT
differs only in summation order) — asserted at the embedding level and
against the host mel in tests/test_device_mel.py.
"""
from __future__ import annotations

import math
from functools import partial

import numpy as np

from .mel import mel_filter_bank


class DeviceLogMel:
    """PCM (W, S) -> (dense (W, n_mels, f_cap), tail (W,)) on device.

    ``S`` must be ``f_cap * hop_length`` (the extractor ships windows
    zero-padded to that length); ``f_cap`` is the host's
    ``max_real_frames`` for the window, so dense/tail splits match the host
    compact wire exactly.
    """

    def __init__(
        self,
        feature_size: int = 80,
        sampling_rate: int = 16000,
        hop_length: int = 160,
        n_fft: int = 400,
    ):
        self.feature_size = feature_size
        self.sampling_rate = sampling_rate
        self.hop_length = hop_length
        self.n_fft = n_fft

        # windowed DFT basis as conv filters: out channel k < bins is the
        # cos (real) component, k >= bins the sin (imag); power needs only
        # real^2 + imag^2 so signs are irrelevant
        bins = 1 + n_fft // 2
        window = np.hanning(n_fft + 1)[:-1].astype(np.float64)  # periodic hann
        t = np.arange(n_fft, dtype=np.float64)
        k = np.arange(bins, dtype=np.float64)[:, None]
        cos_b = np.cos(2.0 * math.pi * k * t[None, :] / n_fft) * window[None, :]
        sin_b = np.sin(2.0 * math.pi * k * t[None, :] / n_fft) * window[None, :]
        # conv filter layout (spatial, in_ch, out_ch)
        self._dft = np.concatenate([cos_b, sin_b], axis=0).T[:, None, :].astype(np.float32)
        self._bins = bins
        self._mel = mel_filter_bank(
            num_frequency_bins=bins,
            num_mel_filters=feature_size,
            min_frequency=0.0,
            max_frequency=8000.0,
            sampling_rate=sampling_rate,
        ).astype(np.float32)
        # the zero-tail constant: log10(1e-10) pre-clamp (audio/mel.py)
        self._tail_raw = float(np.log10(1e-10))

    def __call__(self, pcm):
        """Compute the compact log-mel pair with jax ops (call inside jit)."""
        import jax.numpy as jnp
        from jax import lax

        w, s = pcm.shape
        hop, n_fft = self.hop_length, self.n_fft
        f_cap = s // hop
        pad = n_fft // 2
        # host parity: reflect-pad the LEFT chunk edge; the right side of
        # the dense region is mid-chunk zeros (the zero tail), so plain
        # zero padding is exact there
        x = jnp.pad(pcm.astype(jnp.float32), ((0, 0), (pad, 0)), mode="reflect")
        x = jnp.pad(x, ((0, 0), (0, pad)))
        # frames f_cap + 1 would include the dropped final frame; computing
        # exactly f_cap output frames needs input length f_cap*hop + n_fft-hop
        need = f_cap * hop + (n_fft - hop)
        x = x[:, :need]
        spec = lax.conv_general_dilated(
            x[:, :, None],
            jnp.asarray(self._dft),
            window_strides=(hop,),
            padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=jnp.float32,
        )  # (W, f_cap, 2*bins)
        power = spec[..., : self._bins] ** 2 + spec[..., self._bins:] ** 2
        mel = jnp.einsum(
            "wfb,bm->wmf", power, jnp.asarray(self._mel), preferred_element_type=jnp.float32
        )  # (W, n_mels, f_cap)
        log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
        # Whisper clamp: global max over ALL frames of the 30 s chunk — the
        # zero tail contributes log10(1e-10), never the max for real audio,
        # but guard the all-zero window case exactly like the host
        gmax = jnp.maximum(jnp.max(log_spec, axis=(1, 2)), self._tail_raw)
        floor = (gmax - 8.0)[:, None, None]
        dense = (jnp.maximum(log_spec, floor) + 4.0) / 4.0
        tail = (jnp.maximum(jnp.asarray(self._tail_raw), gmax - 8.0) + 4.0) / 4.0
        return dense, tail
