"""Compact mel wire form (``compact_tail``): the constant zero-pad tail of a
window's log-mel chunk is carried as one scalar instead of ~1400 materialized
frames (audio/mel.py ``logmel_parts``, processor ``CompactFeatures``,
extractor ``extract_packed_compact``). These tests pin the contract: the
reconstructed features — and the embeddings computed from them — are
bit-identical to the full-form path.
"""
import os
import wave
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from cm3p_tpu.audio.mel import LogMelExtractor
from cm3p_tpu.processing import CM3PProcessor
from cm3p_tpu.processing.processor import CompactFeatures

BUNDLED = (
    "resources/Denkishiki Karen Ongaku Shuudan - Aoki Kotou no Anguis (OliBomby) [Ardens Spes].osu"
)


def _waveform(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n, dtype=np.float32) / 16000.0
    return (
        0.4 * np.sin(2 * np.pi * 220.0 * t)
        + 0.1 * rng.standard_normal(n)
    ).astype(np.float32)


class TestLogmelParts:
    def test_reconstruct_bit_exact(self):
        fe = LogMelExtractor()
        wav = _waveform(256_000)  # 16 s window in a 30 s chunk
        full = fe(wav, total_samples=480_000)
        dense, tail, n_out = fe.logmel_parts(wav, 480_000)
        assert n_out == full.shape[1]
        recon = np.concatenate(
            [dense, np.full((dense.shape[0], n_out - dense.shape[1]), tail, np.float32)], axis=1
        )
        np.testing.assert_array_equal(recon, full)

    def test_short_window_reconstruct(self):
        fe = LogMelExtractor()
        wav = _waveform(40_000)  # 2.5 s tail window
        full = fe(wav, total_samples=480_000)
        dense, tail, n_out = fe.logmel_parts(wav, 480_000)
        recon = np.concatenate(
            [dense, np.full((dense.shape[0], n_out - dense.shape[1]), tail, np.float32)], axis=1
        )
        np.testing.assert_array_equal(recon, full)

    def test_empty_waveform_all_tail(self):
        fe = LogMelExtractor()
        dense, tail, n_out = fe.logmel_parts(np.zeros(0, np.float32), 480_000)
        assert dense.shape == (fe.feature_size, 0)
        assert n_out == 3000
        # all-zero chunk: (max(log10(1e-10), ...-8) + 4) / 4, float32 semantics
        zval = np.log10(np.float32(1e-10))
        assert tail == (np.maximum(zval, zval - np.float32(8.0)) + np.float32(4.0)) / np.float32(4.0)

    def test_max_real_frames_bounds_dense(self):
        fe = LogMelExtractor()
        for n in (1, 159, 160, 255_999, 256_000, 256_001):
            dense, _, _ = fe.logmel_parts(_waveform(n, seed=n), 480_000)
            assert dense.shape[1] <= fe.max_real_frames(n)


class TestProcessorCompact:
    def test_compact_matches_full(self):
        proc = CM3PProcessor()
        wav = _waveform(40 * 16000, seed=3)  # ~40 s -> 3 windows at 16 s
        kwargs = dict(
            beatmap=BUNDLED, audio=wav, audio_sampling_rate=16000,
            window_length_sec=16.0, window_stride_sec=16.0,
        )
        full = proc(**kwargs)
        compact = proc(**kwargs, compact_tail=True)
        np.testing.assert_array_equal(
            np.asarray(full["input_ids"]), np.asarray(compact["input_ids"])
        )
        dense = np.asarray(compact["input_features"])
        tails = np.asarray(compact["input_features_tail"])
        full_feats = np.asarray(full["input_features"])
        assert dense.shape[0] == full_feats.shape[0] == len(tails)
        f_cap = dense.shape[2]
        assert f_cap < full_feats.shape[2]
        recon = np.concatenate(
            [
                dense,
                np.broadcast_to(
                    tails[:, None, None],
                    (dense.shape[0], dense.shape[1], full_feats.shape[2] - f_cap),
                ),
            ],
            axis=2,
        )
        np.testing.assert_array_equal(recon, full_feats)

    def test_compact_rejects_full_chunk_windows(self):
        """A 30 s window has no zero tail — compact must refuse loudly, not
        emit wrong shapes."""
        proc = CM3PProcessor()
        wav = _waveform(35 * 16000, seed=4)
        with pytest.raises(ValueError, match="compact_tail"):
            proc(
                beatmap=BUNDLED, audio=wav, audio_sampling_rate=16000,
                window_length_sec=30.0, window_stride_sec=30.0, compact_tail=True,
            )

    def test_window_audio_cache_keyed_on_compact(self):
        """The per-track features cache must not serve full-form entries to a
        compact caller (the flag is part of the key)."""
        proc = CM3PProcessor()
        wav = _waveform(20 * 16000, seed=5)
        cache: dict = {}
        kwargs = dict(
            beatmap=BUNDLED, audio=wav, audio_sampling_rate=16000,
            window_length_sec=16.0, window_stride_sec=16.0,
            audio_features_cache=cache,
        )
        full = proc(**kwargs)
        compact = proc(**kwargs, compact_tail=True)
        assert len(cache) == 2
        kinds = {isinstance(v[1], CompactFeatures) for v in cache.values()}
        assert kinds == {True, False}
        assert np.asarray(full["input_features"]).ndim == 3
        assert "input_features_tail" in compact


class TestExtractorCompact:
    @pytest.fixture()
    def fixture_dir(self, tmp_path):
        osu_text = Path(BUNDLED).read_text(encoding="utf-8")
        osu_text = osu_text.replace("AudioFilename: audio.mp3", "AudioFilename: audio.wav")
        (tmp_path / "map.osu").write_text(osu_text, encoding="utf-8")
        rate, seconds = 16000, 40.0
        n = int(rate * seconds)
        data = (_waveform(n, seed=7) * 32767 * 0.5).astype(np.int16)
        with wave.open(str(tmp_path / "audio.wav"), "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(data.tobytes())
        return tmp_path

    def _extract(self, fixture_dir, tag, compact: bool):
        import extract_beatmap_embeddings as ex

        out = fixture_dir / f"emb_{tag}.parquet"
        old = os.environ.get("CM3P_COMPACT_MEL")
        os.environ["CM3P_COMPACT_MEL"] = "1" if compact else "0"
        try:
            ex.main(
                [
                    "--beatmap-files", str(fixture_dir / "map.osu"),
                    "--output", str(out),
                    "--tiny-model", "--cpu",
                    "--max-length", "512",
                    "--window-length", "16",
                    "--batch-size", "8",
                    "--no-mesh",
                ]
            )
        finally:
            if old is None:
                os.environ.pop("CM3P_COMPACT_MEL", None)
            else:
                os.environ["CM3P_COMPACT_MEL"] = old
        df = pd.read_parquet(out)
        return np.stack([np.asarray(e, np.float32) for e in df["embedding"]])

    def test_packed_compact_embeddings_identical(self, fixture_dir):
        full = self._extract(fixture_dir, "full", compact=False)
        compact = self._extract(fixture_dir, "compact", compact=True)
        assert np.isfinite(full).all()
        np.testing.assert_array_equal(compact, full)

    def test_eager_flush_quantum_identical(self, fixture_dir):
        """--flush-rows 1 forces one device flush per packed row (the eager
        overlap path); embeddings must match the single-flush job exactly —
        flush boundaries only change dispatch timing, never values."""
        import extract_beatmap_embeddings as ex

        outs = {}
        for tag, flush_rows in (("one_flush", 64), ("eager", 1)):
            out = fixture_dir / f"emb_fr_{tag}.parquet"
            ex.main(
                [
                    "--beatmap-files", str(fixture_dir / "map.osu"),
                    "--output", str(out),
                    "--tiny-model", "--cpu",
                    "--max-length", "512",
                    "--window-length", "16",
                    "--batch-size", "8",
                    "--flush-rows", str(flush_rows),
                    "--no-mesh",
                ]
            )
            df = pd.read_parquet(out)
            outs[tag] = np.stack([np.asarray(e, np.float32) for e in df["embedding"]])
        assert np.isfinite(outs["one_flush"]).all()
        np.testing.assert_array_equal(outs["eager"], outs["one_flush"])

    def test_int8_mel_wire_close_to_bf16(self, fixture_dir):
        """--mel-wire int8 (per-window symmetric scale, on-device dequant)
        must track the bf16 wire within tight cosine on real audio+map."""
        import extract_beatmap_embeddings as ex

        outs = {}
        for tag, extra in (("bf16", []), ("int8", ["--mel-wire", "int8"])):
            out = fixture_dir / f"emb_mw_{tag}.parquet"
            ex.main(
                [
                    "--beatmap-files", str(fixture_dir / "map.osu"),
                    "--output", str(out),
                    "--tiny-model", "--cpu",
                    "--max-length", "512",
                    "--window-length", "16",
                    "--batch-size", "8",
                    "--no-mesh",
                    *extra,
                ]
            )
            df = pd.read_parquet(out)
            outs[tag] = np.stack([np.asarray(e, np.float32) for e in df["embedding"]])
        a, b = outs["bf16"], outs["int8"]
        assert np.isfinite(b).all()
        cos = np.sum(a * b, axis=1) / (
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
        )
        assert cos.min() > 0.999, cos.min()

    def test_pcm_mel_wire_close_to_bf16(self, fixture_dir):
        """--mel-wire pcm (raw waveforms + on-device DFT-conv log-mel) must
        track the bf16 mel wire within tight cosine on real audio+map."""
        import extract_beatmap_embeddings as ex

        outs = {}
        for tag, extra in (("bf16", []), ("pcm", ["--mel-wire", "pcm"])):
            out = fixture_dir / f"emb_pw_{tag}.parquet"
            ex.main(
                [
                    "--beatmap-files", str(fixture_dir / "map.osu"),
                    "--output", str(out),
                    "--tiny-model", "--cpu",
                    "--max-length", "512",
                    "--window-length", "16",
                    "--batch-size", "8",
                    "--no-mesh",
                    *extra,
                ]
            )
            df = pd.read_parquet(out)
            outs[tag] = np.stack([np.asarray(e, np.float32) for e in df["embedding"]])
        a, b = outs["bf16"], outs["pcm"]
        assert np.isfinite(b).all()
        cos = np.sum(a * b, axis=1) / (
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
        )
        assert cos.min() > 0.999, cos.min()
