"""Native (C++) beatmap front end vs the Python path — bit parity.

beatmap_fast.cpp re-implements .osu parsing, event lowering, and window
tokenization (the host data-pipeline hot path, 22x the python speed). The
python implementation is the source of truth: these tests assert
field-identical Group streams, bit-identical window ids, identical
end-to-end processor outputs, and the fallback contract (any unsupported
input must route to the python path, never error).
"""
from pathlib import Path

import numpy as np
import pytest

from cm3p_tpu.beatmap import BeatmapEventParser, load_beatmap
from cm3p_tpu.beatmap.parser import get_song_length
from cm3p_tpu.native import beatmap as native_beatmap
from cm3p_tpu.tokenize import BeatmapTokenizer
from cm3p_tpu.tokenize.beatmap_tokenizer import pack_sequences

if not native_beatmap.available():  # pragma: no cover
    pytest.skip("native beatmap library unavailable", allow_module_level=True)

_HERE = Path(__file__).parent
FIXTURES = [
    str(_HERE / "resources" / "taiko_fixture.osu"),
    str(_HERE / "resources" / "mania_fixture.osu"),
    str(_HERE / "resources" / "std_sliders_fixture.osu"),
    str(_HERE / "resources" / "catch_fixture.osu"),
    str(
        _HERE.parent
        / "resources"
        / "Denkishiki Karen Ongaku Shuudan - Aoki Kotou no Anguis (OliBomby) [Ardens Spes].osu"
    ),
]

PARSER_VARIANTS = [
    dict(),
    dict(slider_version=1),
    dict(add_hitsounds=False, add_distances=False),
    dict(add_snapping=False, add_kiai=False, add_sv=False),
    dict(mania_bpm_normalized_scroll_speed=False),
    dict(emit_mania_column=True),
    dict(add_timing_points=False),
    dict(add_positions=False),
]

GROUP_FIELDS = (
    "event_type", "time", "has_time", "snapping", "distance", "x", "y",
    "mania_column", "new_combo", "hitsounds", "samplesets", "additions",
    "volumes", "scroll_speed",
)


def _native_groups(fixture, parser, speed, song_length):
    nb = native_beatmap.NativeBeatmap.from_path(fixture)
    return nb.parse_events(parser, speed, song_length).to_groups()


class TestGroupParity:
    @pytest.mark.parametrize("fixture", FIXTURES)
    @pytest.mark.parametrize("variant", range(len(PARSER_VARIANTS)))
    def test_groups_identical(self, fixture, variant):
        parser = BeatmapEventParser(**PARSER_VARIANTS[variant])
        bm = load_beatmap(fixture)
        song_length = get_song_length(None, None, bm)
        py = parser.parse_beatmap(bm, song_length=song_length)
        ct = _native_groups(fixture, parser, 1.0, song_length)
        assert len(py) == len(ct)
        for i, (a, b) in enumerate(zip(py, ct)):
            for f in GROUP_FIELDS:
                assert getattr(a, f) == getattr(b, f), (
                    f"{Path(fixture).name}#{variant} group {i} field {f}: "
                    f"py={getattr(a, f)!r} ct={getattr(b, f)!r}"
                )

    @pytest.mark.parametrize("fixture", FIXTURES)
    @pytest.mark.parametrize("speed", [1.5, 0.75])
    def test_speed_scaling_identical(self, fixture, speed):
        parser = BeatmapEventParser()
        bm = load_beatmap(fixture)
        song_length = get_song_length(None, None, bm)
        py = parser.parse_beatmap(bm, speed=speed, song_length=song_length)
        ct = _native_groups(fixture, parser, speed, song_length)
        assert [(g.event_type, g.time) for g in py] == [
            (g.event_type, g.time) for g in ct
        ]


TOK_VARIANTS = [
    dict(),
    dict(add_cls_token=True),
    dict(separate_new_combo_token=False),
    dict(position_split_axes=False),
]


class TestTokenizeParity:
    @pytest.mark.parametrize("fixture", FIXTURES)
    @pytest.mark.parametrize("tv", range(len(TOK_VARIANTS)))
    def test_window_ids_bit_identical(self, fixture, tv):
        tok = BeatmapTokenizer(**TOK_VARIANTS[tv])
        tables = native_beatmap.TokTables(tok)
        parser = BeatmapEventParser()
        bm = load_beatmap(fixture)
        song_length = get_song_length(None, None, bm)
        groups = parser.parse_beatmap(bm, song_length=song_length)

        wl, ws = 16.0, 8.0
        starts = np.arange(0, song_length - 1.0, ws)
        max_length = 512
        rng = np.random.default_rng(0)
        seqs, sms, nats = [], [], []
        idx = 0
        for start_sec in starts:
            sm, em, nm = start_sec * 1000, (start_sec + wl) * 1000, (start_sec + ws) * 1000
            wg = []
            for g in groups[idx:]:
                if g.time < nm:
                    idx += 1
                if g.time < sm:
                    continue
                elif g.time < em:
                    wg.append(g)
                else:
                    break
            nat = int(rng.integers(0, 40))
            seqs.append(tok._encode_single(wg, sm, nat))
            sms.append(sm)
            nats.append(nat)
        py = pack_sequences(seqs, pad_id=tok.pad_token_id, padding="max_length",
                            truncation=True, max_length=max_length)

        ev = native_beatmap.NativeBeatmap.from_path(fixture).parse_events(
            parser, 1.0, song_length
        )
        res = ev.tokenize_windows(
            tables, np.asarray(sms), np.asarray(sms) + wl * 1000,
            np.asarray(sms) + ws * 1000, np.asarray(nats, np.int32),
            max_length, max_length, tok.pad_token_id,
        )
        assert res is not None
        ids, mask, _ = res
        np.testing.assert_array_equal(ids, py["input_ids"])
        np.testing.assert_array_equal(mask, py["attention_mask"])


class TestProcessorParity:
    """Whole-processor equality with the native path on vs off."""

    def _run(self, native, monkeypatch, **kwargs):
        from cm3p_tpu.processing import CM3PProcessor

        monkeypatch.setenv("CM3P_NATIVE_PARSE", "1" if native else "0")
        proc = CM3PProcessor()
        proc.rng = np.random.default_rng(1234)
        return proc(**kwargs)

    @pytest.mark.parametrize("fixture", FIXTURES)
    def test_beatmap_only(self, fixture, monkeypatch):
        a = self._run(False, monkeypatch, beatmap=fixture)
        b = self._run(True, monkeypatch, beatmap=fixture)
        assert set(a.keys()) == set(b.keys())
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_audio_metadata_variations(self, monkeypatch):
        fixture = FIXTURES[-1]
        rng = np.random.default_rng(0)
        audio = (rng.standard_normal(16000 * 120) * 0.05).astype(np.float32)
        kwargs = dict(
            beatmap=fixture, audio=audio, audio_sampling_rate=16000,
            metadata={"year": 2023}, multiply_metadata=True,
            populate_metadata=True, metadata_variations=3,
        )
        a = self._run(False, monkeypatch, **kwargs)
        b = self._run(True, monkeypatch, **kwargs)
        assert set(a.keys()) == set(b.keys())
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)

    @pytest.mark.parametrize("kwargs", [
        dict(padding="max_length"),
        dict(max_length=512),
        dict(speed=1.5),
        dict(pad_to_multiple_of=64),
    ])
    def test_padding_variants(self, kwargs, monkeypatch):
        fixture = FIXTURES[2]
        a = self._run(False, monkeypatch, beatmap=fixture, **kwargs)
        b = self._run(True, monkeypatch, beatmap=fixture, **kwargs)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)

    def test_native_path_actually_engages(self, monkeypatch):
        """Guard against the fast path silently rotting into permanent
        fallback: on a plain path input it must be taken."""
        from cm3p_tpu.processing import CM3PProcessor

        monkeypatch.setenv("CM3P_NATIVE_PARSE", "1")
        proc = CM3PProcessor()
        called = {"n": 0}
        orig = type(proc)._process_beatmaps_native

        def spy(self, *a, **kw):
            called["n"] += 1
            return orig(self, *a, **kw)

        monkeypatch.setattr(type(proc), "_process_beatmaps_native", spy)
        proc(beatmap=FIXTURES[0])
        assert called["n"] == 1

    def test_fallback_on_beatmap_object(self, monkeypatch):
        """Already-parsed Beatmap objects use the python path (no error)."""
        from cm3p_tpu.processing import CM3PProcessor

        monkeypatch.setenv("CM3P_NATIVE_PARSE", "1")
        proc = CM3PProcessor()
        bm = load_beatmap(FIXTURES[0])
        out = proc(beatmap=bm)
        ref = proc(beatmap=FIXTURES[0])
        np.testing.assert_array_equal(out["input_ids"], ref["input_ids"])

    def test_kill_switch(self, monkeypatch):
        from cm3p_tpu.processing import CM3PProcessor

        monkeypatch.setenv("CM3P_NATIVE_PARSE", "0")
        proc = CM3PProcessor()
        assert not proc._native_parse_enabled()


class TestSummary:
    @pytest.mark.parametrize("fixture", FIXTURES)
    def test_metadata_from_summary_matches(self, fixture):
        from cm3p_tpu.processing.processor import _metadata_from_summary, get_metadata

        bm = load_beatmap(fixture)
        song_length = get_song_length(None, None, bm)
        py = get_metadata(beatmap=bm)
        s = native_beatmap.NativeBeatmap.from_path(fixture).summary()
        ct = _metadata_from_summary(s, song_length, None)
        assert py == ct

    def test_malformed_beatmap_flags_error(self, tmp_path):
        """Content the python parser raises on must flag parse_error so the
        processor falls back (and surfaces the python error)."""
        bad = tmp_path / "bad.osu"
        bad.write_text(
            "osu file format v14\n[General]\nMode: 0\n[TimingPoints]\n"
            "0,300,junk,0,0,100,1,0\n[HitObjects]\n256,192,1000,1,0,0:0:0:0:\n"
        )
        nb = native_beatmap.NativeBeatmap.from_path(bad)
        assert nb.summary().parse_error == 1
