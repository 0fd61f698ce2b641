"""Differential parser parity: OUR event lowering vs the REFERENCE's.

Runs the actual reference parser (``/root/reference/cm3p/parsing_cm3p.py``)
over the functional slider shim (tests/slider_shim.py) and compares its
Group stream field-by-field against ``cm3p_tpu.beatmap.BeatmapEventParser``
on per-mode fixtures that exercise every EventType family:

* taiko — drumroll, denden, scroll speeds on circles (parsing_cm3p.py:704-752)
* mania — hold notes, SV changes, median-mpb normalization incl. the
  timedelta ``.seconds`` truncation + negative-offset wraparound quirks
  (parsing_cm3p.py:117-155,292-323,671-702)
* std  — slider curve edge cases: red anchors, duplicated-tail dedupe,
  Perfect 3-point arc, collinear + 2-point Perfect fallbacks, Catmull,
  >=100-point art-slider skip, repeats with edge hitsounds
  (parsing_cm3p.py:543-640)
* catch — mode-2 positions/new-combo semantics

plus tokenizer bit-parity over each fixture's full group stream and over a
synthetic stream covering all 23 EventTypes.
"""
import sys
from pathlib import Path

import pytest

pytest.importorskip("transformers")

from tests import slider_shim

slider_shim.install()
sys.path.append("/root/reference")  # APPEND: reference modules (validate_dataset, train, config, ...) must never shadow ours

try:
    from cm3p.parsing_cm3p import CM3PBeatmapParser as RefParser
    from cm3p.tokenization_cm3p import CM3PBeatmapTokenizer as RefBeatmapTokenizer
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference parser unavailable: {e}", allow_module_level=True)

import numpy as np

from cm3p_tpu.beatmap import BeatmapEventParser, EventType, Group, load_beatmap
from cm3p_tpu.tokenize import BeatmapTokenizer

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
]


def _group_tuple(g):
    return (
        g.event_type.value,
        g.time,
        g.has_time,
        g.snapping,
        g.distance,
        g.x,
        g.y,
        getattr(g, "mania_column", None),
        g.new_combo,
        list(g.hitsounds),
        list(g.samplesets),
        list(g.additions),
        list(g.volumes),
        None if g.scroll_speed is None else round(float(g.scroll_speed), 9),
    )


def _compare(ours, theirs, tag):
    assert len(ours) == len(theirs), (
        f"{tag}: group count {len(ours)} != reference {len(theirs)}\n"
        f"ours tail: {[(g.event_type.value, g.time) for g in ours[-5:]]}\n"
        f"ref tail: {[(g.event_type.value, g.time) for g in theirs[-5:]]}"
    )
    for idx, (a, b) in enumerate(zip(ours, theirs)):
        ta, tb = _group_tuple(a), _group_tuple(b)
        assert ta == tb, f"{tag}: group {idx} differs\nours: {ta}\nref:  {tb}"


class TestParserParity:
    @pytest.mark.parametrize("fixture", FIXTURES)
    @pytest.mark.parametrize("variant", range(len(PARSER_VARIANTS)))
    def test_groups_identical(self, fixture, variant):
        kwargs = PARSER_VARIANTS[variant]
        ours = BeatmapEventParser(**kwargs).parse_beatmap(fixture)
        import slider

        ref_bm = slider.Beatmap.from_path(fixture)
        theirs = RefParser(**kwargs).parse_beatmap(ref_bm)
        _compare(ours, theirs, f"{fixture}#{variant}")

    @pytest.mark.parametrize("fixture", FIXTURES)
    def test_speed_scaling_identical(self, fixture):
        """DT augmentation path (parsing_cm3p.py:99-114)."""
        ours = BeatmapEventParser().parse_beatmap(fixture, speed=1.5)
        import slider

        theirs = RefParser().parse_beatmap(slider.Beatmap.from_path(fixture), speed=1.5)
        _compare(ours, theirs, f"{fixture}@1.5x")

    def test_event_coverage(self):
        """The fixtures exercise every EventType the parser can emit."""
        seen = set()
        for fixture in FIXTURES:
            for g in BeatmapEventParser().parse_beatmap(fixture):
                seen.add(g.event_type)
        assert seen == set(EventType), f"missing: {set(EventType) - seen}"


class TestTokenizerParityOnFixtures:
    """Bit-identical token ids on every fixture's full stream."""

    @pytest.mark.parametrize("fixture", FIXTURES)
    def test_token_ids_identical(self, fixture):
        from tests.test_tokenizer_parity import to_ref_groups

        groups = BeatmapEventParser().parse_beatmap(fixture)
        ref_tok = RefBeatmapTokenizer()
        our_tok = BeatmapTokenizer()
        ref_ids = list(
            ref_tok(to_ref_groups(groups), window_start_ms=0, num_audio_tokens=5, return_tensors=None)["input_ids"]
        )
        our_ids = list(our_tok._encode_single(groups, window_start_ms=0, num_audio_tokens=5))
        assert ref_ids == our_ids


def synthetic_all_event_groups():
    """One Group per EventType with every attribute populated."""
    groups = []
    t = 1000
    for i, et in enumerate(EventType):
        g = Group(event_type=et, time=t + 17 * i)
        g.has_time = et not in (
            EventType.BEZIER_ANCHOR,
            EventType.PERFECT_ANCHOR,
            EventType.CATMULL_ANCHOR,
            EventType.RED_ANCHOR,
            EventType.LAST_ANCHOR,
        )
        g.snapping = (i % 17) if g.has_time else None
        g.x = 17 * i % 512
        g.y = 23 * i % 384
        g.distance = 11 * i % 640
        g.mania_column = i % 18
        g.new_combo = i % 2 == 0
        g.scroll_speed = round(0.01 + (i % 10) * 0.37, 2)
        g.hitsounds = [(i * 2) % 16 & 14, 8]
        g.samplesets = [1 + i % 3, 2]
        g.additions = [1 + (i + 1) % 3, 3]
        g.volumes = [i * 7 % 101, 55]
        groups.append(g)
    return groups


class TestSyntheticAllEventTypes:
    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(),
            dict(separate_new_combo_token=False, add_cls_token=True),
            dict(position_split_axes=False, max_time=16000),
        ],
    )
    def test_all_23_event_types_bit_identical(self, kwargs):
        from tests.test_tokenizer_parity import to_ref_groups

        groups = synthetic_all_event_groups()
        ref_tok = RefBeatmapTokenizer(**kwargs)
        our_tok = BeatmapTokenizer(**kwargs)
        ref_ids = list(
            ref_tok(to_ref_groups(groups), window_start_ms=500, num_audio_tokens=3, return_tensors=None)["input_ids"]
        )
        our_ids = list(our_tok._encode_single(groups, window_start_ms=500, num_audio_tokens=3))
        assert ref_ids == our_ids
        # all event-type tokens actually appear
        inv = {v: k for k, v in our_tok.get_vocab().items()}
        toks = {inv[i] for i in our_ids}
        for et in EventType:
            assert any(et.value.upper() in t for t in toks), f"{et.value} token missing from stream"
