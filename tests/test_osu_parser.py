"""Unit tests for the .osu parser, curve math and event lowering."""
import math

import numpy as np
import pytest

from cm3p_tpu.beatmap import (
    Beatmap,
    BeatmapEventParser,
    Circle,
    EventType,
    Slider,
    get_song_length,
    load_beatmap,
)
from cm3p_tpu.beatmap.curves import Linear, MultiBezier, Perfect, curve_from_kind, get_circle_center
from cm3p_tpu.beatmap.events import get_median_mpb_beatmap, merge_groups, Group

MINI_MAP = """osu file format v14

[General]
AudioFilename: audio.mp3
Mode: 0

[Metadata]
Title:Test
Creator:tester
BeatmapID:123
BeatmapSetID:456

[Difficulty]
CircleSize:4
SliderMultiplier:1.0
HPDrainRate:5

[TimingPoints]
0,500,4,2,1,70,1,0
1000,-50,4,2,1,60,0,1

[HitObjects]
100,100,0,5,0,0:0:0:0:
200,200,500,1,8,0:0:0:0:
100,100,1000,2,0,L|200:100,1,100,0|2,1:0|2:3,0:0:0:0:
256,192,2000,12,0,2500,0:0:0:0:
"""


def make_mini() -> Beatmap:
    return Beatmap.from_string(MINI_MAP)


class TestOsuParsing:
    def test_sections_and_fields(self):
        bm = make_mini()
        assert bm.mode == 0
        assert bm.circle_size == 4.0
        assert bm.slider_multiplier == 1.0
        assert bm.beatmap_id == 123
        assert bm.beatmap_set_id == 456
        assert len(bm.timing_points) == 2
        assert len(bm.hit_objects()) == 4

    def test_timing_point_inheritance(self):
        bm = make_mini()
        tp0, tp1 = bm.timing_points
        assert not tp0.inherited and tp0.bpm == 120.0
        assert tp1.inherited and tp1.parent is tp0
        assert tp1.kiai_mode and not tp0.kiai_mode
        assert bm.timing_point_at(0) is tp0
        assert bm.timing_point_at(999) is tp0
        assert bm.timing_point_at(1000) is tp1
        assert bm.timing_point_at(-5) is tp0  # before first falls back

    def test_timing_point_lookup_unsorted_and_appended(self):
        # timing_point_at caches a bisect index for sorted offsets; unsorted
        # lists must keep the exact reversed-scan semantics (last point in
        # file order with offset <= t), and appending must invalidate the
        # cache (tests build maps incrementally).
        from cm3p_tpu.beatmap.osu import TimingPoint

        bm = make_mini()
        tp0, tp1 = bm.timing_points
        assert bm.timing_point_at(1500) is tp1  # build the cache
        out_of_order = TimingPoint(offset=500.0, ms_per_beat=400.0)
        bm.timing_points.append(out_of_order)  # now [0, 1000, 500]
        # reversed scan: last point with offset <= 700 in file order
        assert bm.timing_point_at(700) is out_of_order
        assert bm.timing_point_at(1200) is out_of_order  # 500 <= 1200, last in order
        assert bm.timing_point_at(100) is tp0

    def test_slider_end_time_with_sv(self):
        bm = make_mini()
        slider = bm.hit_objects()[2]
        assert isinstance(slider, Slider)
        # sv = -100/-50 = 2.0; pixels_per_beat = 1.0*100*2 = 200
        # num_beats = 100/200 = 0.5 → duration = ceil(0.5*500) = 250 ms
        assert slider.end_time == 1000 + 250

    def test_new_combo_flag(self):
        bm = make_mini()
        first, second = bm.hit_objects()[:2]
        assert isinstance(first, Circle) and first.new_combo
        assert not second.new_combo

    def test_resource_beatmap_parses(self, beatmap_path):
        bm = load_beatmap(beatmap_path)
        assert bm.mode == 0
        assert len(bm.hit_objects()) == 1378
        assert len(bm.timing_points) == 560
        assert bm.creator == "OliBomby"
        assert abs(get_song_length(beatmap=bm) - 255.479) < 0.01


class TestCurves:
    def test_circle_center(self):
        cx, cy = get_circle_center((0, 1), (1, 0), (0, -1))
        assert abs(cx) < 1e-9 and abs(cy) < 1e-9

    def test_collinear_perfect_falls_back_to_bezier(self):
        c = curve_from_kind("P", [(0, 0), (50, 0), (100, 0)], 100)
        assert isinstance(c, MultiBezier)

    def test_perfect_arc_endpoint(self):
        # quarter circle radius 100 centered at origin: (100,0) → (0,100)
        c = curve_from_kind("P", [(100, 0), (math.sqrt(2) / 2 * 100, math.sqrt(2) / 2 * 100), (0, 100)], 100 * math.pi / 2)
        x, y = c(1)
        assert abs(x - 0) < 1.0 and abs(y - 100) < 1.0

    def test_linear_extrapolates_to_req_length(self):
        c = Linear([(0, 0), (100, 0)], 150)
        x, y = c(1)
        assert abs(x - 150) < 1e-6 and abs(y) < 1e-6

    def test_bezier_endpoint(self):
        pts = [(0, 0), (50, 100), (100, 0)]
        c = curve_from_kind("B", pts, 200)  # longer than the curve → extrapolate
        x0, y0 = c(0)
        assert abs(x0) < 1e-6 and abs(y0) < 1e-6

    def test_multibezier_red_anchor_split(self):
        pts = [(0, 0), (50, 50), (50, 50), (100, 0)]
        c = curve_from_kind("B", pts, 141)
        x, y = c(0.5)
        assert 40 < x < 60  # middle of the path is near the red anchor


class TestEventParser:
    def test_event_stream_structure(self):
        parser = BeatmapEventParser()
        groups = parser.parse_beatmap(make_mini())
        types = [g.event_type for g in groups]
        assert EventType.CIRCLE in types
        assert EventType.SLIDER_HEAD in types
        assert EventType.LAST_ANCHOR in types  # slider_version 2
        assert EventType.SLIDER_END in types
        assert EventType.REPEAT_END in types
        assert EventType.SPINNER in types
        assert EventType.SPINNER_END in types
        assert EventType.TIMING_POINT in types
        assert EventType.KIAI_ON in types
        # groups are time sorted
        times = [g.time for g in groups]
        assert times == sorted(times)

    def test_circle_attributes(self):
        parser = BeatmapEventParser()
        groups = parser.parse_beatmap(make_mini())
        circle = next(g for g in groups if g.event_type == EventType.CIRCLE)
        assert circle.new_combo
        assert circle.x == 100 and circle.y == 100
        # distance from initial (256, 192)
        assert circle.distance == int(np.hypot(156, 92))
        assert circle.snapping == 1
        assert circle.volumes == [70]

    def test_hitsound_inheritance(self):
        parser = BeatmapEventParser()
        groups = parser.parse_beatmap(make_mini())
        second = [g for g in groups if g.event_type == EventType.CIRCLE][1]
        # hitsound 8 (clap); sample set inherits soft (2) from timing point
        assert second.hitsounds == [8]
        assert second.samplesets == [2]

    def test_speed_scaling(self):
        parser = BeatmapEventParser()
        groups_1x = parser.parse_beatmap(make_mini(), speed=1.0)
        groups_15 = parser.parse_beatmap(make_mini(), speed=1.5)
        c1 = next(g for g in groups_1x if g.event_type == EventType.CIRCLE and g.time > 0)
        c2 = next(g for g in groups_15 if g.event_type == EventType.CIRCLE and g.time > 0)
        assert c2.time == int(c1.time / 1.5)

    def test_snapping_detection(self):
        parser = BeatmapEventParser()
        groups = parser.parse_beatmap(make_mini())
        circles = [g for g in groups if g.event_type == EventType.CIRCLE]
        assert circles[0].snapping == 1  # exactly on beat
        assert circles[1].snapping == 1  # 500 ms = 1 beat at 120 bpm

    def test_median_mpb(self):
        bm = make_mini()
        assert get_median_mpb_beatmap(bm) == 500.0

    def test_merge_groups_is_stable(self):
        g1 = [Group(event_type=EventType.BEAT, time=0), Group(event_type=EventType.BEAT, time=100)]
        g2 = [Group(event_type=EventType.CIRCLE, time=50)]
        merged = merge_groups(g1, g2)
        assert [g.time for g in merged] == [0, 50, 100]

    def test_golden_counts_resource_beatmap(self, beatmap_path):
        """Golden structural fingerprint of the bundled beatmap."""
        parser = BeatmapEventParser()
        groups = parser.parse_beatmap(beatmap_path)
        from collections import Counter

        counts = Counter(g.event_type.value for g in groups)
        assert counts["circle"] == 1014
        assert counts["slider_head"] == 362
        assert counts["slider_end"] == 362
        assert counts["repeat_end"] == 362
        assert counts["last_anchor"] == 362
        assert counts["spinner"] == 2
        assert counts["kiai_on"] == 6
        assert counts["timing_point"] == 9

    def test_mania_column_compat_default(self):
        mania = MINI_MAP.replace("Mode: 0", "Mode: 3")
        parser = BeatmapEventParser()
        groups = parser.parse_beatmap(Beatmap.from_string(mania))
        circles = [g for g in groups if g.event_type == EventType.CIRCLE]
        assert all(g.mania_column is None for g in circles)  # reference-compatible

        fixed = BeatmapEventParser(emit_mania_column=True)
        groups2 = fixed.parse_beatmap(Beatmap.from_string(mania))
        circles2 = [g for g in groups2 if g.event_type == EventType.CIRCLE]
        assert all(g.mania_column is not None for g in circles2)


class TestParserSaveLoad:
    def test_round_trip(self, tmp_path):
        parser = BeatmapEventParser(slider_version=1, add_kiai=False)
        parser.save_pretrained(tmp_path)
        restored = BeatmapEventParser.from_pretrained(tmp_path)
        assert restored.get_config() == parser.get_config()
