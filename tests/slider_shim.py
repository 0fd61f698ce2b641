"""A functional ``slider``-library shim backed by our own ``.osu`` model.

The reference parser (``/root/reference/cm3p/parsing_cm3p.py``) consumes the
external ``slider`` library, which is not installed in this image. This shim
implements the exact surface that parser touches — ``Beatmap`` (hit_objects /
timing_points / timing_point_at / mode / circle_size), the four hit-object
classes with ``timedelta`` times, ``TimingPoint`` with parent links, and the
four curve classes — on top of ``cm3p_tpu.beatmap.osu``/``curves``.

That lets the *actual reference event-lowering code* run on any fixture and be
compared group-by-group against ``cm3p_tpu.beatmap.parser`` (the differential
parity tests in test_parser_parity.py). The comparison pins everything from
drumroll/denden and mania holds to anchor classification, hitsound
inheritance, snapping, and the timing grid.

Boundary: both sides share our low-level ``.osu`` tokenization (hit-object
lines, timing-point lines, slider duration math), so quirks of slider's own
file parsing are out of scope — what is differentially tested is the event
lowering, which is where all 23 EventTypes are produced.

``install()`` registers the shim as ``sys.modules['slider']`` (idempotent; it
replaces the inert name-only stub if one was installed first).
"""
from __future__ import annotations

import sys
import types
from datetime import timedelta

from cm3p_tpu.beatmap import curves as _curves
from cm3p_tpu.beatmap import osu as _osu


def _td(ms: float) -> timedelta:
    return timedelta(milliseconds=float(ms))


class TimingPoint:
    """slider.TimingPoint facade: timedelta offset + parent link."""

    def __init__(self, tp: _osu.TimingPoint):
        self.offset = _td(tp.offset)
        self.ms_per_beat = tp.ms_per_beat
        self.meter = tp.meter
        self.sample_type = tp.sample_type
        self.sample_index = tp.sample_index
        self.volume = tp.volume
        self.kiai_mode = tp.kiai_mode
        self.parent: TimingPoint | None = None  # wired by Beatmap

    @property
    def bpm(self):
        import math

        if self.ms_per_beat <= 0 or math.isnan(self.ms_per_beat):
            return None
        return 60000.0 / self.ms_per_beat


class _CurveShim:
    """Callable curve facade with tuple control points (== comparable)."""

    def __init__(self, curve: _curves.Curve):
        self._curve = curve
        self.points = [tuple(p) for p in curve.points]
        self.req_length = curve.req_length

    def __call__(self, t: float):
        return self._curve(t)


class Linear(_CurveShim):
    pass


class Catmull(_CurveShim):
    pass


class Perfect(_CurveShim):
    pass


class MultiBezier(_CurveShim):
    pass


_CURVE_MAP = {
    _curves.Linear: Linear,
    _curves.Catmull: Catmull,
    _curves.Perfect: Perfect,
    _curves.MultiBezier: MultiBezier,
}


def _wrap_curve(curve: _curves.Curve) -> _CurveShim:
    return _CURVE_MAP[type(curve)](curve)


class _HitObject:
    def __init__(self, ho: _osu.HitObject):
        self.position = tuple(ho.position)
        self.time = _td(ho.time)
        self.hitsound = ho.hitsound
        self.addition = ho.addition
        self.new_combo = ho.new_combo


class Circle(_HitObject):
    pass


class Spinner(_HitObject):
    def __init__(self, ho: _osu.Spinner):
        super().__init__(ho)
        self.end_time = _td(ho.end_time)


class HoldNote(_HitObject):
    def __init__(self, ho: _osu.HoldNote):
        super().__init__(ho)
        self.end_time = _td(ho.end_time)


class Slider(_HitObject):
    def __init__(self, ho: _osu.Slider):
        super().__init__(ho)
        self.end_time = _td(ho.end_time)
        self.repeat = ho.repeat
        self.pixel_length = ho.pixel_length
        self.curve = _wrap_curve(ho.curve)
        self.edge_sounds = list(ho.edge_sounds)
        self.edge_additions = list(ho.edge_additions)


_HO_MAP = {
    _osu.Circle: Circle,
    _osu.Slider: Slider,
    _osu.Spinner: Spinner,
    _osu.HoldNote: HoldNote,
}


class Beatmap:
    """slider.Beatmap facade over a parsed cm3p_tpu Beatmap."""

    def __init__(self, bm: _osu.Beatmap):
        self.mode = bm.mode
        self.circle_size = bm.circle_size
        self.slider_multiplier = bm.slider_multiplier
        self.timing_points = [TimingPoint(tp) for tp in bm.timing_points]
        # parent links: most recent uninherited point, as slider wires them
        by_src = dict(zip(map(id, bm.timing_points), self.timing_points))
        for src, shim in zip(bm.timing_points, self.timing_points):
            if src.parent is not None:
                shim.parent = by_src[id(src.parent)]
        self._hit_objects = [_HO_MAP[type(ho)](ho) for ho in bm.hit_objects(stacking=False)]

    @classmethod
    def from_path(cls, path) -> "Beatmap":
        return cls(_osu.Beatmap.from_path(path))

    @classmethod
    def from_file(cls, f) -> "Beatmap":
        return cls(_osu.Beatmap.from_string(f.read()))

    def hit_objects(self, stacking: bool = True) -> list[_HitObject]:
        if stacking:
            raise NotImplementedError("CM3P always parses with stacking=False")
        return self._hit_objects

    def timing_point_at(self, time: timedelta) -> TimingPoint:
        for tp in reversed(self.timing_points):
            if tp.offset <= time:
                return tp
        return self.timing_points[0]


def install() -> None:
    """Register the shim as the ``slider`` package (replacing any inert stub)."""
    existing = sys.modules.get("slider")
    if existing is not None and getattr(existing, "__cm3p_shim__", False):
        return
    mod = types.ModuleType("slider")
    mod.__cm3p_shim__ = True
    mod.Beatmap = Beatmap
    mod.Circle = Circle
    mod.Slider = Slider
    mod.Spinner = Spinner
    mod.HoldNote = HoldNote
    mod.TimingPoint = TimingPoint
    curve_mod = types.ModuleType("slider.curve")
    curve_mod.Linear = Linear
    curve_mod.Catmull = Catmull
    curve_mod.Perfect = Perfect
    curve_mod.MultiBezier = MultiBezier
    mod.curve = curve_mod
    sys.modules["slider"] = mod
    sys.modules["slider.curve"] = curve_mod
    # if the reference package was already imported against an older stub its
    # modules hold stale class objects — force a clean re-import
    for name in [n for n in sys.modules if n == "cm3p" or n.startswith("cm3p.")]:
        del sys.modules[name]
