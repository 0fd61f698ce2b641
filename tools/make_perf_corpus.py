"""Generate the deterministic perf corpus (VERDICT r2 next #7).

The entire r2 perf story derived from ONE beatmap (the bundled std map
tiled); fill rate, tokens/window, and mel ratios all inherited its density.
This tool synthesizes 16 valid .osu files spanning the axes that move those
statistics — game mode (std/taiko/catch/mania), object density, track
length, BPM, and slider/hold mix — into ``resources/perf_corpus/`` (checked
in; regeneration is bit-identical). bench.py --corpus and the e2e fixture
consume it.

    python tools/make_perf_corpus.py [--out resources/perf_corpus]
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

HEADER = """osu file format v14

[General]
AudioFilename: audio.wav
AudioLeadIn: 0
PreviewTime: -1
Countdown: 0
SampleSet: Normal
StackLeniency: 0.7
Mode: {mode}
LetterboxInBreaks: 0

[Metadata]
Title:{title}
TitleUnicode:{title}
Artist:CM3P Perf
ArtistUnicode:CM3P Perf
Creator:{creator}
Version:{version}
Source:
Tags:perf corpus {tag}
BeatmapID:{bid}
BeatmapSetID:{sid}

[Difficulty]
HPDrainRate:{hp}
CircleSize:{cs}
OverallDifficulty:{od}
ApproachRate:{ar}
SliderMultiplier:{sm}
SliderTickRate:1

[Events]

[TimingPoints]
{timing}

[HitObjects]
"""

# (mode, seconds, objects_per_sec, bpm, name)
SPECS = [
    (0, 60, 1.0, 120, "std_sparse_short"),
    (0, 150, 4.0, 180, "std_mid"),
    (0, 255, 8.0, 200, "std_dense"),
    (0, 400, 12.0, 222, "std_marathon_dense"),
    (1, 60, 2.0, 140, "taiko_sparse_short"),
    (1, 150, 5.0, 185, "taiko_mid"),
    (1, 255, 9.0, 240, "taiko_dense"),
    (1, 400, 6.0, 160, "taiko_marathon"),
    (2, 60, 1.5, 130, "catch_sparse_short"),
    (2, 150, 4.0, 175, "catch_mid"),
    (2, 255, 7.0, 190, "catch_dense"),
    (2, 400, 3.0, 150, "catch_marathon"),
    (3, 60, 2.0, 150, "mania_sparse_short"),
    (3, 150, 6.0, 180, "mania_mid"),
    (3, 255, 10.0, 210, "mania_dense"),
    (3, 400, 14.0, 250, "mania_marathon_dense"),
]


def timing_lines(seconds: float, bpm: float, rng) -> str:
    ms_per_beat = 60000.0 / bpm
    lines = [f"0,{ms_per_beat},4,2,1,60,1,0"]
    # a few SV changes (inherited points) spread through the track
    for frac, sv in ((0.25, -66.6666666666667), (0.5, -100), (0.75, -133.333333333333)):
        t = int(seconds * 1000 * frac)
        lines.append(f"{t},{sv},4,2,1,60,0,0")
    # one mid-track BPM change for the longer maps
    if seconds > 200:
        t = int(seconds * 1000 * 0.6)
        lines.append(f"{t},{60000.0 / (bpm * 1.1)},4,2,1,60,1,0")
    return "\n".join(lines)


def std_objects(seconds, density, bpm, rng):
    n = int(seconds * density)
    beat = 60000.0 / bpm
    lines = []
    t = 1000.0
    for i in range(n):
        x = int(rng.integers(32, 480))
        y = int(rng.integers(32, 352))
        new_combo = 4 if i % 8 == 0 else 0
        kind = i % 5
        if kind == 3:  # linear/bezier/perfect sliders with repeats
            ctype = "LPB"[i % 3]
            x2, y2 = int(rng.integers(32, 480)), int(rng.integers(32, 352))
            pts = f"{ctype}|{x2}:{y2}"
            if ctype == "B" and i % 6 == 0:
                x3, y3 = int(rng.integers(32, 480)), int(rng.integers(32, 352))
                pts += f"|{x2}:{y2}|{x3}:{y3}"  # duplicated = red anchor
            repeats = 1 + (i % 3)
            length = float(rng.integers(60, 240))
            lines.append(f"{x},{y},{int(t)},{2 | new_combo},{i % 4},{pts},{repeats},{length}")
            t += beat * repeats * 0.5
        elif kind == 4 and i % 20 == 4:  # occasional spinner
            end = int(t + beat * 2)
            lines.append(f"256,192,{int(t)},{8 | 4},0,{end}")
            t += beat * 2
        else:
            lines.append(f"{x},{y},{int(t)},{1 | new_combo},{i % 4}")
        t += max(beat / max(density / 2.0, 1.0), 1000.0 / density)
        if t > seconds * 1000 - 500:
            break
    return lines


def taiko_objects(seconds, density, bpm, rng):
    n = int(seconds * density)
    beat = 60000.0 / bpm
    lines = []
    t = 800.0
    for i in range(n):
        if i % 16 == 10:  # drumroll (slider in taiko)
            length = float(rng.integers(80, 200))
            lines.append(f"256,192,{int(t)},2,{(i % 2) * 8},L|400:192,1,{length}")
            t += beat
        elif i % 24 == 20:  # denden (spinner)
            end = int(t + beat * 1.5)
            lines.append(f"256,192,{int(t)},12,0,{end}")
            t += beat * 1.5
        else:
            hitsound = [0, 8, 2, 10][i % 4]  # don/kat variants
            lines.append(f"256,192,{int(t)},{1 | (4 if i % 12 == 0 else 0)},{hitsound}")
        t += 1000.0 / density
        if t > seconds * 1000 - 500:
            break
    return lines


def catch_objects(seconds, density, bpm, rng):
    n = int(seconds * density)
    lines = []
    t = 900.0
    for i in range(n):
        x = int(rng.integers(16, 496))
        if i % 7 == 5:  # juice stream (slider)
            x2 = int(np.clip(x + rng.integers(-120, 120), 16, 496))
            length = float(rng.integers(50, 150))
            lines.append(f"{x},192,{int(t)},2,0,L|{x2}:192,1,{length}")
        else:
            lines.append(f"{x},192,{int(t)},{1 | (4 if i % 10 == 0 else 0)},0")
        t += 1000.0 / density
        if t > seconds * 1000 - 500:
            break
    return lines


def mania_objects(seconds, density, bpm, rng, keys=7):
    n = int(seconds * density)
    lines = []
    t = 700.0
    for i in range(n):
        col = int(rng.integers(0, keys))
        x = int((col + 0.5) * 512.0 / keys)
        if i % 6 == 4:  # hold note
            end = int(t + rng.integers(200, 900))
            lines.append(f"{x},192,{int(t)},128,0,{end}:0:0:0:0:")
        else:
            lines.append(f"{x},192,{int(t)},1,0")
        t += 1000.0 / density
        if t > seconds * 1000 - 500:
            break
    return lines


GENERATORS = {0: std_objects, 1: taiko_objects, 2: catch_objects, 3: mania_objects}


def make_map(mode, seconds, density, bpm, name, sid, bid) -> str:
    rng = np.random.default_rng(abs(hash(name)) % (2**31))
    rng = np.random.default_rng(sid * 1000 + bid)  # stable across python hash seeds
    header = HEADER.format(
        mode=mode, title=name.replace("_", " ").title(), creator=f"perf_{mode}",
        version=name, tag=name, bid=bid, sid=sid,
        hp=5, cs=7 if mode == 3 else 4, od=7, ar=9, sm=1.4,
        timing=timing_lines(seconds, bpm, rng),
    )
    body = "\n".join(GENERATORS[mode](seconds, density, bpm, rng))
    return header + body + "\n"


def build(out: Path) -> list[Path]:
    out.mkdir(parents=True, exist_ok=True)
    paths = []
    for i, (mode, seconds, density, bpm, name) in enumerate(SPECS):
        p = out / f"{name}.osu"
        p.write_text(make_map(mode, seconds, density, bpm, name, 9000 + i, 9500 + i), encoding="utf-8")
        paths.append(p)
    return paths


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(Path(__file__).parent.parent / "resources" / "perf_corpus"))
    ns = ap.parse_args(argv)
    paths = build(Path(ns.out))
    print(f"wrote {len(paths)} maps to {ns.out}")


if __name__ == "__main__":
    main()
