"""Parser robustness fuzz: malformed .osu input must fail cleanly.

Production extraction walks user-supplied archives; the data pipeline's
error-skip contract (log + continue) only works if the parser either
parses or raises a normal exception — never hangs, never segfaults the
native fast path, never silently emits garbage that diverges from the
python path. Deterministic seeds keep failures reproducible.
"""
import numpy as np
import pytest

from cm3p_tpu.beatmap import BeatmapEventParser
from cm3p_tpu.beatmap.osu import Beatmap

VALID_HEADER = """osu file format v14

[General]
AudioFilename: audio.wav
Mode: {mode}

[Metadata]
Title:Fuzz
Creator:fuzz
BeatmapID:1
BeatmapSetID:1

[Difficulty]
HPDrainRate:5
CircleSize:4
OverallDifficulty:7
ApproachRate:9
SliderMultiplier:1.4
SliderTickRate:1

[TimingPoints]
0,300,4,2,1,60,1,0

[HitObjects]
"""


def _try_parse(text: str):
    """Parse or raise a normal exception; return groups or None."""
    import io

    try:
        bm = Beatmap.from_file(io.StringIO(text))
        return BeatmapEventParser().parse_beatmap(bm)
    except Exception:
        return None


class TestStructuredMutations:
    """Line-level mutations of a valid map: every outcome must be parse-or-raise."""

    @pytest.mark.parametrize("seed", range(20))
    def test_mutated_hitobjects(self, seed):
        rng = np.random.default_rng(seed)
        lines = []
        t = 500
        for i in range(30):
            kind = rng.integers(0, 6)
            x, y = int(rng.integers(-50, 600)), int(rng.integers(-50, 450))
            if kind == 0:
                lines.append(f"{x},{y},{t},1,0")
            elif kind == 1:  # slider with possibly-degenerate curve
                pts = "|".join(
                    f"{int(rng.integers(-100, 700))}:{int(rng.integers(-100, 500))}"
                    for _ in range(int(rng.integers(0, 5)))
                )
                ctype = "LPBC"[int(rng.integers(0, 4))]
                lines.append(
                    f"{x},{y},{t},2,0,{ctype}|{pts},{int(rng.integers(-1, 4))},"
                    f"{float(rng.uniform(-10, 500)):.2f}"
                )
            elif kind == 2:  # spinner, possibly end<start
                lines.append(f"{x},{y},{t},8,0,{t + int(rng.integers(-500, 2000))}")
            elif kind == 3:  # mania hold
                lines.append(f"{x},{y},{t},128,0,{t + int(rng.integers(-100, 900))}:0:0:0:0:")
            elif kind == 4:  # truncated fields
                lines.append(f"{x},{y},{t},1")
            else:  # garbage numerics
                lines.append(f"{x},{y},{t},1,0,nan:inf")
            t += int(rng.integers(1, 400))
        text = VALID_HEADER.format(mode=int(rng.integers(0, 4))) + "\n".join(lines)
        _try_parse(text)  # must return or raise — not hang/crash

    @pytest.mark.parametrize("seed", range(10))
    def test_mutated_timing_points(self, seed):
        rng = np.random.default_rng(100 + seed)
        tps = ["0,300,4,2,1,60,1,0"]
        for _ in range(10):
            offset = float(rng.uniform(-5000, 60000))
            mpb = float(rng.choice([0.0, -0.0, 1e-9, -1e9, 300.0, float("nan")]))
            tps.append(f"{offset},{mpb},4,2,1,60,{int(rng.integers(0, 2))},0")
        text = VALID_HEADER.replace("0,300,4,2,1,60,1,0", "\n".join(tps)).format(mode=0)
        text += "256,192,1000,1,0\n256,192,2000,1,0"
        _try_parse(text)

    def test_native_python_agree_on_fuzzed_valid_maps(self, monkeypatch):
        """Maps that DO parse must tokenize identically native vs python."""
        from cm3p_tpu.processing import CM3PProcessor

        rng = np.random.default_rng(7)
        lines = []
        t = 500
        for i in range(60):
            x, y = int(rng.integers(0, 512)), int(rng.integers(0, 384))
            if i % 4 == 3:
                lines.append(f"{x},{y},{t},2,0,L|{x + 40}:{y},1,{float(rng.uniform(30, 200)):.1f}")
            else:
                lines.append(f"{x},{y},{t},1,{int(rng.integers(0, 16))}")
            t += int(rng.integers(50, 300))
        text = VALID_HEADER.format(mode=0) + "\n".join(lines)

        import io

        def ids(native):
            monkeypatch.setenv("CM3P_NATIVE_PARSE", "1" if native else "0")
            proc = CM3PProcessor()
            out = proc(
                beatmap=io.StringIO(text),
                window_length_sec=16.0, window_stride_sec=16.0, padding="longest",
            )
            return np.asarray(out["input_ids"])

        np.testing.assert_array_equal(ids(True), ids(False))


class TestRawGarbage:
    @pytest.mark.parametrize("seed", range(8))
    def test_random_bytes_fail_cleanly(self, seed):
        rng = np.random.default_rng(200 + seed)
        junk = bytes(rng.integers(0, 256, 2000, dtype=np.uint8))
        text = junk.decode("utf-8", errors="replace")
        _try_parse(text)

    def test_empty_and_header_only(self):
        _try_parse("")
        _try_parse("osu file format v14\n")
        _try_parse(VALID_HEADER.format(mode=0))

    def test_deep_section_nesting_and_unicode(self):
        text = VALID_HEADER.format(mode=0) + "256,192,1000,1,0\n"
        text += "[嘘のセクション]\nkey:値\n" * 50
        _try_parse(text)
