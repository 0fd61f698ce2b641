"""The perf corpus (resources/perf_corpus) — VERDICT r2 next #7.

The perf story must hold beyond the single bundled map: 16 synthesized maps
span game modes, densities, and lengths. These tests pin that every corpus
map (a) regenerates bit-identically (the checked-in files ARE the
generator's output), (b) tokenizes identically through the native C++ fast
path and the python path, and (c) parses identically to the REFERENCE
parser (differential, over the slider shim) for one map per mode.
"""
import os
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).parent.parent
CORPUS = REPO / "resources" / "perf_corpus"
sys.path.insert(0, str(REPO / "tools"))

MAPS = sorted(CORPUS.glob("*.osu"))


def test_corpus_present_and_diverse():
    assert len(MAPS) == 16
    text = {p: p.read_text() for p in MAPS}
    modes = {int(t.split("Mode: ")[1].split("\n")[0]) for t in text.values()}
    assert modes == {0, 1, 2, 3}


def test_generator_deterministic(tmp_path):
    from make_perf_corpus import build

    regen = build(tmp_path)
    for committed, fresh in zip(MAPS, sorted(regen)):
        assert committed.name == fresh.name
        assert committed.read_bytes() == fresh.read_bytes(), committed.name


@pytest.mark.parametrize("path", MAPS, ids=[p.stem for p in MAPS])
def test_native_python_tokenize_parity(path, monkeypatch):
    from cm3p_tpu.processing import CM3PProcessor

    def windows(native: bool):
        monkeypatch.setenv("CM3P_NATIVE_PARSE", "1" if native else "0")
        proc = CM3PProcessor()
        out = proc(
            beatmap=str(path), window_length_sec=16.0, window_stride_sec=16.0, padding="longest"
        )
        return np.asarray(out["input_ids"]), np.asarray(out["attention_mask"])

    ids_n, mask_n = windows(True)
    ids_p, mask_p = windows(False)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


@pytest.mark.parametrize(
    "name", ["std_dense", "taiko_mid", "catch_marathon", "mania_marathon_dense"]
)
def test_reference_parser_differential(name):
    """One corpus map per mode through the actual reference parser,
    compared with test_parser_parity's field-by-field group tuple."""
    pytest.importorskip("transformers")
    from tests import slider_shim

    slider_shim.install()
    sys.path.append("/root/reference")  # APPEND: reference modules (validate_dataset, train, config, ...) must never shadow ours
    try:
        from cm3p.parsing_cm3p import CM3PBeatmapParser as RefParser
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference parser unavailable: {e}")

    import slider

    from cm3p_tpu.beatmap import BeatmapEventParser
    from tests.test_parser_parity import _compare

    path = str(CORPUS / f"{name}.osu")
    ours = BeatmapEventParser().parse_beatmap(path)
    theirs = RefParser().parse_beatmap(slider.Beatmap.from_path(path))
    _compare(ours, theirs, name)
