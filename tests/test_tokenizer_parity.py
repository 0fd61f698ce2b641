"""Tokenizer parity vs the reference HF tokenizers.

Imports the reference ``CM3PBeatmapTokenizer`` / ``CM3PMetadataTokenizer``
(stubbing the ``slider`` package the reference's parsing module needs) and
asserts bit-identical vocabularies and token-id sequences for the same
inputs — the hardest guarantee that converted checkpoints see the same
token streams.
"""
import sys

import numpy as np
import pytest

pytest.importorskip("transformers")

# install the functional slider shim before the reference package imports it
from tests import slider_shim

slider_shim.install()

sys.path.append("/root/reference")  # APPEND: reference modules (validate_dataset, train, config, ...) must never shadow ours

try:
    from cm3p.parsing_cm3p import EventType as RefEventType, Group as RefGroup
    from cm3p.tokenization_cm3p import (
        CM3PBeatmapTokenizer as RefBeatmapTokenizer,
        CM3PMetadataTokenizer as RefMetadataTokenizer,
    )
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference tokenizers unavailable: {e}", allow_module_level=True)

from cm3p_tpu.beatmap import BeatmapEventParser, load_beatmap
from cm3p_tpu.tokenize import BeatmapTokenizer, MetadataTokenizer

REF_EVENT_BY_VALUE = {e.value: e for e in RefEventType}


def to_ref_groups(groups):
    return [
        RefGroup(
            event_type=REF_EVENT_BY_VALUE[g.event_type.value],
            time=g.time,
            has_time=g.has_time,
            snapping=g.snapping,
            distance=g.distance,
            x=g.x,
            y=g.y,
            mania_column=g.mania_column,
            new_combo=g.new_combo,
            hitsounds=list(g.hitsounds),
            samplesets=list(g.samplesets),
            additions=list(g.additions),
            volumes=list(g.volumes),
            scroll_speed=g.scroll_speed,
        )
        for g in groups
    ]


TOKENIZER_VARIANTS = [
    dict(),
    dict(separate_new_combo_token=False, add_cls_token=True),
    dict(position_split_axes=False, max_time=16000),
]


class TestBeatmapTokenizerParity:
    @pytest.mark.parametrize("kwargs", TOKENIZER_VARIANTS)
    def test_vocab_identical(self, kwargs):
        ref = RefBeatmapTokenizer(**kwargs)
        ours = BeatmapTokenizer(**kwargs)
        assert ours.get_vocab() == ref.get_vocab()
        assert ours.vocab_size == ref.vocab_size
        assert ours.pad_token_id == ref.pad_token_id
        assert ours.audio_token_id == ref.convert_tokens_to_ids(ref.audio_token)

    @pytest.mark.parametrize("kwargs", TOKENIZER_VARIANTS)
    def test_token_ids_identical_on_real_beatmap(self, kwargs, beatmap_path):
        parser = BeatmapEventParser()
        groups = parser.parse_beatmap(load_beatmap(beatmap_path))
        window = [g for g in groups if g.time < 30000]

        ref = RefBeatmapTokenizer(**kwargs)
        ours = BeatmapTokenizer(**kwargs)

        ref_enc = ref(to_ref_groups(window), window_start_ms=0, num_audio_tokens=7, return_tensors=None)
        our_ids = ours._encode_single(window, window_start_ms=0, num_audio_tokens=7)
        assert list(ref_enc["input_ids"]) == list(our_ids)

    def test_batch_padding_matches(self, beatmap_path):
        parser = BeatmapEventParser()
        groups = parser.parse_beatmap(load_beatmap(beatmap_path))
        w1 = [g for g in groups if g.time < 10000]
        w2 = [g for g in groups if 10000 <= g.time < 30000]

        ref = RefBeatmapTokenizer()
        ours = BeatmapTokenizer()
        ref_enc = ref(
            [to_ref_groups(w1), to_ref_groups(w2)],
            window_start_ms=[0, 10000],
            num_audio_tokens=[3, 3],
            return_tensors=None,
        )
        our_enc = ours([w1, w2], window_start_ms=[0, 10000], num_audio_tokens=[3, 3])
        ref_ids = [list(x) for x in ref_enc["input_ids"]]
        # HF pads with pad_token_id on the right, like ours
        for i in range(2):
            np.testing.assert_array_equal(our_enc.input_ids[i][: len(ref_ids[i])], ref_ids[i])


METADATA_KW = dict(
    modes={0: "osu", 1: "taiko", 2: "fruits", 3: "mania"},
    statuses={1: "ranked", 4: "loved", -2: "graveyard"},
    mappers={0: "OliBomby", 1: "Cookiezi", 2: "peppy"},
    tags={1: {"name": "jump"}, 2: {"name": "stream"}, 3: {"name": "tech"}},
)

METADATA_SAMPLES = [
    {},
    {
        "difficulty": 5.34,
        "year": 2015,
        "mode": "mania",
        "status": "ranked",
        "mapper": "peppy",
        "cs": 7.0,
        "hitsounded": True,
        "song_length": 123,
        "song_position": 0.512,
        "global_sv": 1.4,
        "mania_keycount": 7,
        "hold_note_ratio": 0.25,
        "scroll_speed_ratio": 0.77,
        "tags": ["jump", 2],
    },
    {"difficulty": 99.0, "year": 1990, "mode": 9, "mapper": "nobody", "cs": -3},
    {"year": 2023, "status": 4, "mapper": 2, "tags": [3, "unknown_tag"]},
]


class TestMetadataTokenizerParity:
    def test_vocab_identical(self):
        ref = RefMetadataTokenizer(**METADATA_KW)
        ours = MetadataTokenizer(**METADATA_KW)
        assert ours.get_vocab() == ref.get_vocab()
        assert ours.vocab_size == ref.vocab_size

    @pytest.mark.parametrize("sample", METADATA_SAMPLES)
    def test_token_ids_identical(self, sample):
        ref = RefMetadataTokenizer(**METADATA_KW)
        ours = MetadataTokenizer(**METADATA_KW)
        ref_ids = list(ref(dict(sample), return_tensors=None)["input_ids"])
        our_ids = list(ours(dict(sample)).input_ids[0])
        assert ref_ids == our_ids
