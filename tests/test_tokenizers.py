"""Tokenizer tests: vocab construction, quantization, batching, variations."""
import numpy as np
import pytest

from cm3p_tpu.beatmap import BeatmapEventParser, EventType, Group
from cm3p_tpu.tokenize import BeatmapTokenizer, MetadataTokenizer, merge_metadata_dicts


@pytest.fixture(scope="module")
def bt() -> BeatmapTokenizer:
    return BeatmapTokenizer()


@pytest.fixture(scope="module")
def mt() -> MetadataTokenizer:
    return MetadataTokenizer(
        modes={0: "osu", 1: "taiko", 2: "fruits", 3: "mania"},
        statuses={1: "ranked", 4: "loved", -2: "graveyard"},
        mappers={0: "OliBomby", 1: "Cookiezi", 2: "peppy"},
        tags={1: {"name": "jump"}, 2: {"name": "stream"}, 3: {"name": "tech"}},
    )


class TestBeatmapTokenizer:
    def test_default_vocab_size(self, bt):
        # 23 events + 3001 time shifts + 17 snappings + 641 distances
        # + 257 pos_x + 225 pos_y + 18 mania + 1001 scroll + 1 new_combo
        # + 72 hitsounds + 101 volumes = 5357 base + 10 specials
        assert len(bt.vocab) == 5357
        assert bt.vocab_size == 5367

    def test_special_tokens_after_base_vocab(self, bt):
        assert bt.convert_tokens_to_ids("[BOS]") == 5357
        assert bt.convert_tokens_to_ids("[AUDIO]") == 5366
        assert bt.pad_token_id == 5361

    def test_event_tokens_first(self, bt):
        assert bt.vocab["[CIRCLE]"] == 0
        assert bt.vocab["[DENDEN_END]"] == 22

    def test_time_shift_quantization(self, bt):
        # the quantizers emit vocab ids directly (encode_groups is the
        # authoritative serializer); assert via the inverse vocab
        tok = lambda i: bt.convert_ids_to_tokens(i)
        assert tok(bt._tokenize_time_shift(123)) == "[TIME_SHIFT_120]"
        assert tok(bt._tokenize_time_shift(125)) == "[TIME_SHIFT_120]"  # banker's rounding
        assert tok(bt._tokenize_time_shift(126)) == "[TIME_SHIFT_130]"
        assert tok(bt._tokenize_time_shift(-50)) == "[TIME_SHIFT_0]"
        assert tok(bt._tokenize_time_shift(99999)) == "[TIME_SHIFT_30000]"

    def test_position_quantization(self, bt):
        toks = bt.convert_ids_to_tokens(list(bt._tokenize_position(101, 1000)))
        assert toks == ["[POS_X_100]", "[POS_Y_640]"]

    def test_encode_groups_matches_string_path(self, bt):
        g = Group(
            event_type=EventType.CIRCLE, time=720, has_time=True, snapping=4,
            distance=100, x=256, y=192, new_combo=True,
            hitsounds=[2], samplesets=[1], additions=[2], volumes=[50],
        )
        ids = bt.encode_groups([g], window_start_ms=500)
        assert bt.convert_tokens_to_ids(bt.tokenize_groups([g], window_start_ms=500)) == ids

    def test_hitsound_tokens(self, bt):
        assert bt.convert_ids_to_tokens(bt._tokenize_hitsound(14, 2, 3)) == "[HITSOUND_14_2_3]"
        assert bt.convert_ids_to_tokens(bt._tokenize_hitsound(1, 0, 9)) == "[HITSOUND_0_1_3]"

    def test_group_serialization(self, bt):
        g = Group(
            event_type=EventType.CIRCLE,
            time=1000,
            has_time=True,
            snapping=4,
            distance=100,
            x=256,
            y=192,
            new_combo=True,
            hitsounds=[2],
            samplesets=[1],
            additions=[2],
            volumes=[50],
        )
        tokens = bt.tokenize_groups([g], window_start_ms=500)
        assert tokens == [
            "[BOS]",
            "[CIRCLE]",
            "[TIME_SHIFT_500]",
            "[SNAPPING_4]",
            "[DISTANCE_100]",
            "[POS_X_256]",
            "[POS_Y_192]",
            "[NEW_COMBO]",
            "[HITSOUND_2_1_2]",
            "[VOLUME_50]",
            "[EOS]",
        ]

    def test_audio_token_prefix(self, bt):
        g = Group(event_type=EventType.BEAT, time=0, has_time=True)
        ids = bt._encode_single([g], num_audio_tokens=3)
        tokens = bt.convert_ids_to_tokens(ids)
        assert tokens[:5] == ["[AUDIO_BOS]", "[AUDIO]", "[AUDIO]", "[AUDIO]", "[AUDIO_EOS]"]

    def test_batch_padding_longest(self, bt):
        g1 = [Group(event_type=EventType.BEAT, time=0, has_time=True)]
        g2 = [Group(event_type=EventType.BEAT, time=t, has_time=True) for t in (0, 100, 200)]
        enc = bt([g1, g2])
        assert enc.input_ids.shape == enc.attention_mask.shape
        assert enc.input_ids.shape[0] == 2
        assert enc.attention_mask[0].sum() < enc.attention_mask[1].sum()
        assert enc.input_ids[0, -1] == bt.pad_token_id

    def test_max_length_padding_and_truncation(self, bt):
        g = [Group(event_type=EventType.BEAT, time=t, has_time=True) for t in range(0, 1000, 10)]
        enc = bt([g], padding="max_length", max_length=64)
        assert enc.input_ids.shape == (1, 64)
        assert enc.attention_mask.sum() == 64

    def test_save_load_round_trip(self, bt, tmp_path):
        bt.save_pretrained(tmp_path)
        restored = BeatmapTokenizer.from_pretrained(tmp_path)
        assert restored.get_vocab() == bt.get_vocab()
        assert restored.vocab_size == bt.vocab_size

    def test_new_combo_merged_token_mode(self):
        bt2 = BeatmapTokenizer(separate_new_combo_token=False)
        assert "[CIRCLE_NEW_COMBO]" in bt2.vocab
        assert "[NEW_COMBO]" not in bt2.vocab
        g = Group(event_type=EventType.CIRCLE, time=0, has_time=True, new_combo=True)
        tokens = bt2.tokenize_groups([g])
        assert tokens[1] == "[CIRCLE_NEW_COMBO]"


class TestMetadataTokenizer:
    def test_fixed_field_order(self, mt):
        tokens = mt.tokenize_metadata({})
        assert tokens[0] == "[BOS]" and tokens[-1] == "[EOS]"
        assert tokens[1:-1] == [
            "[DIFFICULTY_UNK]",
            "[YEAR_UNK]",
            "[MODE_UNK]",
            "[STATUS_UNK]",
            "[MAPPER_UNK]",
            "[CS_UNK]",
            "[HITSOUNDED_UNK]",
            "[SONG_LENGTH_UNK]",
            "[SONG_POSITION_UNK]",
            "[GLOBAL_SV_UNK]",
            "[MANIA_KEYCOUNT_UNK]",
            "[HOLD_NOTE_RATIO_UNK]",
            "[SCROLL_SPEED_RATIO_UNK]",
            "[TAG_UNK]",
        ]

    def test_full_metadata(self, mt):
        m = {
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
        }
        tokens = mt.tokenize_metadata(m)
        assert "[DIFFICULTY_5.3]" in tokens
        assert "[YEAR_2015]" in tokens
        assert "[MODE_mania]" in tokens
        assert "[STATUS_ranked]" in tokens
        assert "[MAPPER_2]" in tokens
        assert "[SONG_LENGTH_120]" in tokens
        assert "[SONG_POSITION_0.51]" in tokens
        assert "[MANIA_KEYCOUNT_7]" in tokens
        assert "[HOLD_NOTE_RATIO_0.2]" in tokens  # banker's rounding of 2.5
        assert "[SCROLL_SPEED_RATIO_0.8]" in tokens
        assert "[TAG_jump]" in tokens and "[TAG_stream]" in tokens

    def test_mode_by_id(self, mt):
        assert mt._tokenize_mode({"mode": 3}) == "[MODE_mania]"
        assert mt._tokenize_mode({"mode": 9}) == "[MODE_UNK]"

    def test_variations_classes(self, mt):
        m = {
            "year": 2015,
            "status": "ranked",
            "mapper": "peppy",
            "tags": ["jump", "stream"],
        }
        pairs = list(mt.metadata_variations(m, 100, rng=np.random.default_rng(0)))
        classes = [c for _, c in pairs]
        assert 1 in classes and 2 in classes and 3 in classes and 4 in classes
        # year variations exclude the original year
        year_vars = [v for v, c in pairs if c == 1]
        assert all(v["year"] != 2015 for v in year_vars)
        # status variations exclude the original status
        status_vars = [v for v, c in pairs if c == 2]
        assert all(v["status"] != "ranked" for v in status_vars)
        # exhausted workers pad with empty metadata class -1
        assert classes[-1] == -1
        assert pairs[-1][0] == {}

    def test_variations_round_robin(self, mt):
        m = {"year": 2015, "status": "ranked", "mapper": "peppy", "tags": ["jump"]}
        pairs = list(mt.metadata_variations(m, 8, rng=np.random.default_rng(0)))
        # first four items cycle through the four workers
        assert [c for _, c in pairs[:4]] == [1, 2, 3, 4]

    def test_variations_do_not_alias_base_or_each_other(self, mt):
        # variations are shallow copies for speed — the mutable tags list
        # must still be independent per variation (and of the base metadata)
        m = {"year": 2015, "status": "ranked", "mapper": "peppy", "tags": ["jump", "stream"]}
        pairs = list(mt.metadata_variations(m, 60, rng=np.random.default_rng(0)))
        tag_vars = [v for v, c in pairs if c == 3]
        assert len(tag_vars) >= 2
        before = [list(v["tags"]) for v in tag_vars]
        tag_vars[0]["tags"].append("__mutated__")
        assert m["tags"] == ["jump", "stream"]
        assert [list(v["tags"]) for v in tag_vars[1:]] == before[1:]
        # non-tag variations share the (unmutated) base tags by identity or
        # value — either way their contents must equal the base
        for v, c in pairs:
            if c in (1, 2, 4):
                assert v["tags"] == ["jump", "stream"]

    def test_batch_encoding_shapes(self, mt):
        enc = mt([{}, {"year": 2010}], padding="max_length", max_length=32)
        assert enc.input_ids.shape == (2, 32)
        assert enc.attention_mask[:, :16].all()

    def test_save_load_round_trip(self, mt, tmp_path):
        mt.save_pretrained(tmp_path)
        restored = MetadataTokenizer.from_pretrained(tmp_path)
        assert restored.get_vocab() == mt.get_vocab()
        assert restored.tag_names_to_ids == mt.tag_names_to_ids

    def test_merge_metadata(self):
        m1 = {"year": 2010, "mode": None}
        m2 = {"year": 2020, "mode": "osu", "cs": 4.0}
        merged = merge_metadata_dicts(m1, m2)
        assert merged["year"] == 2010  # m1 wins when set
        assert merged["mode"] == "osu"  # m2 fills None
        assert merged["cs"] == 4.0


class TestEncodeVariations:
    """The base-splice fast path must be id-identical to expanding the
    variation dicts and re-tokenizing each in full (same rng stream)."""

    CASES = [
        {"year": 2015, "status": "ranked", "mapper": "peppy", "tags": ["jump", "stream"],
         "difficulty": 5.25, "mode": 0, "cs": 4.2, "hitsounded": True,
         "song_length": 213.0, "song_position": 0.4, "global_sv": 1.4},
        {"year": 2015, "status": "ranked", "mapper": "peppy", "tags": ["jump"]},
        {"status": "loved", "tags": ["tech", "jump", "stream"]},  # no year/mapper workers
        {"year": 2010, "mapper": "nobody-known", "tags": []},      # unknown mapper, empty tags
        {"mode": 3, "mania_keycount": 7, "hold_note_ratio": 0.35, "scroll_speed_ratio": 0.8},
        {},                                                         # all workers empty -> all -1 pads
    ]

    @pytest.mark.parametrize("case", range(len(CASES)))
    @pytest.mark.parametrize("seed", [0, 7])
    @pytest.mark.parametrize("v", [5, 64])
    def test_matches_full_tokenize(self, mt, case, seed, v):
        md = dict(self.CASES[case])
        if "tags" in md:
            md["tags"] = list(md["tags"])
        pairs = list(mt.metadata_variations(md, v, rng=np.random.default_rng(seed)))
        slow = [mt.convert_tokens_to_ids(mt.tokenize_metadata(md))]
        slow += [mt.convert_tokens_to_ids(mt.tokenize_metadata(m)) for m, _ in pairs]
        fast, classes = mt.encode_variations(md, v, rng=np.random.default_rng(seed))
        assert classes == [0] + [c for _, c in pairs]
        assert fast == slow

    def test_with_cls_token(self):
        mt_cls = MetadataTokenizer(
            modes={0: "osu"}, statuses={1: "ranked", 4: "loved"},
            mappers={0: "OliBomby", 1: "peppy"}, tags={1: {"name": "jump"}, 2: {"name": "stream"}},
            add_cls_token=True,
        )
        md = {"year": 2015, "status": "ranked", "mapper": "peppy", "tags": ["jump"]}
        pairs = list(mt_cls.metadata_variations(md, 32, rng=np.random.default_rng(3)))
        slow = [mt_cls.convert_tokens_to_ids(mt_cls.tokenize_metadata(md))]
        slow += [mt_cls.convert_tokens_to_ids(mt_cls.tokenize_metadata(m)) for m, _ in pairs]
        fast, _ = mt_cls.encode_variations(md, 32, rng=np.random.default_rng(3))
        assert fast == slow

    def test_processor_fast_path_matches_manual_expansion(self):
        from cm3p_tpu.processing import CM3PProcessor

        proc = CM3PProcessor()
        proc.metadata_tokenizer = MetadataTokenizer(
            modes={0: "osu"}, statuses={1: "ranked", 4: "loved"},
            mappers={0: "OliBomby", 1: "peppy"}, tags={1: {"name": "jump"}, 2: {"name": "stream"}},
        )
        mt = proc.metadata_tokenizer
        md = [{"year": 2012, "status": "ranked", "mapper": "peppy", "tags": ["jump"]},
              {"year": 2020, "status": "loved", "mapper": "OliBomby", "tags": ["stream", "jump"]}]
        proc.rng = np.random.default_rng(11)
        out = proc(metadata=[dict(m) for m in md], metadata_variations=9)
        # manual slow expansion with the same rng stream
        rng = np.random.default_rng(11)
        expanded, classes = [], []
        for m in md:
            pairs = list(mt.metadata_variations(m, 8, rng=rng))
            expanded.append(m); expanded.extend(p[0] for p in pairs)
            classes.append([0] + [p[1] for p in pairs])
        enc = mt(expanded)
        # metadata-only call: the processor returns the metadata encoding
        # directly under input_ids/attention_mask keys
        np.testing.assert_array_equal(
            out["input_ids"], enc["input_ids"].reshape(2, 9, -1))
        np.testing.assert_array_equal(
            out["attention_mask"], enc["attention_mask"].reshape(2, 9, -1))
        np.testing.assert_array_equal(
            out["metadata_variation_classes"], np.asarray(classes, np.int32))
