"""Tests for the YAML config composition system."""
import pytest

from cm3p_tpu.utils.config import apply_overrides, deep_merge, load_config


@pytest.fixture
def config_dir(tmp_path):
    train = tmp_path / "train"
    model = tmp_path / "model"
    train.mkdir()
    model.mkdir()
    (model / "base.yaml").write_text("hidden: 64\nlayers: 2\n")
    (train / "default.yaml").write_text(
        "defaults:\n  - model: base\n"
        "lr: 1.0e-4\nsteps: 100\n"
        "nested:\n  a: 1\n  b: 2\n"
        "dataset:\n  rate: 16000\n  other: ${dataset.rate}\n"
    )
    (train / "child.yaml").write_text(
        "defaults:\n  - default\n"
        "lr: 2.0e-4\nnested:\n  b: 3\n"
        "model:\n  layers: 4\n"
    )
    return train


class TestConfigSystem:
    def test_defaults_chain_and_override(self, config_dir):
        cfg = load_config(config_dir, "child")
        assert cfg["lr"] == 2.0e-4  # child overrides
        assert cfg["steps"] == 100  # inherited
        assert cfg["nested"] == {"a": 1, "b": 3}  # deep merge
        assert cfg["model"] == {"hidden": 64, "layers": 4}  # cross-group + override

    def test_interpolation(self, config_dir):
        cfg = load_config(config_dir, "default")
        assert cfg["dataset"]["other"] == 16000

    def test_cli_overrides(self, config_dir):
        cfg = load_config(config_dir, "default", ["nested.a=9", "lr=5e-5", "dataset.flag=true", 'name="x"'])
        assert cfg["nested"]["a"] == 9
        assert cfg["lr"] == 5e-5
        assert cfg["dataset"]["flag"] is True
        assert cfg["name"] == "x"

    def test_yaml_sci_notation_parses_as_float(self, config_dir):
        cfg = load_config(config_dir, "default")
        assert isinstance(cfg["lr"], float)

    def test_deep_merge(self):
        assert deep_merge({"a": {"x": 1}, "b": 2}, {"a": {"y": 3}}) == {"a": {"x": 1, "y": 3}, "b": 2}

    def test_apply_overrides_creates_paths(self):
        cfg = apply_overrides({}, ["a.b.c=[1,2]"])
        assert cfg == {"a": {"b": {"c": [1, 2]}}}

    def test_real_lineage_composes(self):
        """Every shipped training config must compose cleanly."""
        from pathlib import Path

        train_dir = Path(__file__).parent.parent / "configs" / "train"
        for name in ("default", "v1", "v2", "v3", "v4", "v5", "v6", "v6_1", "v6_mask", "v7", "v7_classifier", "v8_packed", "smoke", "finetune_reference"):
            cfg = load_config(train_dir, name)
            assert "training" in cfg and "processor" in cfg and "dataset" in cfg, name
            assert isinstance(cfg["model"]["metadata_config"]["norm_eps"], float), name
            # the composed dict must construct valid model configs
            from cm3p_tpu.configs import BeatmapConfig, MetadataConfig

            BeatmapConfig(**cfg["model"]["beatmap_config"])
            MetadataConfig(**cfg["model"]["metadata_config"])


def test_now_interpolation_makes_timestamped_dirs():
    """${now:FMT} resolves to a strftime of load time — the counterpart of
    hydra's per-run output dir (reference configs chdir to logs/date/time)."""
    import re

    from cm3p_tpu.utils.config import _resolve_interpolations

    out = _resolve_interpolations({"output_dir": "${now:logs/%Y-%m-%d/%H-%M-%S}"})
    assert re.fullmatch(r"logs/\d{4}-\d{2}-\d{2}/\d{2}-\d{2}-\d{2}", out["output_dir"])
