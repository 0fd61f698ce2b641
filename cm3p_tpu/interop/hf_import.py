"""Import reference (HF/PyTorch) CM3P checkpoints into cm3p_tpu.

The state-dict mapping lives here (package side) so both the CLI converter
(``tools/convert_reference_checkpoint.py``) and :func:`cm3p_tpu.inference.
load_pretrained` (which auto-detects HF-layout directories) share it; the
inverse direction is :mod:`cm3p_tpu.interop.hf_export`.

Layout mapping (torch -> flax):
    *.encoder.embeddings.tok_embeddings.weight -> <tower>/tok_embeddings/embedding
    *.encoder.embeddings.norm.{weight,bias}    -> <tower>/embeddings_norm/{scale,bias}
    *.encoder.layers.N.attn.{Wqkv,Wo}.weight   -> transposed kernels
    *.encoder.layers.N.mlp.{Wi,Wo}.weight      -> transposed kernels
    beatmap_model.audio_encoder.conv{1,2}      -> (out,in,k) -> (k,in,out)
    {beatmap,metadata}_projection.weight       -> transposed kernel
    (cited: /root/reference/cm3p/modeling_cm3p.py + transformers ModernBertModel)
"""
from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_encoder(state: dict, prefix: str, out: dict, tower_path: list[str]) -> None:
    """Convert one ModernBertModel under ``prefix`` into ``tower_path``."""

    def t(name):
        return state.pop(prefix + name)

    _set(out, tower_path + ["tok_embeddings", "embedding"], t("embeddings.tok_embeddings.weight"))
    _set(out, tower_path + ["embeddings_norm", "LayerNorm_0", "scale"], t("embeddings.norm.weight"))
    if prefix + "embeddings.norm.bias" in state:
        _set(out, tower_path + ["embeddings_norm", "LayerNorm_0", "bias"], t("embeddings.norm.bias"))

    layer = 0
    while prefix + f"layers.{layer}.attn.Wqkv.weight" in state:
        lp = tower_path + [f"layers_{layer}"]
        if layer != 0:
            _set(out, lp + ["attn_norm", "LayerNorm_0", "scale"], t(f"layers.{layer}.attn_norm.weight"))
            if prefix + f"layers.{layer}.attn_norm.bias" in state:
                _set(out, lp + ["attn_norm", "LayerNorm_0", "bias"], t(f"layers.{layer}.attn_norm.bias"))
        _set(out, lp + ["attn", "Wqkv", "kernel"], t(f"layers.{layer}.attn.Wqkv.weight").T)
        if prefix + f"layers.{layer}.attn.Wqkv.bias" in state:
            _set(out, lp + ["attn", "Wqkv", "bias"], t(f"layers.{layer}.attn.Wqkv.bias"))
        _set(out, lp + ["attn", "Wo", "kernel"], t(f"layers.{layer}.attn.Wo.weight").T)
        if prefix + f"layers.{layer}.attn.Wo.bias" in state:
            _set(out, lp + ["attn", "Wo", "bias"], t(f"layers.{layer}.attn.Wo.bias"))
        _set(out, lp + ["mlp_norm", "LayerNorm_0", "scale"], t(f"layers.{layer}.mlp_norm.weight"))
        if prefix + f"layers.{layer}.mlp_norm.bias" in state:
            _set(out, lp + ["mlp_norm", "LayerNorm_0", "bias"], t(f"layers.{layer}.mlp_norm.bias"))
        _set(out, lp + ["mlp", "Wi", "kernel"], t(f"layers.{layer}.mlp.Wi.weight").T)
        if prefix + f"layers.{layer}.mlp.Wi.bias" in state:
            _set(out, lp + ["mlp", "Wi", "bias"], t(f"layers.{layer}.mlp.Wi.bias"))
        _set(out, lp + ["mlp", "Wo", "kernel"], t(f"layers.{layer}.mlp.Wo.weight").T)
        if prefix + f"layers.{layer}.mlp.Wo.bias" in state:
            _set(out, lp + ["mlp", "Wo", "bias"], t(f"layers.{layer}.mlp.Wo.bias"))
        layer += 1

    _set(out, tower_path + ["final_norm", "LayerNorm_0", "scale"], t("final_norm.weight"))
    if prefix + "final_norm.bias" in state:
        _set(out, tower_path + ["final_norm", "LayerNorm_0", "bias"], t("final_norm.bias"))


def convert_cm3p_state_dict(state: dict, tie_word_embeddings: bool = False) -> dict:
    """torch CM3PModel state_dict (numpy values) -> flax params dict."""
    state = dict(state)
    out: dict = {}

    # the dual-tower CM3PModel has both towers; flat MLM/classifier bundles
    # (CM3PForMaskedLM / CM3PForBeatmapClassification, base_model_prefix
    # "beatmap_model", modeling_cm3p.py:1139/1243) carry only the beatmap one
    if "metadata_model.encoder.embeddings.tok_embeddings.weight" in state:
        _convert_encoder(state, "metadata_model.encoder.", out, ["metadata_model"])
    if "beatmap_model.encoder.embeddings.tok_embeddings.weight" in state:
        _convert_encoder(state, "beatmap_model.encoder.", out, ["beatmap_model", "encoder"])

    if "beatmap_model.audio_encoder.conv1.weight" in state:
        ae = ["beatmap_model", "audio_encoder"]
        _set(out, ae + ["conv1", "kernel"], state.pop("beatmap_model.audio_encoder.conv1.weight").transpose(2, 1, 0))
        _set(out, ae + ["conv1", "bias"], state.pop("beatmap_model.audio_encoder.conv1.bias"))
        _set(out, ae + ["conv2", "kernel"], state.pop("beatmap_model.audio_encoder.conv2.weight").transpose(2, 1, 0))
        _set(out, ae + ["conv2", "bias"], state.pop("beatmap_model.audio_encoder.conv2.bias"))
        _convert_encoder(state, "beatmap_model.audio_encoder.encoder.", out, ae + ["encoder"])
        _set(
            out,
            ae + ["multi_modal_projector", "linear_1", "kernel"],
            state.pop("beatmap_model.audio_encoder.multi_modal_projector.linear_1.weight").T,
        )
        _set(
            out,
            ae + ["multi_modal_projector", "linear_2", "kernel"],
            state.pop("beatmap_model.audio_encoder.multi_modal_projector.linear_2.weight").T,
        )

    if "beatmap_projection.weight" in state:
        _set(out, ["beatmap_projection", "kernel"], state.pop("beatmap_projection.weight").T)
    if "metadata_projection.weight" in state:
        _set(out, ["metadata_projection", "kernel"], state.pop("metadata_projection.weight").T)
    if "logit_scale" in state:
        _set(out, ["logit_scale"], state.pop("logit_scale").reshape(()))

    # MLM / decoder heads
    if "head.dense.weight" in state:
        _set(out, ["head", "dense", "kernel"], state.pop("head.dense.weight").T)
        if "head.dense.bias" in state:
            _set(out, ["head", "dense", "bias"], state.pop("head.dense.bias"))
        _set(out, ["head", "norm", "LayerNorm_0", "scale"], state.pop("head.norm.weight"))
        if "head.norm.bias" in state:
            _set(out, ["head", "norm", "LayerNorm_0", "bias"], state.pop("head.norm.bias"))
    if tie_word_embeddings:
        # reference ties decoder.weight to the token embedding
        # (_tied_weights_keys); the table was already placed above, and HF
        # may omit the tied weight from the file entirely — the bias can
        # still be present on its own
        state.pop("decoder.weight", None)
        if "decoder.bias" in state:
            _set(out, ["decoder_bias"], state.pop("decoder.bias"))
    elif "decoder.weight" in state:
        _set(out, ["decoder", "kernel"], state.pop("decoder.weight").T)
        if "decoder.bias" in state:
            _set(out, ["decoder", "bias"], state.pop("decoder.bias"))
    if "classifier.weight" in state:
        _set(out, ["classifier", "kernel"], state.pop("classifier.weight").T)
        if "classifier.bias" in state:
            _set(out, ["classifier", "bias"], state.pop("classifier.bias"))

    leftover = [k for k in state if not k.endswith("position_ids")]
    if leftover:
        logger.warning("Unconverted reference weights: %s", leftover[:20])
    return {"params": out}


def load_torch_state(checkpoint: str) -> dict:
    """Load a torch/safetensors checkpoint into numpy arrays."""
    path = Path(checkpoint)
    state: dict = {}
    if path.is_dir():
        files = sorted(path.glob("*.safetensors")) or sorted(path.glob("pytorch_model*.bin"))
    else:
        files = [path]
    for f in files:
        if f.suffix == ".safetensors":
            from safetensors.numpy import load_file

            state.update(load_file(str(f)))
        else:
            import torch

            sd = torch.load(str(f), map_location="cpu", weights_only=True)
            state.update({k: v.numpy() for k, v in sd.items()})
    return state




def hf_config_to_cm3p(data: dict):
    """HF-layout ``config.json`` dict -> our config (unknown keys dropped).

    Returns a nested CM3PConfig for dual-tower bundles, or a flat
    BeatmapConfig for MLM/classifier bundles (reference ``config_class =
    CM3PBeatmapConfig``, modeling_cm3p.py:1138/1242).
    """
    import dataclasses

    from ..configs import AudioConfig, BeatmapConfig, CM3PConfig, MetadataConfig

    def pick(cls, d):
        known = {f.name for f in dataclasses.fields(cls)}
        return {k: v for k, v in d.items() if k in known}

    def beatmap_from(d: dict) -> BeatmapConfig:
        d = dict(d)
        ac = d.pop("audio_config", {}) or {}
        return BeatmapConfig(**{**pick(BeatmapConfig, d), "audio_config": AudioConfig(**pick(AudioConfig, ac))})

    if "beatmap_config" not in data and "metadata_config" not in data:
        # flat CM3PBeatmapConfig layout: the top level IS the beatmap config,
        # so the HF-top-level tie_word_embeddings lands in the right place
        return beatmap_from(data)

    bc = dict(data.get("beatmap_config", {}))
    # HF hoists tie_word_embeddings to the top level on export
    # (hf_export._DROP_KEYS); put it back where our config keeps it
    bc.setdefault("tie_word_embeddings", bool(data.get("tie_word_embeddings", False)))
    beatmap = beatmap_from(bc)
    metadata = MetadataConfig(**pick(MetadataConfig, data.get("metadata_config", {})))
    top = pick(CM3PConfig, {k: v for k, v in data.items() if k not in ("beatmap_config", "metadata_config")})
    return CM3PConfig(metadata_config=metadata, beatmap_config=beatmap, **top)


def load_hf_checkpoint(directory):
    """(config, flax params) from an HF-layout dir (reference or exported).

    The config is a CM3PConfig (dual-tower bundle) or a flat BeatmapConfig
    (MLM/classifier bundle) — dispatch on its type like
    ``inference.load_pretrained`` does.
    """
    import json
    from pathlib import Path

    directory = Path(directory)
    with open(directory / "config.json") as f:
        data = json.load(f)
    cfg = hf_config_to_cm3p(data)
    bc = getattr(cfg, "beatmap_config", cfg)
    state = load_torch_state(str(directory))
    params = convert_cm3p_state_dict(state, tie_word_embeddings=bc.tie_word_embeddings)
    import jax.numpy as jnp
    import jax

    return cfg, jax.tree.map(jnp.asarray, params)
