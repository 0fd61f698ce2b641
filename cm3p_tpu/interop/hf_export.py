"""Export cm3p_tpu checkpoints as reference-loadable HF bundles.

The reverse of ``tools/convert_reference_checkpoint.py``: our flax param
pytree becomes an HF-layout ``model.safetensors`` + ``config.json`` that the
*reference* PyTorch stack loads directly —
``cm3p.modeling_cm3p.CM3PModel.from_pretrained(out_dir)`` — so models trained
here can re-enter the ecosystem the reference's users live in
(``/root/reference/push_to_hub.py:77-98`` publishes exactly this layout).

``config.json`` carries the reference's nested composition
(``configuration_cm3p.py:289-335``: metadata_config / beatmap_config /
audio_config) plus ``auto_map`` entries so a hub copy of the reference's
dynamic modules resolves via ``trust_remote_code=True``
(``processing_cm3p.py:659-762`` semantics). No reference code is copied —
the bundle references the classes by module name.

Weight-name mapping (flax -> torch), inverse of
convert_reference_checkpoint.py:
    <tower>/tok_embeddings/embedding        -> *.embeddings.tok_embeddings.weight
    <tower>/embeddings_norm/LayerNorm_0     -> *.embeddings.norm.{weight,bias}
    <tower>/layers_N/{attn,mlp}/...kernel   -> *.layers.N....weight (transposed)
    audio conv kernels (k, in, out)         -> (out, in, k)
    projections / logit_scale / heads       -> top-level names
"""
from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Union

import numpy as np

__all__ = ["flax_to_hf_state_dict", "hf_config_dict", "export_hf_checkpoint", "default_architecture"]


def _get(tree: dict, path: list[str]):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _export_encoder(tree: dict, tower_path: list[str], prefix: str, out: dict) -> None:
    """One ModernBertEncoder subtree -> HF ``prefix``-named tensors."""
    tower = _get(tree, tower_path)
    if tower is None:
        return
    if "tok_embeddings" in tower:
        out[prefix + "embeddings.tok_embeddings.weight"] = _np(tower["tok_embeddings"]["embedding"])
    else:
        # the audio encoder consumes inputs_embeds only, so our flax init
        # never materializes its (vocab=1, hidden) embedding table; the
        # reference model still instantiates it — synthesize zeros
        hidden = int(np.asarray(tower["final_norm"]["LayerNorm_0"]["scale"]).shape[0])
        out[prefix + "embeddings.tok_embeddings.weight"] = np.zeros((1, hidden), np.float32)
    emb_norm = tower["embeddings_norm"]["LayerNorm_0"]
    out[prefix + "embeddings.norm.weight"] = _np(emb_norm["scale"])
    if "bias" in emb_norm:
        out[prefix + "embeddings.norm.bias"] = _np(emb_norm["bias"])

    layer = 0
    while f"layers_{layer}" in tower:
        lp = tower[f"layers_{layer}"]
        hf = f"{prefix}layers.{layer}."
        if layer != 0 and "attn_norm" in lp:
            out[hf + "attn_norm.weight"] = _np(lp["attn_norm"]["LayerNorm_0"]["scale"])
            if "bias" in lp["attn_norm"]["LayerNorm_0"]:
                out[hf + "attn_norm.bias"] = _np(lp["attn_norm"]["LayerNorm_0"]["bias"])
        for ours, theirs in [("Wqkv", "attn.Wqkv"), ("Wo", "attn.Wo")]:
            out[hf + theirs + ".weight"] = _np(lp["attn"][ours]["kernel"]).T
            if "bias" in lp["attn"][ours]:
                out[hf + theirs + ".bias"] = _np(lp["attn"][ours]["bias"])
        out[hf + "mlp_norm.weight"] = _np(lp["mlp_norm"]["LayerNorm_0"]["scale"])
        if "bias" in lp["mlp_norm"]["LayerNorm_0"]:
            out[hf + "mlp_norm.bias"] = _np(lp["mlp_norm"]["LayerNorm_0"]["bias"])
        for ours, theirs in [("Wi", "mlp.Wi"), ("Wo", "mlp.Wo")]:
            out[hf + theirs + ".weight"] = _np(lp["mlp"][ours]["kernel"]).T
            if "bias" in lp["mlp"][ours]:
                out[hf + theirs + ".bias"] = _np(lp["mlp"][ours]["bias"])
        layer += 1

    out[prefix + "final_norm.weight"] = _np(tower["final_norm"]["LayerNorm_0"]["scale"])
    if "bias" in tower["final_norm"]["LayerNorm_0"]:
        out[prefix + "final_norm.bias"] = _np(tower["final_norm"]["LayerNorm_0"]["bias"])


def flax_to_hf_state_dict(params: dict, tie_word_embeddings: bool = False) -> dict:
    """Our ``{'params': ...}`` pytree -> reference CM3PModel state dict (numpy)."""
    tree = params.get("params", params)
    out: dict = {}

    _export_encoder(tree, ["metadata_model"], "metadata_model.encoder.", out)
    _export_encoder(tree, ["beatmap_model", "encoder"], "beatmap_model.encoder.", out)

    ae = _get(tree, ["beatmap_model", "audio_encoder"])
    if ae is not None:
        out["beatmap_model.audio_encoder.conv1.weight"] = _np(ae["conv1"]["kernel"]).transpose(2, 1, 0)
        out["beatmap_model.audio_encoder.conv1.bias"] = _np(ae["conv1"]["bias"])
        out["beatmap_model.audio_encoder.conv2.weight"] = _np(ae["conv2"]["kernel"]).transpose(2, 1, 0)
        out["beatmap_model.audio_encoder.conv2.bias"] = _np(ae["conv2"]["bias"])
        _export_encoder(tree, ["beatmap_model", "audio_encoder", "encoder"], "beatmap_model.audio_encoder.encoder.", out)
        mmp = ae["multi_modal_projector"]
        out["beatmap_model.audio_encoder.multi_modal_projector.linear_1.weight"] = _np(mmp["linear_1"]["kernel"]).T
        out["beatmap_model.audio_encoder.multi_modal_projector.linear_2.weight"] = _np(mmp["linear_2"]["kernel"]).T

    if "beatmap_projection" in tree:
        out["beatmap_projection.weight"] = _np(tree["beatmap_projection"]["kernel"]).T
    if "metadata_projection" in tree:
        out["metadata_projection.weight"] = _np(tree["metadata_projection"]["kernel"]).T
    if "logit_scale" in tree:
        out["logit_scale"] = _np(tree["logit_scale"]).reshape(())

    # decoder / MLM head (has_decoder_head or ForMaskedLM exports)
    if "head" in tree:
        out["head.dense.weight"] = _np(tree["head"]["dense"]["kernel"]).T
        if "bias" in tree["head"]["dense"]:
            out["head.dense.bias"] = _np(tree["head"]["dense"]["bias"])
        out["head.norm.weight"] = _np(tree["head"]["norm"]["LayerNorm_0"]["scale"])
        if "bias" in tree["head"]["norm"]["LayerNorm_0"]:
            out["head.norm.bias"] = _np(tree["head"]["norm"]["LayerNorm_0"]["bias"])
    if "decoder" in tree:
        out["decoder.weight"] = _np(tree["decoder"]["kernel"]).T
        if "bias" in tree["decoder"]:
            out["decoder.bias"] = _np(tree["decoder"]["bias"])
    elif "decoder_bias" in tree:
        # tied decoder: weight IS the beatmap token embedding
        emb = out.get("beatmap_model.encoder.embeddings.tok_embeddings.weight")
        if emb is not None and tie_word_embeddings:
            out["decoder.weight"] = emb
        out["decoder.bias"] = _np(tree["decoder_bias"])
    if "classifier" in tree:
        out["classifier.weight"] = _np(tree["classifier"]["kernel"]).T
        if "bias" in tree["classifier"]:
            out["classifier.bias"] = _np(tree["classifier"]["bias"])
    return out


_DROP_KEYS = {"tie_word_embeddings"}  # handled at the top level by HF


def _encoder_dict(cfg, extra_drop=()) -> dict:
    d = {k: v for k, v in dataclasses.asdict(cfg).items() if k not in _DROP_KEYS and k not in extra_drop}
    return d


def default_architecture(cfg) -> str:
    """The reference class that loads a checkpoint of this config type.

    Mirrors ``inference.load_pretrained``'s native dispatch: nested
    CM3PConfig -> CM3PModel; flat BeatmapConfig -> classifier when a label
    head is configured, else MaskedLM (modeling_cm3p.py:1137/1241).
    """
    if hasattr(cfg, "beatmap_config"):
        return "CM3PModel"
    if getattr(cfg, "num_labels", 0) > 0 and getattr(cfg, "problem_type", None):
        return "CM3PForBeatmapClassification"
    return "CM3PForMaskedLM"


def hf_config_dict(cfg, architecture: str = "CM3PModel", include_auto_map: bool = True) -> dict:
    """Reference-compatible ``config.json`` payload.

    Accepts either our nested CM3PConfig (-> ``model_type: CM3P``) or a flat
    BeatmapConfig from an MLM/classifier artifact (-> ``model_type:
    CM3PBeatmap``, the reference's CM3PBeatmapConfig layout,
    configuration_cm3p.py:178-179).
    """
    if not hasattr(cfg, "beatmap_config"):
        flat = _encoder_dict(cfg, extra_drop=("audio_config",))
        flat["audio_config"] = _encoder_dict(cfg.audio_config)
        flat["audio_config"]["model_type"] = "CM3PAudio"
        flat["model_type"] = "CM3PBeatmap"
        flat["architectures"] = [architecture]
        flat["torch_dtype"] = "float32"
        # the tie flag is top-level HF convention; for a flat config the top
        # level IS the beatmap config, so restore what _DROP_KEYS removed
        flat["tie_word_embeddings"] = bool(getattr(cfg, "tie_word_embeddings", False))
        if include_auto_map:
            auto_model_key = {
                "CM3PForMaskedLM": "AutoModelForMaskedLM",
                "CM3PForBeatmapClassification": "AutoModelForSequenceClassification",
            }.get(architecture, "AutoModel")
            flat["auto_map"] = {
                "AutoConfig": "configuration_cm3p.CM3PBeatmapConfig",
                auto_model_key: "modeling_cm3p." + architecture,
            }
        return flat
    beatmap = _encoder_dict(cfg.beatmap_config, extra_drop=("audio_config",))
    beatmap["audio_config"] = _encoder_dict(cfg.beatmap_config.audio_config)
    beatmap["model_type"] = "CM3PBeatmap"
    beatmap["audio_config"]["model_type"] = "CM3PAudio"
    metadata = _encoder_dict(cfg.metadata_config)
    metadata["model_type"] = "CM3PMetadata"
    out = {
        "model_type": "CM3P",
        "architectures": [architecture],
        "projection_dim": cfg.projection_dim,
        "logit_scale_init_value": cfg.logit_scale_init_value,
        "initializer_factor": cfg.initializer_factor,
        "initializer_range": cfg.initializer_range,
        "has_decoder_head": cfg.has_decoder_head,
        "metadata_config": metadata,
        "beatmap_config": beatmap,
        "torch_dtype": "float32",
    }
    if include_auto_map:
        out["auto_map"] = {
            "AutoConfig": "configuration_cm3p.CM3PConfig",
            "AutoModel": "modeling_cm3p." + architecture,
        }
    return out


def export_hf_checkpoint(
    params: dict,
    cfg,
    out_dir: Union[str, Path],
    architecture: Optional[str] = None,
    tie_word_embeddings: Optional[bool] = None,
) -> Path:
    """Write ``config.json`` + ``model.safetensors`` loadable by the reference.

    ``cfg`` may be a nested CM3PConfig or a flat BeatmapConfig
    (MLM/classifier artifact); ``architecture`` defaults per config type via
    :func:`default_architecture`. Round-trip contract
    (tests/test_hf_export.py): embeddings from the reference model loaded
    off this bundle match ours with cosine > 0.9999.
    """
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if architecture is None:
        architecture = default_architecture(cfg)
    if tie_word_embeddings is None:
        bc = getattr(cfg, "beatmap_config", cfg)
        tie_word_embeddings = bool(getattr(bc, "tie_word_embeddings", False))
    state = flax_to_hf_state_dict(params, tie_word_embeddings=tie_word_embeddings)

    from safetensors.numpy import save_file

    # safetensors serializes the raw buffer: transposed VIEWS would be
    # written untransposed — force C-contiguous copies
    state = {k: np.ascontiguousarray(v) for k, v in state.items()}
    save_file(state, str(out_dir / "model.safetensors"), metadata={"format": "pt"})

    cfg_dict = hf_config_dict(cfg, architecture=architecture)
    cfg_dict["tie_word_embeddings"] = tie_word_embeddings
    with open(out_dir / "config.json", "w") as f:
        json.dump(cfg_dict, f, indent=2, sort_keys=True)
    return out_dir


# ------------------------------------------------------- processor export

_ADDED_TOKEN_FIELDS = {
    "lstrip": False, "normalized": False, "rstrip": False,
    "single_word": False, "special": True,
}


def _write_json(path: Path, obj: dict) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=2, sort_keys=True, ensure_ascii=False)
        f.write("\n")


def _added_tokens_decoder(tokenizer, tokens: list) -> dict:
    full = {t: i for i, t in tokenizer.ids_to_tokens.items()}
    return {str(full[t]): {"content": t, **_ADDED_TOKEN_FIELDS} for t in tokens}


def export_hf_processor(processor, out_dir: Union[str, Path], include_auto_map: bool = True) -> Path:
    """Write the processor in the REFERENCE's AutoProcessor layout.

    Mirrors ``processing_cm3p.CM3PProcessor.save_pretrained``
    (/root/reference/cm3p/processing_cm3p.py:659-745): per-attribute
    subfolders (audio_feature_extractor/, beatmap_parser/,
    beatmap_tokenizer/, metadata_tokenizer/), each component's
    preprocessor_config.json / tokenizer_config.json + vocab.json +
    special_tokens_map.json, and the top-level processor_config.json with
    the default kwargs. The vocabularies are the contract — ours are
    bit-identical (tests/test_tokenizer_parity.py) — so the reference's own
    ``CM3PProcessor.from_pretrained`` reconstructs a processor that
    tokenizes identically (round trip: tests/test_hf_export.py).

    ``auto_map`` entries point at the reference's dynamic modules
    (parsing_cm3p / tokenization_cm3p / processing_cm3p); the code files
    themselves ship with the upstream package, not this bundle.
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    fe = processor.audio_feature_extractor
    parser = processor.beatmap_parser
    bt = processor.beatmap_tokenizer
    mt = processor.metadata_tokenizer

    # ---- audio_feature_extractor/ (a stock WhisperFeatureExtractor)
    _write_json(out / "audio_feature_extractor" / "preprocessor_config.json", {
        "chunk_length": fe.chunk_length,
        "dither": fe.dither,
        "feature_extractor_type": "WhisperFeatureExtractor",
        "feature_size": fe.feature_size,
        "hop_length": fe.hop_length,
        "n_fft": fe.n_fft,
        "n_samples": fe.chunk_length * fe.sampling_rate,
        "nb_max_frames": fe.chunk_length * fe.sampling_rate // fe.hop_length,
        "padding_side": "right",
        "padding_value": fe.padding_value,
        "processor_class": "CM3PProcessor",
        "return_attention_mask": fe.return_attention_mask,
        "sampling_rate": fe.sampling_rate,
    })

    # ---- beatmap_parser/ (FeatureExtractionMixin config)
    parser_cfg = {k: v for k, v in parser.get_config().items() if k != "emit_mania_column"}
    parser_cfg["feature_extractor_type"] = "CM3PBeatmapParser"
    parser_cfg["processor_class"] = "CM3PProcessor"
    if include_auto_map:
        parser_cfg["auto_map"] = {"AutoFeatureExtractor": "parsing_cm3p.CM3PBeatmapParser"}
    _write_json(out / "beatmap_parser" / "preprocessor_config.json", parser_cfg)

    # ---- beatmap_tokenizer/
    bt_specials = ["[BOS]", "[EOS]", "[UNK]", "[SEP]", "[PAD]", "[CLS]", "[MASK]",
                   bt.audio_bos_token, bt.audio_eos_token, bt.audio_token]
    bt_cfg = {
        "add_cls_token": bt.add_cls_token,
        "added_tokens_decoder": _added_tokens_decoder(bt, bt_specials),
        "additional_special_tokens": [bt.audio_bos_token, bt.audio_eos_token, bt.audio_token],
        "bos_token": bt.bos_token, "eos_token": bt.eos_token, "unk_token": bt.unk_token,
        "sep_token": bt.sep_token, "pad_token": bt.pad_token, "cls_token": bt.cls_token,
        "mask_token": bt.mask_token,
        "clean_up_tokenization_spaces": False,
        "distance_step": bt.distance_step,
        "extra_special_tokens": {},
        "max_distance": bt.max_distance,
        "max_time": bt.max_time,
        "min_time": bt.min_time,
        "model_max_length": int(1e30),
        "position_range": list(bt.position_range),
        "position_split_axes": bt.position_split_axes,
        "position_step": bt.position_step,
        "processor_class": "CM3PProcessor",
        "separate_new_combo_token": bt.separate_new_combo_token,
        "time_step": bt.time_step,
        "tokenizer_class": "CM3PBeatmapTokenizer",
    }
    if include_auto_map:
        bt_cfg["auto_map"] = {"AutoTokenizer": ["tokenization_cm3p.CM3PBeatmapTokenizer", None]}
    _write_json(out / "beatmap_tokenizer" / "tokenizer_config.json", bt_cfg)
    _write_json(out / "beatmap_tokenizer" / "special_tokens_map.json", {
        "additional_special_tokens": [bt.audio_bos_token, bt.audio_eos_token, bt.audio_token],
        "bos_token": bt.bos_token, "cls_token": bt.cls_token, "eos_token": bt.eos_token,
        "mask_token": bt.mask_token, "pad_token": bt.pad_token, "sep_token": bt.sep_token,
        "unk_token": bt.unk_token,
    })
    with open(out / "beatmap_tokenizer" / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(dict(bt.vocab), f, ensure_ascii=False)

    # ---- metadata_tokenizer/ (note: the reference __init__ spells the kwarg
    # ``min_difficculty`` — emit its spelling so its class reloads it)
    mt_unks = list(mt.special_tokens[4:])  # the 14 per-field UNK tokens
    mt_cfg = {
        "add_cls_token": mt.add_cls_token,
        "added_tokens_decoder": _added_tokens_decoder(mt, list(mt.special_tokens)),
        "additional_special_tokens": mt_unks,
        "bos_token": mt.bos_token, "eos_token": mt.eos_token,
        "pad_token": mt.pad_token, "cls_token": mt.cls_token,
        "clean_up_tokenization_spaces": False,
        "difficulty_step": mt.difficulty_step,
        "extra_special_tokens": {},
        "global_sv_step": mt.global_sv_step,
        "hold_note_ratio_step": mt.hold_note_ratio_step,
        "mappers": {str(k): v for k, v in mt.mappers.items()},
        "max_difficulty": mt.max_difficulty,
        "max_song_length": mt.max_song_length,
        "max_year": mt.max_year,
        "min_difficculty": mt.min_difficulty,
        "min_year": mt.min_year,
        "model_max_length": int(1e30),
        "modes": {str(k): v for k, v in mt.modes.items()},
        "processor_class": "CM3PProcessor",
        "scroll_speed_ratio_step": mt.scroll_speed_ratio_step,
        "song_length_step": mt.song_length_step,
        "song_position_step": mt.song_position_step,
        "statuses": {str(k): v for k, v in mt.statuses.items()},
        "tags": {str(k): v for k, v in mt.tags.items()},
        "tokenizer_class": "CM3PMetadataTokenizer",
    }
    if include_auto_map:
        mt_cfg["auto_map"] = {"AutoTokenizer": ["tokenization_cm3p.CM3PMetadataTokenizer", None]}
    _write_json(out / "metadata_tokenizer" / "tokenizer_config.json", mt_cfg)
    _write_json(out / "metadata_tokenizer" / "special_tokens_map.json", {
        "additional_special_tokens": mt_unks,
        "bos_token": mt.bos_token, "cls_token": mt.cls_token,
        "eos_token": mt.eos_token, "pad_token": mt.pad_token,
    })
    with open(out / "metadata_tokenizer" / "vocab.json", "w", encoding="utf-8") as f:
        json.dump(dict(mt.vocab), f, ensure_ascii=False)

    # ---- processor_config.json (default call kwargs + class identity).
    # The reference's _merge_kwargs indexes default_kwargs["common_kwargs"]
    # unconditionally and spells truncation as the HF strategy string, so
    # emit ITS schema with our values merged on top.
    dk = {k: dict(v) for k, v in processor.default_kwargs.items()}
    for sub in dk.values():
        if sub.get("truncation") is True:
            sub["truncation"] = "longest_first"
    dk.setdefault("common_kwargs", {})["return_tensors"] = "pt"
    dk["audio_kwargs"].setdefault("device", "cpu")
    dk["audio_kwargs"].setdefault("padding", True)
    dk["audio_kwargs"].setdefault("truncation", False)
    proc_cfg = {
        "default_kwargs": dk,
        "processor_class": "CM3PProcessor",
    }
    if include_auto_map:
        proc_cfg["auto_map"] = {"AutoProcessor": "processing_cm3p.CM3PProcessor"}
    _write_json(out / "processor_config.json", proc_cfg)
    return out
