"""High-level inference API.

Convenience wrappers over the processor + model for the three headline
inference tasks (reference README Quick Start + tests):

* :func:`load_pretrained` — one call to get (processor, model, params)
* :func:`embed_beatmap` — per-window and mean-pooled beatmap embeddings
* :func:`zero_shot_classify` — rank candidate metadata against a beatmap
  (the usage pattern of tests/test_zero_shot_classification.py)
* :func:`masked_predict` — top-k token predictions at masked positions
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np

from .processing.processor import CM3PProcessor


def load_pretrained(model_dir: str, processor_dir: Optional[str] = None, dtype=None, attn_impl: str = "pallas"):
    """Load (processor, model, params) from saved artifacts or a Hub repo id.

    ``model_dir`` / ``processor_dir`` accept local directories in either our
    native layout (Orbax ``params/`` + dataclass ``config.json``) or an
    **HF-layout directory** (``model.safetensors`` + nested HF
    ``config.json``) — i.e. a published reference checkpoint or a bundle
    from :func:`cm3p_tpu.interop.export_hf_checkpoint` — converted on the
    fly. A non-path ``org/name`` string resolves through the HF Hub
    (``interop.hub.resolve_artifact``), matching the reference's
    ``from_pretrained("OliBomby/CM3P")`` usage; when the resolved snapshot
    carries an AutoProcessor-layout processor (our ``publish_model.py --hf``
    bundles do), it is used automatically unless ``processor_dir`` is given.
    """
    import os

    import jax.numpy as jnp

    from .configs import BeatmapConfig, CM3PConfig, load_config
    from .interop.hub import resolve_artifact
    from .models import ClassifierModule, CM3PModule, MaskedLMModule
    from .train.checkpoint import load_model
    from .utils.platform import resolve_attn_impl

    attn_impl = resolve_attn_impl(attn_impl)
    model_dir = resolve_artifact(model_dir)
    if processor_dir is None and os.path.exists(os.path.join(model_dir, "processor_config.json")):
        processor_dir = model_dir
    if processor_dir is not None:
        processor_dir = resolve_artifact(processor_dir)
    processor = CM3PProcessor.from_pretrained(processor_dir) if processor_dir else CM3PProcessor()
    if os.path.exists(os.path.join(model_dir, "model.safetensors")) or any(
        f.startswith("pytorch_model") for f in os.listdir(model_dir)
    ):
        from .interop import load_hf_checkpoint

        config, params = load_hf_checkpoint(model_dir)
        dtype = dtype or jnp.bfloat16
        # same dispatch as the native branch below: nested config -> dual
        # tower; flat BeatmapConfig -> classifier / MLM bundle
        if isinstance(config, CM3PConfig):
            model = CM3PModule(config, dtype=dtype, attn_impl=attn_impl)
        elif config.num_labels > 0 and config.problem_type:
            model = ClassifierModule(config, dtype=dtype, attn_impl=attn_impl)
        else:
            model = MaskedLMModule(config, dtype=dtype, attn_impl=attn_impl)
        bc = getattr(config, "beatmap_config", config)
        # the real tokenizer's ids must be in range (OOB gathers NaN on TPU)
        if bc.vocab_size < processor.beatmap_tokenizer.vocab_size:
            import warnings

            warnings.warn(
                f"checkpoint vocab {bc.vocab_size} < tokenizer vocab "
                f"{processor.beatmap_tokenizer.vocab_size}: tokenized inputs can produce "
                "out-of-range ids (silent NaN on TPU); pass a matching processor_dir",
                stacklevel=2,
            )
        return processor, model, params
    config = load_config(model_dir)
    dtype = dtype or jnp.bfloat16
    if isinstance(config, CM3PConfig):
        model = CM3PModule(config, dtype=dtype, attn_impl=attn_impl)
    elif isinstance(config, BeatmapConfig) and config.num_labels > 0 and config.problem_type:
        model = ClassifierModule(config, dtype=dtype, attn_impl=attn_impl)
    else:
        model = MaskedLMModule(config, dtype=dtype, attn_impl=attn_impl)
    params = load_model(model_dir)
    return processor, model, params


_FEATURE_FNS: dict = {}


def _jitted_features(model):
    # keyed by object identity: configs are mutable dataclasses (unhashable)
    fn = _FEATURE_FNS.get(id(model))
    if fn is None:
        import jax

        from .models import CM3PModule

        fn = jax.jit(
            lambda params, **batch: model.apply(
                params, method=CM3PModule.get_beatmap_features, normalize=True, **batch
            )
        )
        _FEATURE_FNS[id(model)] = fn
    return fn


def embed_beatmap(
    model,
    params,
    processor: CM3PProcessor,
    beatmap,
    audio=None,
    audio_sampling_rate: Optional[int] = None,
    mean_pool: bool = True,
    **processor_kwargs,
) -> np.ndarray:
    """Normalized beatmap embeddings: (windows, dim) or mean-pooled (dim,)."""
    import jax.numpy as jnp

    inputs = processor(beatmap=beatmap, audio=audio, audio_sampling_rate=audio_sampling_rate, **processor_kwargs)
    batch = {
        "input_ids": jnp.asarray(inputs["input_ids"]),
        "attention_mask": jnp.asarray(inputs["attention_mask"]),
    }
    if "input_features" in inputs:
        batch["input_features"] = jnp.asarray(inputs["input_features"])
    feats = np.asarray(_jitted_features(model)(params, **batch), np.float32)
    if not mean_pool:
        return feats
    mean = feats.mean(axis=0)
    norm = np.linalg.norm(mean)
    return mean / norm if norm > 0 else mean


def zero_shot_classify(
    model,
    params,
    processor: CM3PProcessor,
    beatmap,
    candidates: Sequence[dict],
    audio=None,
    audio_sampling_rate: Optional[int] = None,
    **processor_kwargs,
) -> np.ndarray:
    """Score candidate metadata dicts against each beatmap window.

    Returns (windows, num_candidates) similarity logits; argmax along the
    last axis is the predicted candidate per window (majority vote across
    windows is the reference's evaluation rule,
    test_zero_shot_classification.py:84-87).
    """
    import jax
    import jax.numpy as jnp

    inputs = processor(beatmap=beatmap, audio=audio, audio_sampling_rate=audio_sampling_rate, **processor_kwargs)
    meta_enc = processor.metadata_tokenizer(list(candidates))

    batch = {
        "input_ids": jnp.asarray(inputs["input_ids"]),
        "attention_mask": jnp.asarray(inputs["attention_mask"]),
        "metadata_ids": jnp.asarray(meta_enc["input_ids"]),
        "metadata_attention_mask": jnp.asarray(meta_enc["attention_mask"]),
    }
    if "input_features" in inputs:
        batch["input_features"] = jnp.asarray(inputs["input_features"])

    out = jax.jit(functools.partial(model.apply, return_loss=False))(params, **batch)
    return np.asarray(out.logits_per_beatmap, np.float32)  # (windows, candidates)


def masked_predict(
    model,
    params,
    processor: CM3PProcessor,
    beatmap,
    mask_prob: float = 0.15,
    top_k: int = 5,
    seed: int = 0,
    **processor_kwargs,
):
    """Mask random tokens of a beatmap and return top-k predictions.

    Returns (masked_positions, true_ids, topk_ids) for the first window —
    the contract of tests/test_masked_prediction.py.
    """
    import jax
    import jax.numpy as jnp

    tok = processor.beatmap_tokenizer
    inputs = processor(beatmap=beatmap, **processor_kwargs)
    ids = np.asarray(inputs["input_ids"])[:1].copy()
    mask = np.asarray(inputs["attention_mask"])[:1]

    rng = np.random.default_rng(seed)
    corrupt = (rng.random(ids.shape) < mask_prob) & (mask == 1)
    for sid in tok.all_special_ids:
        corrupt &= ids != sid
    true_ids = ids[corrupt]
    corrupted = np.where(corrupt, tok.mask_token_id, ids)

    out = jax.jit(model.apply)(
        params, input_ids=jnp.asarray(corrupted), attention_mask=jnp.asarray(mask)
    )
    logits = np.asarray(out.logits, np.float32)[corrupt]
    topk = np.argsort(-logits, axis=-1)[:, :top_k]
    positions = np.argwhere(corrupt)[:, 1]
    return positions, true_ids, topk
