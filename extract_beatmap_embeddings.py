"""Batch embedding extraction to parquet.

JAX port of ``/root/reference/extract_beatmap_embeddings.py``: iterate a
dataset (MMRS roots or loose .osu/.osz files), run the jitted projection
forward per fixed-shape batch, mean-pool the per-window embeddings per
beatmap id, re-normalize, join with metadata columns, and optionally merge
into an existing parquet preferring new rows.

Usage:
    python extract_beatmap_embeddings.py --model-dir out/model --processor-dir out/processor \
        --beatmap-files path/to/maps --output embeddings.parquet
    python extract_beatmap_embeddings.py --dataset-path /data/MMRS --output embeddings.parquet
"""
from __future__ import annotations

import argparse
import logging
import os
import sys
import time
from pathlib import Path
from typing import Any, Optional

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


def build_model_and_params(model_dir: Optional[str], processor, dtype_name: str, attn_impl: str):
    import jax
    import jax.numpy as jnp

    from cm3p_tpu.configs import CM3PConfig, load_config as load_model_config
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.train.checkpoint import load_model

    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[dtype_name]
    if model_dir:
        cfg = load_model_config(model_dir)
    else:
        logger.warning("No --model-dir given: using a randomly initialized flagship model")
        cfg = CM3PConfig()
        bt = processor.beatmap_tokenizer
        cfg.beatmap_config.vocab_size = bt.vocab_size
        cfg.beatmap_config.audio_token_id = bt.audio_token_id
        cfg.beatmap_config.audio_sos_token_id = bt.convert_tokens_to_ids(bt.audio_bos_token)
        cfg.beatmap_config.audio_eos_token_id = bt.convert_tokens_to_ids(bt.audio_eos_token)
        cfg.metadata_config.vocab_size = processor.metadata_tokenizer.vocab_size

    model = CM3PModule(cfg, dtype=dtype, attn_impl=attn_impl)
    if model_dir:
        params = load_model(model_dir)
    else:
        seq = processor.default_kwargs["beatmap_kwargs"].get("max_length", 4000)
        n_mels = cfg.beatmap_config.audio_config.n_mels
        dummy = {
            "input_ids": jnp.zeros((1, min(seq, 128)), jnp.int32),
            "attention_mask": jnp.ones((1, min(seq, 128)), jnp.int32),
            # audio params must exist even if this run has no audio files
            "input_features": jnp.zeros((1, n_mels, 32), jnp.float32),
        }
        params = model.init(jax.random.PRNGKey(0), **dummy, return_loss=False)
    return model, params


class BeatmapFilesDatasetFactory:
    """Picklable dataset factory for loose .osu/.osz extraction.

    SampleLoader workers are spawn processes, so the factory must cross a
    pickle boundary — a closure here crashes every ``--num-workers > 0``
    run at startup (same hazard as ``train.MmrsDatasetFactory``).
    """

    def __init__(self, paths, processor, include_audio: bool):
        self.paths = paths
        self.processor = processor
        self.include_audio = include_audio

    def __call__(self, worker_id, num_workers):
        from cm3p_tpu.data import BeatmapFilesDataset

        return BeatmapFilesDataset(
            self.paths,
            self.processor,
            include_audio=self.include_audio,
            worker_id=worker_id,
            num_workers=num_workers,
        )


class MmrsExtractFactory:
    """Picklable MMRS dataset factory for embedding extraction."""

    def __init__(self, ds_cfg, processor):
        self.ds_cfg = ds_cfg
        self.processor = processor

    def __call__(self, worker_id, num_workers):
        from cm3p_tpu.data import MmrsDataset

        return MmrsDataset(
            self.ds_cfg, self.processor, worker_id=worker_id, num_workers=num_workers, test=False
        )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-dir", default=None, help="orbax model dir (params + config.json)")
    parser.add_argument("--processor-dir", default=None, help="saved processor dir")
    parser.add_argument("--dataset-path", action="append", default=None, help="MMRS dataset root(s)")
    parser.add_argument("--beatmap-files", action="append", default=None, help=".osu/.osz files or dirs")
    parser.add_argument("--output", default=None, help="output parquet (required unless --prewarm)")
    parser.add_argument("--merge-with", default=None, help="existing embeddings parquet to merge into")
    parser.add_argument(
        "--batch-size",
        type=int,
        default=0,
        help="device batch: packed rows (default 192 — the bench-measured "
        "amortization optimum, BASELINE.md rows scan) or dense windows "
        "(default 32)",
    )
    parser.add_argument(
        "--flush-rows",
        type=int,
        default=0,
        help="packed-row flush quantum (default min(64, --batch-size)): a "
        "device batch is dispatched as soon as this many rows have packed, "
        "so its host->device transfer and compute overlap the loader's CPU "
        "work on later windows. The r9 e2e breakdown showed one giant "
        "end-of-loader flush serializing the whole mel transfer + compute "
        "after the loader (BASELINE.md). --batch-size stays the device "
        "row CAP (memory bound); this is only the eagerness knob.",
    )
    parser.add_argument("--num-workers", type=int, default=0)
    parser.add_argument(
        "--mel-wire", default=None, choices=["bf16", "int8", "pcm"],
        help="host->device mel form for the packed compact path (default "
        "CM3P_MEL_WIRE or bf16). int8: half the transfer via a per-window "
        "symmetric scale. pcm: ship raw fp32 waveforms and run the log-mel "
        "ON DEVICE (DFT-as-convolution, audio/device_mel.py) - ~4x the "
        "bytes but zero host mel CPU; pays on TPU-VM-class host links. "
        "Drift + timing: tools/bench_mel_wire.py",
    )
    parser.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    parser.add_argument("--attn-impl", default="pallas", choices=["pallas", "xla"])
    parser.add_argument("--no-audio", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--max-length", type=int, default=None, help="override beatmap token max_length")
    parser.add_argument(
        "--window-length", type=float, default=None,
        help="override window_length_sec (production embeddings are published "
        "at 16 s granularity, reference README:34; the bare processor default "
        "is 30 s). Stride follows unless --window-stride is given.",
    )
    parser.add_argument("--window-stride", type=float, default=None, help="override window_stride_sec")
    parser.add_argument("--tiny-model", action="store_true", help="random tiny model (smoke tests)")
    parser.add_argument(
        "--pack",
        action="store_true",
        default=True,
        help="pack windows into fixed rows with segment IDs — the default "
        "(3-5x throughput on real length distributions; embeddings are "
        "identical to per-window batches, tests/test_packing.py)",
    )
    parser.add_argument(
        "--no-pack",
        dest="pack",
        action="store_false",
        help="per-window dense batches instead of packed rows",
    )
    parser.add_argument(
        "--no-mesh",
        action="store_true",
        help="disable the automatic data-parallel mesh over all local devices",
    )
    parser.add_argument(
        "--precise",
        action="store_true",
        help="exact bf16 math: disable the production extraction gates "
        "(in-kernel Wo epilogue + int8 FFN Wi; embedding drift cos_min "
        "0.99998, within the documented <1e-3 parity band)",
    )
    parser.add_argument(
        "--aot-cache",
        default=os.path.join(os.path.expanduser("~"), ".cache", "cm3p_tpu", "aot"),
        help="directory for serialized compiled executables — warm starts "
        "skip the ~60s single-core trace+lower entirely (keyed on code, "
        "config, shapes, and device topology; auto-invalidates)",
    )
    parser.add_argument(
        "--no-aot-cache", dest="aot_cache", action="store_const", const="",
        help="disable the AOT executable cache (always trace+lower)",
    )
    parser.add_argument(
        "--prewarm",
        nargs="?",
        const="default",
        default=None,
        metavar="ROWS:WPAD,...",
        help="build the AOT executables for the canonical packed flush "
        "shapes and exit (no dataset needed) — a one-time install/deploy "
        "step that makes every later cold start deserialize in seconds "
        "instead of paying the first-run trace+lower+compile (~10 min "
        "through the TPU relay). Default shapes: the steady-state eager "
        "flush (--flush-rows rows x window pads 384/256/128). "
        "Artifacts land in --aot-cache; ship them read-only via "
        "CM3P_AOT_SEED (utils/aot.py)",
    )
    ns = parser.parse_args(argv)
    if ns.output is None and not ns.prewarm:
        parser.error("--output is required (unless --prewarm)")
    if ns.prewarm and not ns.aot_cache:
        parser.error("--prewarm needs an AOT cache directory (drop --no-aot-cache)")
    auto_batch = not ns.batch_size
    if auto_batch:
        # packed rows amortize dispatch/pooling up to ~192 (BASELINE.md rows
        # scan); dense full-length windows are memory-bound much earlier.
        # The packed default is finalized once max_length is known (below):
        # the 192-row plateau was measured at 4096 tokens/row, and the same
        # TOKEN budget is what fits HBM (192 rows x 8000 tokens needs ~18 GB
        # and fails to compile on a 16 GB v5e).
        ns.batch_size = 192 if ns.pack else 32

    if ns.precise:
        # override inherited env too: "--precise" always means exact bf16
        os.environ["CM3P_FUSED_WO"] = "0"
        os.environ["CM3P_W8A8"] = "0"
    else:
        # Production extraction gates — see bench.py for the measured A/B
        # and drift evidence. setdefault: explicit env still overrides.
        # Must run before any cm3p_tpu import (gates read at module import).
        os.environ.setdefault("CM3P_FUSED_WO", "1")
        os.environ.setdefault("CM3P_W8A8", "1")

    logging.basicConfig(level=logging.INFO, stream=sys.stdout)

    if ns.cpu:
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    import jax
    import jax.numpy as jnp

    from cm3p_tpu.utils.cache import enable_compilation_cache
    from cm3p_tpu.utils.platform import resolve_attn_impl

    enable_compilation_cache()
    ns.attn_impl = resolve_attn_impl(ns.attn_impl)
    # On the CPU backend (--cpu smoke/verification runs) compiles are cheap
    # but compute/memory are not: the canonical flush shapes below, sized to
    # bound 30s-10min TPU relay recompiles, would pad a 9-window map to 64
    # rows x L of dense attention (hundreds of GB at L=4096 on the XLA
    # fallback path). Shrink the padding grain and the auto row budget there;
    # packing row count never changes embedding values (tests/test_packing.py).
    cpu_backend = jax.default_backend() == "cpu"

    from cm3p_tpu.data import BeatmapFilesDataset, DatasetConfig, MmrsDataset, SampleLoader, batched_loader
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.processing import CM3PProcessor

    processor = (
        CM3PProcessor.from_pretrained(ns.processor_dir) if ns.processor_dir else CM3PProcessor()
    )
    if ns.max_length:
        processor.default_kwargs["beatmap_kwargs"]["max_length"] = ns.max_length
    if ns.window_length:
        processor.default_kwargs["beatmap_kwargs"]["window_length_sec"] = ns.window_length
        processor.default_kwargs["beatmap_kwargs"]["window_stride_sec"] = (
            ns.window_stride or ns.window_length
        )
    elif ns.window_stride:
        processor.default_kwargs["beatmap_kwargs"]["window_stride_sec"] = ns.window_stride

    # Compact mel wire form (CM3P_COMPACT_MEL=0 opts out): a 16 s window in
    # a 30 s chunk is ~47% constant tail (audio/mel.py logmel_parts) — ship
    # only the dense frames + the per-window tail scalar through worker IPC
    # and the host->device transfer, and broadcast the tail back on device.
    # Bit-exact (tests/test_extractor_compact.py); packed path only.
    compact_mel = False
    include_audio = not ns.no_audio
    if ns.pack and include_audio and os.environ.get("CM3P_COMPACT_MEL", "1") != "0":
        fe = processor.audio_feature_extractor
        ak = processor.default_kwargs["audio_kwargs"]
        wls = processor.default_kwargs["beatmap_kwargs"].get("window_length_sec", 30.0)
        chunk_samples = fe.chunk_length * fe.sampling_rate
        if (
            not fe.dither
            and ak.get("pad_to_multiple_of", 480000) == chunk_samples
            and wls * ak.get("sampling_rate", fe.sampling_rate) + fe.n_fft <= chunk_samples
        ):
            ak["compact_tail"] = True
            compact_mel = True
    mel_wire = ns.mel_wire or os.environ.get("CM3P_MEL_WIRE", "bf16")
    if mel_wire in ("int8", "pcm") and not compact_mel:
        logger.info("--mel-wire %s requires the packed compact path; using bf16", mel_wire)
        mel_wire = "bf16"
    if mel_wire == "pcm":
        # the processor ships raw windows; mel runs on device
        ak = processor.default_kwargs["audio_kwargs"]
        ak.pop("compact_tail", None)
        ak["pcm_wire"] = True
    if auto_batch and ns.pack:
        # keep the measured 192x4096 token budget at any row length
        # (row count capped at the 256 the rows scan actually measured)
        row_len = processor.default_kwargs["beatmap_kwargs"].get("max_length", 4000)
        ns.batch_size = min(256, max(32, (192 * 4096 // row_len) // 32 * 32))
    if cpu_backend and auto_batch:
        ns.batch_size = min(ns.batch_size, 16)
    if ns.tiny_model:
        import jax

        from cm3p_tpu.configs import tiny_cm3p_config

        cfg = tiny_cm3p_config()
        bt = processor.beatmap_tokenizer
        cfg.beatmap_config.vocab_size = bt.vocab_size
        cfg.beatmap_config.audio_token_id = bt.audio_token_id
        model = CM3PModule(cfg, dtype=jnp.float32, attn_impl="xla")
        params = model.init(
            jax.random.PRNGKey(0),
            input_ids=jnp.zeros((1, 64), jnp.int32),
            attention_mask=jnp.ones((1, 64), jnp.int32),
            input_features=jnp.zeros((1, cfg.beatmap_config.audio_config.n_mels, 32), jnp.float32),
            return_loss=False,
        )
    else:
        model, params = build_model_and_params(ns.model_dir, processor, ns.dtype, ns.attn_impl)

    if ns.beatmap_files:
        dataset_factory = BeatmapFilesDatasetFactory(ns.beatmap_files, processor, include_audio)
        metadata = BeatmapFilesDataset(ns.beatmap_files, processor, include_audio=False).metadata
    elif ns.dataset_path:
        ds_cfg = DatasetConfig(
            train_dataset_paths=ns.dataset_path,
            include_audio=include_audio,
            include_metadata=False,
            include_source_metadata=True,
            dt_augment_prob=0.0,
            cycle_length=1,
        )

        dataset_factory = MmrsExtractFactory(ds_cfg, processor)
        metadata = MmrsDataset(ds_cfg, processor).get_filtered_metadata()
    elif ns.prewarm:
        dataset_factory = metadata = None  # prewarm compiles and exits below
    else:
        parser.error("Provide --dataset-path or --beatmap-files")
        return

    # Data-parallel mesh over all local devices (reference counterpart: the
    # torch extractor is single-GPU, extract_beatmap_embeddings.py:1-30 —
    # this is a capability upgrade). Batches are row-sharded over `data`;
    # the Pallas kernels self-wrap in shard_map under the ambient mesh
    # (ops/flash_attention.py mesh dispatch), XLA shards the dense stack.
    import contextlib

    mesh = None
    n_dev = 1
    mesh_ctx: contextlib.AbstractContextManager = contextlib.nullcontext()
    if not ns.no_mesh and len(jax.devices()) > 1:
        from jax.sharding import Mesh

        n_dev = len(jax.devices())
        mesh = Mesh(np.array(jax.devices()), ("data",))
        mesh_ctx = mesh
        if ns.batch_size % n_dev:
            ns.batch_size = -(-ns.batch_size // n_dev) * n_dev
            logger.info("Rounded --batch-size up to %d for the %d-device mesh", ns.batch_size, n_dev)
        logger.info("Extracting data-parallel over %d devices", n_dev)

    def _shard_rows(arr, dtype=None):
        """Device_put a host array row-sharded over the mesh's data axis
        (replicated when its leading dim doesn't divide). Takes the HOST
        array directly — one sharded transfer, no default-device hop."""
        if arr is None:
            return arr
        if mesh is None:
            return jnp.asarray(arr, dtype) if dtype is not None else arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        arr = np.asarray(arr)
        if dtype is not None:
            # host-side cast (ml_dtypes bf16) halves transfer bytes; no-op
            # copy skipped when the buffer was built in the wire dtype
            arr = arr.astype(dtype, copy=False)
        lead = "data" if arr.shape[0] % n_dev == 0 else None
        spec = P(*((lead,) + (None,) * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(mesh, spec))

    @jax.jit
    def extract(params, input_ids, attention_mask, input_features=None):
        return model.apply(
            params,
            method=CM3PModule.get_beatmap_features,
            input_ids=input_ids,
            attention_mask=attention_mask,
            input_features=input_features,
            normalize=True,
        )

    @jax.jit
    def extract_packed(params, input_ids, segment_ids, window_rows, window_segments, input_features=None):
        return model.apply(
            params,
            method=CM3PModule.get_packed_beatmap_features,
            input_ids=input_ids,
            segment_ids=segment_ids,
            window_rows=window_rows,
            window_segments=window_segments,
            input_features=input_features,
            normalize=True,
        )

    msp = processor.default_kwargs["audio_kwargs"].get("max_source_positions", 3000)

    def _compact_body(
        params, input_ids, segment_ids, window_rows, window_segments, features_dense, features_tail
    ):
        # rebuild the exact full mel: dense frames + the per-window constant
        # tail broadcast to max_source_positions (an on-device HBM write at
        # ~1 GB/ms vs the same bytes over the host link)
        w, n_mels, f_cap = features_dense.shape
        full = jnp.concatenate(
            [
                features_dense,
                jnp.broadcast_to(
                    features_tail[:, None, None].astype(features_dense.dtype),
                    (w, n_mels, msp - f_cap),
                ),
            ],
            axis=2,
        )
        return model.apply(
            params,
            method=CM3PModule.get_packed_beatmap_features,
            input_ids=input_ids,
            segment_ids=segment_ids,
            window_rows=window_rows,
            window_segments=window_segments,
            input_features=full,
            normalize=True,
        )

    extract_packed_compact = jax.jit(_compact_body)

    @jax.jit
    def extract_packed_compact_q(
        params, input_ids, segment_ids, window_rows, window_segments,
        features_i8, features_scale, features_tail,
    ):
        # int8 mel wire (--mel-wire int8 / CM3P_MEL_WIRE=int8): dequantize
        # per window on device — halves the dominant host->device transfer
        # vs bf16 (the drain wall once the loader has cores, BASELINE r10).
        # Symmetric per-window scale (max|mel|/127); drift measured by
        # tools/bench_mel_wire.py before any default flip.
        dense = (
            features_i8.astype(jnp.bfloat16)
            * features_scale[:, None, None].astype(jnp.bfloat16)
        )
        return _compact_body(
            params, input_ids, segment_ids, window_rows, window_segments, dense, features_tail
        )

    device_mel = None
    if mel_wire == "pcm":
        from cm3p_tpu.audio.device_mel import DeviceLogMel

        _fe = processor.audio_feature_extractor
        device_mel = DeviceLogMel(_fe.feature_size, _fe.sampling_rate, _fe.hop_length, _fe.n_fft)

    @jax.jit
    def extract_packed_pcm(params, input_ids, segment_ids, window_rows, window_segments, pcm):
        # raw fp32 waveforms on the wire; the log-mel runs on the MXU
        # (DFT-as-convolution) and feeds the same compact reconstruction.
        # bf16 cast matches the bf16 mel wire's precision downstream.
        dense, tail = device_mel(pcm)
        return _compact_body(
            params, input_ids, segment_ids, window_rows, window_segments,
            dense.astype(jnp.bfloat16), tail.astype(jnp.bfloat16),
        )

    if ns.aot_cache:
        # Warm starts deserialize the compiled executable instead of paying
        # the ~60 s single-core trace+lower per flush shape (utils/aot.py).
        import hashlib
        import json

        from cm3p_tpu.configs import config_to_dict
        from cm3p_tpu.utils.aot import AotFunctionCache

        extra = hashlib.sha256(
            json.dumps(
                {
                    "config": config_to_dict(model.config),
                    "dtype": ns.dtype,
                    "attn_impl": ns.attn_impl,
                    "gates": {k: os.environ.get(k, "") for k in
                              ("CM3P_FUSED_WO", "CM3P_W8A8", "CM3P_FUSED_WO_Q",
                               "CM3P_W8A8_WO", "CM3P_FUSED_LNMM", "CM3P_XLA_INT8",
                               "CM3P_FA_UNROLL", "CM3P_FA_ONLINE_MAX", "CM3P_BWD_EXP2",
                               "CM3P_MESH_PALLAS")},
                    # separates the preload MANIFESTS per mel wire mode: a
                    # compact-off run must not background-deserialize the
                    # compact executables (r9 arm C starved its 1-core
                    # loader with 105 s of useless preloads)
                    "compact_mel": compact_mel,
                    "mel_wire": mel_wire,
                    # ...and per flush quantum: eager-64 and legacy-192 jobs
                    # produce disjoint shape sets; a shared manifest would
                    # background-deserialize the other mode's executables
                    "flush_rows": ns.flush_rows or min(64, ns.batch_size),
                    "entry": hashlib.sha256(Path(__file__).read_bytes()).hexdigest(),
                },
                sort_keys=True, default=str,
            ).encode()
        ).hexdigest()[:16]
        aot = AotFunctionCache(ns.aot_cache, extra_key=extra)
        extract = aot.wrap(extract, "extract_dense")
        extract_packed = aot.wrap(extract_packed, "extract_packed")
        extract_packed_compact = aot.wrap(extract_packed_compact, "extract_packed_compact")
        extract_packed_compact_q = aot.wrap(extract_packed_compact_q, "extract_packed_compact_q")
        if device_mel is not None:
            extract_packed_pcm = aot.wrap(extract_packed_pcm, "extract_packed_pcm")
        if not ns.prewarm:
            # background-deserialize the executables this exact config used
            # last time (manifest) while the loader/processor pipeline runs —
            # the serial per-flush deserialize was 21.5 s of the 47 s warm
            # e2e wall (r8 batch, BASELINE.md)
            aot.preload()

    if ns.prewarm:
        # Build (or refresh) the AOT executables for the canonical packed
        # flush shapes, then exit. Calls ride the SAME wrapped functions,
        # mesh context, and sharding helpers as a real job, so the cache
        # keys are identical to what production flushes compute.
        seq_len = processor.default_kwargs["beatmap_kwargs"].get("max_length", 4000)
        msp = processor.default_kwargs["audio_kwargs"].get("max_source_positions", 3000)
        n_mels = processor.audio_feature_extractor.feature_size
        if ns.prewarm == "default":
            # steady-state eager flushes (flush_rows x the window-count pads
            # real jobs land on) — the tail flush reuses one of these shapes
            fr = ns.flush_rows or min(64, ns.batch_size)
            shapes = [(fr, 384), (fr, 256), (fr, 128)]
        else:
            shapes = [tuple(int(v) for v in part.split(":")) for part in ns.prewarm.split(",")]
        for rows, w_pad in shapes:
            rows = -(-rows // n_dev) * n_dev
            t_shape = time.perf_counter()
            ids = np.zeros((rows, seq_len), np.int32)
            segs = np.zeros((rows, seq_len), np.int32)
            segs[:, : seq_len // 2] = 1
            segs[:, seq_len // 2 :] = 2
            window_rows = np.zeros(w_pad, np.int32)
            window_segments = np.ones(w_pad, np.int32)
            with mesh_ctx:
                if compact_mel:
                    wls = processor.default_kwargs["beatmap_kwargs"].get("window_length_sec", 30.0)
                    sr = processor.default_kwargs["audio_kwargs"].get("sampling_rate", 16000)
                    f_cap = processor._compact_frames(wls, sr)
                    if mel_wire == "pcm":
                        hop = processor.audio_feature_extractor.hop_length
                        out = extract_packed_pcm(
                            params,
                            _shard_rows(ids),
                            _shard_rows(segs),
                            jnp.asarray(window_rows),
                            jnp.asarray(window_segments),
                            _shard_rows(np.zeros((w_pad, f_cap * hop), np.float32), np.float32),
                        )
                    elif mel_wire == "int8":
                        out = extract_packed_compact_q(
                            params,
                            _shard_rows(ids),
                            _shard_rows(segs),
                            jnp.asarray(window_rows),
                            jnp.asarray(window_segments),
                            _shard_rows(np.zeros((w_pad, n_mels, f_cap), np.int8), np.int8),
                            jnp.asarray(np.ones(w_pad, np.float32)),
                            jnp.asarray(np.zeros(w_pad, jnp.bfloat16)),
                        )
                    else:
                        out = extract_packed_compact(
                            params,
                            _shard_rows(ids),
                            _shard_rows(segs),
                            jnp.asarray(window_rows),
                            jnp.asarray(window_segments),
                            _shard_rows(np.zeros((w_pad, n_mels, f_cap), jnp.bfloat16), jnp.bfloat16),
                            jnp.asarray(np.zeros(w_pad, jnp.bfloat16)),
                        )
                else:
                    features = (
                        None if ns.no_audio else np.zeros((w_pad, n_mels, msp), jnp.bfloat16)
                    )
                    out = extract_packed(
                        params,
                        _shard_rows(ids),
                        _shard_rows(segs),
                        jnp.asarray(window_rows),
                        jnp.asarray(window_segments),
                        _shard_rows(features, jnp.bfloat16),
                    )
            np.asarray(out)  # host fetch: the relay can ack before executing
            logger.info(
                "Prewarmed packed shape rows=%d wpad=%d L=%d audio=%s compact=%s in %.1fs",
                rows, w_pad, seq_len, not ns.no_audio, compact_mel,
                time.perf_counter() - t_shape,
            )
        logger.info("Prewarm done: %s", ns.aot_cache)
        return

    accumulator: dict[Any, dict[str, Any]] = {}

    def _accumulate(embeds, ids):
        """Running per-beatmap sum/count of window embeddings."""
        for i, bid in enumerate(ids):
            bid = tuple(bid) if isinstance(bid, list) else bid
            if bid not in accumulator:
                accumulator[bid] = {"sum": embeds[i].copy(), "count": 1}
            else:
                accumulator[bid]["sum"] += embeds[i]
                accumulator[bid]["count"] += 1
    # More worker processes than cores only adds spawn/IPC cost (they
    # timeshare the same CPUs); extraction is order-independent so the
    # shard-count change is safe (training keeps the exact requested count
    # for stream reproducibility).
    try:
        n_cores = len(os.sched_getaffinity(0))
    except AttributeError:  # pragma: no cover - non-linux
        n_cores = os.cpu_count() or 1
    if ns.num_workers > n_cores:
        logger.info("Capping --num-workers %d to the %d available core(s)", ns.num_workers, n_cores)
        ns.num_workers = n_cores

    # int8 IPC + int8 device wire compose into a PASSTHROUGH: workers
    # quantize once, the parent ships the int8 block straight into the
    # device wire (scales ride alongside) — no dequantize/requantize round
    # trip in the single parent process (exact either way; r19c A/B showed
    # the round trip cost ~1 s of the 14 s warm e2e)
    int8_passthrough = (
        mel_wire == "int8" and os.environ.get("CM3P_INT8_IPC", "0") == "1"
    )
    loader = SampleLoader(
        dataset_factory, num_workers=ns.num_workers,
        ipc_dequantize=not int8_passthrough,
    )
    n_windows = 0
    t0 = time.perf_counter()
    # Wall-time decomposition of the extraction loop (logged at the end):
    #   loader   — blocked waiting on the sample stream (host pipeline +
    #              worker IPC; with 0 workers this IS the host pipeline)
    #   pack     — first-fit packing + flush-buffer assembly (main process)
    #   dispatch — _shard_rows device_put (host->device transfer) + the
    #              async jit dispatch
    #   drain    — blocking fetch of finished embeddings (device compute
    #              that the double-buffer could not hide, + relay latency)
    stage = {"loader": 0.0, "pack": 0.0, "dispatch": 0.0, "drain": 0.0}

    def _log_stages(total: float) -> None:
        parts = ", ".join(f"{k} {v:.1f}s" for k, v in stage.items())
        logger.info(
            "Stage breakdown: %s (accounted %.1fs of %.1fs wall)",
            parts, sum(stage.values()), total,
        )

    if ns.pack:
        from cm3p_tpu.processing.packing import pack_windows

        seq_len = processor.default_kwargs["beatmap_kwargs"].get("max_length", 4000)
        # Each distinct (rows, windows) pair is a fresh jit trace + lower
        # (~40 s of single-core Python per shape, on top of the XLA compile
        # the persistent cache avoids) — coarse buckets make a whole job
        # converge on one or two shapes. The padding it buys is bounded
        # (<=63 zero rows of dense compute, <=127 zero mel windows of
        # transfer) and only the tail flush pays it at steady state.
        # pad window count to a multiple to bound retraces (CPU: retraces are
        # cheap; keep padding tiny so smoke runs stay feasible)
        window_pad = 16 if cpu_backend else 128

        def flush(pending):
            nonlocal n_windows
            if not pending:
                return
            t_flush = time.perf_counter()
            seqs = [p[0] for p in pending]
            ids_list = [p[1] for p in pending]
            feats_list = [p[2] for p in pending]
            tails_list = [p[3] for p in pending]
            ipc_scales = [p[4] if len(p) > 4 else None for p in pending]
            packed = pack_windows(seqs, seq_len, pad_id=processor.beatmap_tokenizer.pad_token_id)
            if packed["input_ids"].shape[0] > ns.batch_size and len(pending) > 1:
                # the token-count flush trigger under-estimates rows when
                # first-fit fragments (windows just over seq_len/2 pack one
                # per row) — bisect so no device batch exceeds the row
                # budget (192 is the measured plateau; 320+ regresses and
                # eats HBM headroom, BASELINE.md rows scan)
                stage["pack"] += time.perf_counter() - t_flush
                mid = len(pending) // 2
                flush(pending[:mid])
                flush(pending[mid:])
                return
            # rows must split over the mesh; the coarse multiple keeps the
            # device shape stable across flushes (each distinct row count is
            # a fresh 30s-10min relay compile)
            row_mult = int(np.lcm(8 if cpu_backend else 64, n_dev))
            rows = -(-packed["input_ids"].shape[0] // row_mult) * row_mult
            input_ids = np.zeros((rows, seq_len), np.int32)
            segment_ids = np.zeros((rows, seq_len), np.int32)
            input_ids[: packed["input_ids"].shape[0]] = packed["input_ids"]
            segment_ids[: packed["segment_ids"].shape[0]] = packed["segment_ids"]
            w = len(seqs)
            w_pad = -(-w // window_pad) * window_pad
            window_rows = np.zeros(w_pad, np.int32)
            window_segments = np.full(w_pad, -1, np.int32)  # dummies select nothing
            window_rows[:w] = packed["window_to_row"]
            window_segments[:w] = packed["window_segment"]
            features = None
            tails = None
            scales = None
            if feats_list[0] is not None:
                f0 = np.asarray(feats_list[0])
                if compact_mel and mel_wire == "pcm":
                    features = np.zeros((w_pad,) + f0.shape, np.float32)
                    for wi, f in enumerate(feats_list):
                        features[wi] = f
                elif compact_mel and mel_wire == "int8":
                    # symmetric per-window int8: one abs-max + rint pass on
                    # the host halves the wire bytes; dequant fuses into the
                    # device graph (extract_packed_compact_q)
                    features = np.zeros((w_pad,) + f0.shape, np.int8)
                    scales = np.zeros((w_pad,), np.float32)
                    for wi, f in enumerate(feats_list):
                        f = np.asarray(f)
                        if f.dtype == np.int8:
                            # int8 IPC passthrough: the worker already
                            # quantized with the identical symmetric absmax
                            # quantizer — ship codes + scale as-is
                            features[wi] = f
                            scales[wi] = ipc_scales[wi]
                            continue
                        f = np.asarray(f, np.float32)
                        s = float(np.max(np.abs(f))) / 127.0 or 1.0
                        scales[wi] = s
                        # out of place: np.asarray returns the SAME buffer
                        # when f is already float32, and mutating the
                        # loader-provided window would corrupt any future
                        # buffer reuse/caching upstream
                        features[wi] = np.rint(f / s).astype(np.int8)
                else:
                    # build straight in the bf16 wire dtype: per-window
                    # assignment casts fp32 mel rows as they land, skipping a
                    # second full-buffer cast pass in _shard_rows
                    features = np.zeros((w_pad,) + f0.shape, jnp.bfloat16)
                    for wi, f in enumerate(feats_list):
                        features[wi] = f
                if compact_mel and mel_wire != "pcm":  # pcm: tail computed on device
                    tails = np.zeros((w_pad,), jnp.bfloat16)
                    for wi, t in enumerate(tails_list):
                        tails[wi] = t
            t_dispatch = time.perf_counter()
            stage["pack"] += t_dispatch - t_flush
            logger.info(
                "flush: rows=%d windows=%d wpad=%d%s", rows, w, w_pad,
                f" f_cap={features.shape[-1]}" if compact_mel and features is not None else "",
            )
            with mesh_ctx:
                if compact_mel and features is not None and mel_wire == "pcm":
                    dev = extract_packed_pcm(
                        params,
                        _shard_rows(input_ids),
                        _shard_rows(segment_ids),
                        jnp.asarray(window_rows),
                        jnp.asarray(window_segments),
                        _shard_rows(features, np.float32),
                    )
                elif compact_mel and features is not None and mel_wire == "int8":
                    dev = extract_packed_compact_q(
                        params,
                        _shard_rows(input_ids),
                        _shard_rows(segment_ids),
                        jnp.asarray(window_rows),
                        jnp.asarray(window_segments),
                        _shard_rows(features, np.int8),
                        jnp.asarray(scales),
                        jnp.asarray(tails),
                    )
                elif compact_mel and features is not None:
                    dev = extract_packed_compact(
                        params,
                        _shard_rows(input_ids),
                        _shard_rows(segment_ids),
                        jnp.asarray(window_rows),
                        jnp.asarray(window_segments),
                        _shard_rows(features, jnp.bfloat16),
                        jnp.asarray(tails),
                    )
                else:
                    dev = extract_packed(
                        params,
                        _shard_rows(input_ids),
                        _shard_rows(segment_ids),
                        jnp.asarray(window_rows),
                        jnp.asarray(window_segments),
                        # bf16 on the wire like the dense path: the tower runs
                        # bf16 anyway, and features dominate host->device bytes
                        _shard_rows(features, jnp.bfloat16),
                    )
            stage["dispatch"] += time.perf_counter() - t_dispatch
            # double-buffer: leave this batch in flight (jax dispatch is
            # async) and drain the previous one — host-side packing of the
            # next batch overlaps the device compute of this one
            inflight.append((dev, w, ids_list))
            if len(inflight) > 1:
                _drain(inflight.pop(0))
            n_windows += w

        def _drain(item):
            dev, w, ids_list = item
            t_drain = time.perf_counter()
            embeds = np.asarray(dev, np.float32)[:w]
            stage["drain"] += time.perf_counter() - t_drain
            _accumulate(embeds, ids_list)

        inflight: list = []
        pending: list = []
        # Eager flushing: dispatch a device batch as soon as `flush_rows`
        # packed rows are ready instead of accumulating the full row budget.
        # Through the relay the dispatch is async, so the flush's
        # host->device mel transfer and device compute then overlap the
        # loader's CPU work on the NEXT windows; only the small tail flush
        # is left un-overlapped (r9 warm e2e: one end-of-loader flush made
        # the 264 MB transfer + compute fully serial after the 17 s loader —
        # drain was 8.1 s of the 30 s wall). First-fit is simulated
        # incrementally in arrival order; the flush itself still packs FFD,
        # which does not exceed the arrival-order row count in practice
        # (the bisect guard in flush() bounds any pathology at batch_size).
        flush_rows = ns.flush_rows or min(64, ns.batch_size)
        sim_space: list[int] = []  # free tokens per simulated packed row
        sample_it = iter(loader)
        while True:
            t_wait = time.perf_counter()
            sample = next(sample_it, None)
            stage["loader"] += time.perf_counter() - t_wait
            if sample is None:
                break
            length = int(np.asarray(sample["attention_mask"]).sum())
            seq = np.asarray(sample["input_ids"])[:length]
            need = min(len(seq), seq_len)
            placed = False
            for r, free in enumerate(sim_space):
                if free >= need:
                    sim_space[r] = free - need
                    placed = True
                    break
            if not placed:
                if len(sim_space) >= flush_rows and pending:
                    flush(pending)
                    pending = []
                    sim_space = []
                sim_space.append(seq_len - need)
            pending.append(
                (
                    seq,
                    sample.get("beatmap_id"),
                    sample.get("input_features_pcm") if mel_wire == "pcm"
                    else sample.get("input_features"),
                    sample.get("input_features_tail"),
                    sample.get("_input_features_ipc_scale"),
                )
            )
        flush(pending)
        while inflight:
            _drain(inflight.pop(0))
        dt = time.perf_counter() - t0
        logger.info(
            "Packed-extracted %d window embeddings in %.1fs (%.1f windows/s)",
            n_windows, dt, n_windows / max(dt, 1e-9),
        )
        _log_stages(dt)
        _write_output(accumulator, metadata, ns)
        return

    def _drain_dense(item):
        dev, n_real, beatmap_ids = item
        if beatmap_ids is None:
            return
        t_drain = time.perf_counter()
        embeds = np.asarray(dev, np.float32)[:n_real]
        stage["drain"] += time.perf_counter() - t_drain
        _accumulate(embeds, np.asarray(beatmap_ids).tolist())

    dense_inflight: list = []
    batch_it = batched_loader(iter(loader), ns.batch_size, drop_last=False)
    while True:
        t_wait = time.perf_counter()
        batch = next(batch_it, None)
        stage["loader"] += time.perf_counter() - t_wait
        if batch is None:
            break
        beatmap_ids = batch.pop("beatmap_id", None)
        for drop in ("metadata_ids", "metadata_attention_mask", "metadata_variation_classes", "labels"):
            batch.pop(drop, None)
        n_real = len(batch["input_ids"])
        if mesh is not None and n_real % n_dev:
            # pad the tail batch so rows split over the mesh (also avoids a
            # tail-shape recompile); padding embeddings are sliced off below
            pad = -(-n_real // n_dev) * n_dev - n_real
            for key in list(batch):
                batch[key] = np.concatenate(
                    [batch[key], np.repeat(batch[key][:1], pad, axis=0)], axis=0
                )
        t_dispatch = time.perf_counter()
        with mesh_ctx:
            dev = extract(
                params,
                _shard_rows(batch["input_ids"]),
                _shard_rows(batch["attention_mask"]),
                _shard_rows(batch["input_features"], jnp.bfloat16)
                if "input_features" in batch
                else None,
            )
        stage["dispatch"] += time.perf_counter() - t_dispatch
        n_windows += n_real
        # double-buffer: drain the previous batch while this one computes
        dense_inflight.append((dev, n_real, beatmap_ids))
        if len(dense_inflight) > 1:
            _drain_dense(dense_inflight.pop(0))
    while dense_inflight:
        _drain_dense(dense_inflight.pop(0))
    dt = time.perf_counter() - t0
    logger.info("Extracted %d window embeddings in %.1fs (%.1f windows/s)", n_windows, dt, n_windows / max(dt, 1e-9))
    _log_stages(dt)
    _write_output(accumulator, metadata, ns)


def _write_output(accumulator, metadata, ns) -> None:
    # mean-pool per beatmap + re-normalize (reference :243-262)
    rows = []
    for bid, info in accumulator.items():
        mean_vec = info["sum"] / info["count"]
        norm = float((mean_vec**2).sum() ** 0.5)
        if norm > 0:
            mean_vec = mean_vec / norm
        beatmap_id = bid[-1] if isinstance(bid, tuple) else bid
        rows.append({"beatmap_id": int(beatmap_id), "embedding": mean_vec.tolist()})
    embeddings_df = pd.DataFrame(rows)

    meta_df = metadata.reset_index()
    if "Id" in meta_df.columns:
        meta_df["Id"] = meta_df["Id"].astype("int64")
        merged_df = embeddings_df.merge(meta_df, left_on="beatmap_id", right_on="Id", how="left")
    else:
        merged_df = embeddings_df

    final_df = merged_df
    if ns.merge_with:
        try:
            existing_df = pd.read_parquet(ns.merge_with)
            existing_df["Id"] = existing_df["Id"].astype("int64")
            for col in merged_df.columns:
                if col not in existing_df.columns:
                    existing_df[col] = pd.NA
            existing_idx = existing_df.set_index("Id").reindex(columns=merged_df.columns.drop("Id"))
            merged_idx = merged_df.set_index("Id").reindex(columns=existing_idx.columns)
            final_df = merged_idx.combine_first(existing_idx).reset_index()
            logger.info("Merged: existing=%d new=%d result=%d", len(existing_df), len(merged_df), len(final_df))
        except Exception as e:
            logger.warning("Merge with %s failed: %s", ns.merge_with, e)

    output_path = Path(ns.output)
    final_df.to_parquet(output_path, index=False)
    logger.info("Saved %d beatmap embeddings to %s", len(final_df), output_path.resolve())


if __name__ == "__main__":
    main()
