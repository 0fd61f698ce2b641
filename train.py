"""CM3P pretraining entry point.

Usage (mirrors the reference Hydra CLI, ``/root/reference/train.py:164``):

    python train.py --config-name v7 training.max_steps=1000 dataset.min_year=2010
    python train.py --config-name smoke        # synthetic data, tiny model

Builds the processor (populating metadata vocabularies from the dataset
when present), datasets, model, and optimizer from the composed YAML config
and runs the sharded training loop.
"""
from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

import numpy as np

logger = logging.getLogger(__name__)

REPO_ROOT = Path(__file__).parent


def build_processor(args: dict, dataset_cfg) -> "CM3PProcessor":
    from cm3p_tpu.audio import LogMelExtractor
    from cm3p_tpu.beatmap import BeatmapEventParser
    from cm3p_tpu.processing import CM3PProcessor
    from cm3p_tpu.tokenize import BeatmapTokenizer, MetadataTokenizer

    proc_cfg = args["processor"]
    metadata_tok_cfg = dict(proc_cfg["metadata_tokenizer"])

    # Populate modes/statuses/mappers/tags vocabularies from the dataset
    # metadata when not explicitly configured (reference train.py:227-251).
    needs_vocab = not all(metadata_tok_cfg.get(k) for k in ("modes", "statuses", "mappers", "tags"))
    if needs_vocab and not args["dataset"].get("synthetic"):
        try:
            from cm3p_tpu.data import filter_mmrs_metadata, load_mmrs_metadata

            train_meta = filter_mmrs_metadata(
                load_mmrs_metadata(dataset_cfg.train_dataset_paths),
                start=dataset_cfg.train_dataset_start,
                end=dataset_cfg.train_dataset_end,
                gamemodes=dataset_cfg.gamemodes,
                min_year=dataset_cfg.min_year,
                max_year=dataset_cfg.max_year,
                min_difficulty=dataset_cfg.min_difficulty,
                max_difficulty=dataset_cfg.max_difficulty,
            )
            reset = train_meta.reset_index()
            metadata_tok_cfg.setdefault("modes", reset.set_index("ModeInt")["Mode"].to_dict())
            metadata_tok_cfg.setdefault("statuses", reset.set_index("Ranked")["Status"].to_dict())
            metadata_tok_cfg.setdefault("mappers", reset.set_index("UserId")["Creator"].to_dict())
            if not metadata_tok_cfg.get("tags"):
                all_tag_ids = set(train_meta["TopTagIds"].explode().dropna().unique().tolist())
                tags_info = json.load(open(REPO_ROOT / "resources" / "tags.json", encoding="utf-8"))["tags"]
                metadata_tok_cfg["tags"] = {
                    int(t["id"]): {"name": t["name"], "ruleset_id": t["ruleset_id"], "description": t["description"]}
                    for t in tags_info
                    if int(t["id"]) in all_tag_ids
                }
        except FileNotFoundError:
            logger.warning("Dataset metadata not found; metadata vocabularies stay minimal")
    if needs_vocab and args["dataset"].get("synthetic"):
        # deterministic small vocab for smoke runs
        metadata_tok_cfg.setdefault("modes", {0: "osu", 1: "taiko", 2: "fruits", 3: "mania"})
        metadata_tok_cfg.setdefault("statuses", {1: "ranked", -2: "graveyard"})
        metadata_tok_cfg.setdefault("mappers", {0: "mapper_a", 1: "mapper_b"})
        metadata_tok_cfg.setdefault("tags", {1: {"name": "jump"}, 2: {"name": "stream"}})

    metadata_tok_cfg = {k: v for k, v in metadata_tok_cfg.items() if v is not None}
    return CM3PProcessor(
        audio_feature_extractor=LogMelExtractor(**proc_cfg["audio_feature_extractor"]),
        beatmap_parser=BeatmapEventParser(**proc_cfg["beatmap_parser"]),
        beatmap_tokenizer=BeatmapTokenizer(**proc_cfg["beatmap_tokenizer"]),
        metadata_tokenizer=MetadataTokenizer(**metadata_tok_cfg),
        default_kwargs=proc_cfg.get("default_kwargs"),
    )


def synthetic_batches(args: dict, cfg, processor, test: bool, seed: int = 0):
    """Random fixed-shape batches matching the processor contract (smoke runs)."""
    training = args["training"]
    dataset = args["dataset"]
    bsz = training["per_device_eval_batch_size" if test else "per_device_train_batch_size"]
    seq = args["processor"]["default_kwargs"]["beatmap_kwargs"]["max_length"]
    mel_frames = args["processor"]["default_kwargs"]["audio_kwargs"]["pad_to_multiple_of"] // args[
        "processor"
    ]["default_kwargs"]["audio_kwargs"]["hop_length"]
    variations = dataset["test_metadata_variations" if test else "train_metadata_variations"]
    bc = cfg.beatmap_config
    rng = np.random.default_rng(seed + int(test))

    def gen():
        n_audio = mel_frames // 8
        for _ in range(10_000):
            ids = rng.integers(5, min(bc.vocab_size - 20, 3000), (bsz, seq)).astype(np.int32)
            ids[:, 0] = bc.audio_sos_token_id
            ids[:, 1 : 1 + n_audio] = bc.audio_token_id
            ids[:, 1 + n_audio] = bc.audio_eos_token_id
            batch = {
                "input_ids": ids,
                "attention_mask": np.ones((bsz, seq), np.int32),
                "input_features": rng.standard_normal((bsz, bc.audio_config.n_mels, mel_frames)).astype(
                    np.float32
                ),
            }
            if dataset["include_metadata"] and args["model_cls"] == "CM3PModule":
                mv = max(variations, 1)
                batch["metadata_ids"] = rng.integers(
                    0, cfg.metadata_config.vocab_size, (bsz, mv, 24)
                ).astype(np.int32)
                batch["metadata_attention_mask"] = np.ones((bsz, mv, 24), np.int32)
                classes = np.ones((bsz, mv), np.int32)
                classes[:, 0] = 0
                batch["metadata_variation_classes"] = classes
            if dataset["labels"] == "masked_lm":
                labels = np.where(rng.random((bsz, seq)) < 0.15, ids, -100).astype(np.int32)
                batch["labels"] = labels
            elif dataset["labels"] == "ranked_classification":
                batch["labels"] = rng.integers(0, 2, (bsz,)).astype(np.int32)
            yield batch

    return gen


class MmrsDatasetFactory:
    """Picklable dataset factory: loader workers are spawn-based processes,
    so the factory crossing the process boundary must not be a closure."""

    def __init__(
        self, ds_cfg, processor, test: bool, process_id: int, process_count: int,
        seed=None, epoch: int = 0,
    ):
        self.ds_cfg = ds_cfg
        self.processor = processor
        self.test = test
        self.process_id = process_id
        self.process_count = process_count
        self.seed = seed
        self.epoch = epoch

    def __call__(self, worker_id: int, num_workers: int):
        from cm3p_tpu.data import MmrsDataset

        return MmrsDataset(
            self.ds_cfg, self.processor, test=self.test, worker_id=worker_id,
            num_workers=num_workers, process_id=self.process_id,
            process_count=self.process_count, seed=self.seed, epoch=self.epoch,
        )


def mmrs_batches(args: dict, processor, test: bool):
    from cm3p_tpu.data import DatasetConfig, SampleLoader, batched_loader

    dataset_kwargs = {k: v for k, v in args["dataset"].items() if k != "synthetic"}
    ds_cfg = DatasetConfig(**dataset_kwargs)
    training = args["training"]
    bsz = training["per_device_eval_batch_size" if test else "per_device_train_batch_size"]
    num_workers = 0 if test else training.get("num_workers", 0)
    packed = training.get("packed", False)

    # seeded-by-config data streams (the reference gets this from HF
    # set_seed seeding torch DataLoader workers); the epoch counter advances
    # the per-epoch shuffle each time the trainer restarts the stream
    data_seed = training.get("seed")
    epoch_state = {"next": 0}

    def _data_shard():
        # shard by data-axis GROUP, not raw process id: with TP spanning
        # processes, the model columns of one data shard must feed identical
        # rows (parallel/distributed.py data_shard_group)
        import jax

        if jax.process_count() == 1:
            return 0, 1
        from cm3p_tpu.parallel.distributed import data_shard_group
        from cm3p_tpu.parallel.mesh import make_mesh

        return data_shard_group(make_mesh(model=training.get("model_axis", 1)))

    def build_iter(epoch: int):
        shard_id, shard_count = _data_shard()
        dataset_factory = MmrsDatasetFactory(
            ds_cfg, processor, test, shard_id, shard_count,
            seed=data_seed, epoch=epoch,
        )
        loader = SampleLoader(dataset_factory, num_workers=num_workers)
        if packed:
            from cm3p_tpu.data.packing_collator import packed_batches

            seq_len = args["processor"]["default_kwargs"]["beatmap_kwargs"].get("max_length", 4000)
            return packed_batches(
                iter(loader),
                rows=bsz,
                seq_len=seq_len,
                pad_id=processor.beatmap_tokenizer.pad_token_id,
                max_windows=training.get("packed_max_windows", bsz * 8),
            )
        return batched_loader(iter(loader), bsz, drop_last=True)

    def factory(start_step: int = 0):
        # resume seek (Trainer.skip_batches_on_resume routes here instead of
        # replaying the whole host pipeline): jump whole epochs for free when
        # the operator configures training.batches_per_epoch (read it off any
        # prior run's step log), then replay only the intra-epoch remainder
        epoch = 0 if test else epoch_state["next"]
        skip = 0
        bpe = training.get("batches_per_epoch")
        if start_step and not test:
            if bpe:
                epoch, skip = divmod(start_step, int(bpe))
                logger.info(
                    "resume seek: epoch %d + %d-batch replay "
                    "(training.batches_per_epoch=%d)", epoch, skip, int(bpe),
                )
            elif data_seed is not None:
                skip = start_step
                logger.info(
                    "resume seek: replaying %d batches through the host "
                    "pipeline (set training.batches_per_epoch to make deep "
                    "resumes cheap)", skip,
                )
            else:
                logger.info(
                    "resume seek: unseeded data stream — starting a fresh "
                    "epoch instead of replaying %d batches", start_step,
                )
        if not test:
            epoch_state["next"] = epoch + 1
        it = build_iter(epoch)
        for done in range(skip):
            try:
                next(it)
            except StopIteration:
                logger.warning(
                    "resume seek: epoch %d ended after %d batches (< the "
                    "configured replay of %d); continuing at epoch %d",
                    epoch, done, skip, epoch + 1,
                )
                epoch_state["next"] = epoch + 2
                it = build_iter(epoch + 1)
                break
        return it

    return factory


def build_model(args: dict, processor):
    """Model config + module from the composed YAML config.

    Tokenizer-driven ids (reference train.py:274-293): the processor's real
    vocab sizes overwrite the config's — OOB embedding ids are silent NaN
    on TPU, so every entry point pairing a tokenizer with a model config
    must route through here.
    """
    import jax
    import jax.numpy as jnp

    from cm3p_tpu.configs import BeatmapConfig, CM3PConfig, MetadataConfig
    from cm3p_tpu.models import ClassifierModule, CM3PModule, MaskedLMModule
    from cm3p_tpu.utils.platform import resolve_attn_impl

    model_cfg = CM3PConfig(
        metadata_config=MetadataConfig(**args["model"]["metadata_config"]),
        beatmap_config=BeatmapConfig(**args["model"]["beatmap_config"]),
        **{k: v for k, v in args["model"].items() if k not in ("metadata_config", "beatmap_config")},
    )
    bt = processor.beatmap_tokenizer
    mt = processor.metadata_tokenizer
    model_cfg.beatmap_config.vocab_size = bt.vocab_size
    model_cfg.beatmap_config.pad_token_id = bt.pad_token_id
    model_cfg.beatmap_config.bos_token_id = bt.bos_token_id
    model_cfg.beatmap_config.eos_token_id = bt.eos_token_id
    model_cfg.beatmap_config.audio_sos_token_id = bt.convert_tokens_to_ids(bt.audio_bos_token)
    model_cfg.beatmap_config.audio_eos_token_id = bt.convert_tokens_to_ids(bt.audio_eos_token)
    model_cfg.beatmap_config.audio_token_id = bt.audio_token_id
    model_cfg.metadata_config.vocab_size = mt.vocab_size
    model_cfg.metadata_config.pad_token_id = mt.pad_token_id
    model_cfg.metadata_config.bos_token_id = mt.bos_token_id
    model_cfg.metadata_config.eos_token_id = mt.eos_token_id

    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    common = dict(
        dtype=dtype,
        attn_impl=resolve_attn_impl(args.get("attn_impl", "pallas")),
        remat=args.get("remat", True),
    )
    if args["model_cls"] == "MaskedLMModule":
        model = MaskedLMModule(model_cfg.beatmap_config, **common)
    elif args["model_cls"] == "ClassifierModule":
        model = ClassifierModule(model_cfg.beatmap_config, **common)
    else:
        # meta_pack: pack G metadata variations per encoder row (exact same
        # attention via segment masks; tests/test_meta_pack.py pins parity)
        model = CM3PModule(model_cfg, meta_pack=int(args.get("meta_pack", 0)), **common)
    return model_cfg, model


def build_optimizer(args: dict):
    import optax

    from cm3p_tpu.train.muon import muon as make_muon

    training = args["training"]
    lr = training["learning_rate"]
    warmup = training.get("warmup_steps", 0)
    decay = optax.linear_schedule(lr, 0.0, max(training["max_steps"] - warmup, 1))
    if warmup > 0:
        schedule = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup), decay], [warmup]
        )
    else:
        schedule = decay
    if training.get("optim") == "muon":
        tx = make_muon(
            schedule,
            adamw_lr_ratio=0.25,
            adamw_betas=(training.get("adam_beta1", 0.9), training.get("adam_beta2", 0.999)),
            adamw_eps=training.get("adam_epsilon", 1e-8),
            adamw_weight_decay=training.get("weight_decay", 0.0),
            # True reproduces the reference's AdamW-lr quirk (muon_utils.py:
            # 201-203: Muon lr applied to the AdamW update). REQUIRED when
            # finetuning a converted reference checkpoint with reference
            # hyperparameters, else optimizer dynamics diverge; fresh
            # training wants the standard False default. See
            # configs/train/finetune_reference.yaml.
            compat_adamw_lr=bool(training.get("muon_compat_adamw_lr", False)),
        )
    else:
        tx = optax.adamw(
            schedule,
            b1=training.get("adam_beta1", 0.9),
            b2=training.get("adam_beta2", 0.999),
            eps=training.get("adam_epsilon", 1e-8),
            weight_decay=training.get("weight_decay", 0.0),
        )

    # freezing (reference train.py:313-321 + UnfreezeBeatmapCallback)
    frozen_prefixes = []
    if args.get("freeze_beatmap_model"):
        frozen_prefixes.append("beatmap_model")
    if args.get("freeze_metadata_model"):
        frozen_prefixes.append("metadata_model")
    if frozen_prefixes:
        unfreeze_at = args.get("unfreeze_beatmap_model_at_step")

        def mask_fn(params):
            import jax

            def label(path, _):
                top = str(getattr(path[0], "key", path[0]))
                return top in frozen_prefixes

            return jax.tree_util.tree_map_with_path(label, params)

        if unfreeze_at:
            gate = optax.scale_by_schedule(lambda count: (count >= unfreeze_at).astype(float))
        else:
            gate = optax.set_to_zero()
        tx = optax.chain(tx, optax.masked(gate, mask_fn))
    return tx


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config-name", "-cn", default="v1")
    parser.add_argument("--config-dir", default=str(REPO_ROOT / "configs" / "train"))
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("overrides", nargs="*", help="dotted config overrides a.b=c")
    cli = parser.parse_args(argv)

    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s - %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S",
        handlers=[logging.StreamHandler(sys.stdout)],
        level=logging.INFO,
    )

    cpu_gloo_configured = False
    if cli.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        # CPU cluster (tests, local rehearsal of the pod path): device
        # count and collectives must be set BEFORE any backend init, so
        # read them from the raw overrides here rather than the loaded
        # config (tests/test_multihost_entry.py). A malformed value must
        # fail HERE, loudly — swallowing it would silently skip gloo and
        # the later jax.distributed.initialize fails confusingly.
        ov = dict(o.split("=", 1) for o in cli.overrides if "=" in o)
        if ov.get("training.multihost", "").lower() in ("true", "1"):
            try:
                cpu_devices = int(ov.get("training.cpu_devices", 4))
            except ValueError:
                parser.error(
                    f"training.cpu_devices must be an integer, got {ov['training.cpu_devices']!r}"
                )
            jax.config.update("jax_num_cpu_devices", cpu_devices)
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
            cpu_gloo_configured = True

    from cm3p_tpu.utils.config import load_config

    args = load_config(cli.config_dir, cli.config_name, cli.overrides)
    training = args["training"]

    import jax
    import jax.numpy as jnp

    # multi-host TPU pods: initialize the process group BEFORE any other
    # backend use so jax.devices() spans the whole pod and the mesh/pjit
    # path needs no further changes (collectives ride ICI/DCN automatically).
    # This MUST precede enable_compilation_cache(): the cache probe
    # initializes the XLA backend, after which jax.distributed.initialize
    # refuses to run (found by tests/test_multihost_entry.py — the bug
    # would have surfaced only on a real pod).
    if training.get("multihost", False):
        if cli.cpu and not cpu_gloo_configured:
            # multihost came from the YAML config, which is only loaded after
            # the backend knobs had to be set — the backend would init with 1
            # CPU device and no gloo, and initialize() would fail confusingly
            raise SystemExit(
                "multihost-on-CPU requires `training.multihost=true` (and "
                "optionally `training.cpu_devices=N`) as CLI overrides, not "
                "only YAML keys: the CPU device count and gloo collectives "
                "must be configured before the backend initializes."
            )
        from cm3p_tpu.parallel.distributed import initialize_distributed

        initialize_distributed(
            coordinator_address=training.get("coordinator_address"),
            num_processes=training.get("num_processes"),
            process_id=training.get("process_id"),
            # bounds failure DETECTION on a preempted pod: a SIGKILLed peer
            # fails the survivors within this window instead of hanging them
            # in a collective (tests/test_mp_preemption.py measures the bound)
            heartbeat_timeout_seconds=training.get("heartbeat_timeout_seconds"),
        )

    from cm3p_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from cm3p_tpu.data import DatasetConfig
    from cm3p_tpu.models import CM3PModule
    from cm3p_tpu.train import Trainer
    from cm3p_tpu.train.checkpoint import save_model

    np.random.seed(training["seed"])

    dataset_kwargs = {k: v for k, v in args["dataset"].items() if k != "synthetic"}
    ds_cfg = DatasetConfig(**dataset_kwargs)
    processor = build_processor(args, ds_cfg)
    model_cfg, model = build_model(args, processor)

    if args["dataset"].get("synthetic"):
        train_factory = synthetic_batches(args, model_cfg, processor, test=False, seed=training["seed"])
        eval_factory = synthetic_batches(args, model_cfg, processor, test=True, seed=training["seed"])
    else:
        train_factory = mmrs_batches(args, processor, test=False)
        eval_factory = mmrs_batches(args, processor, test=True)

    forward_method = None
    if training.get("packed", False):
        if args["model_cls"] != "CM3PModule":
            raise ValueError("training.packed currently supports model_cls=CM3PModule")
        forward_method = CM3PModule.forward_packed

    tx = build_optimizer(args)
    output_dir = Path(training["output_dir"])

    trainer = Trainer(
        model,
        tx,
        train_factory,
        eval_factory,
        output_dir=str(output_dir),
        max_steps=training["max_steps"],
        gradient_accumulation_steps=training["gradient_accumulation_steps"],
        logging_steps=training["logging_steps"],
        eval_steps=training["eval_steps"],
        max_eval_batches=training.get("max_eval_batches", 50),
        save_steps=training["save_steps"],
        save_total_limit=training["save_total_limit"],
        seed=training["seed"],
        model_axis=training.get("model_axis", 1),
        resume=not training.get("overwrite_output_dir", False),
        from_pretrained=args.get("from_pretrained"),
        from_pretrained_allow_missing=args.get("from_pretrained_allow_missing", False),
        load_best_model_at_end=training.get("load_best_model_at_end", False),
        eval_has_variations=args["model_cls"] == "CM3PModule",
        labels_kind=args["dataset"]["labels"],
        forward_method=forward_method,
        wandb_project=args.get("wandb_project"),
        wandb_entity=args.get("wandb_entity"),
        wandb_mode=args.get("wandb_mode"),
        run_config=args,
    )

    state = trainer.train()
    final_metrics = trainer.evaluate(state) if eval_factory else {}
    final_step = int(state.step) // max(training["gradient_accumulation_steps"], 1)
    trainer._log({"step": final_step, **{f"final_eval_{k}": v for k, v in final_metrics.items() if v is not None}})

    save_model(str(output_dir / "model"), jax.device_get(state.params), config=model_cfg)
    processor.save_pretrained(str(output_dir / "processor"))
    trainer.close()
    logger.info("Training complete; artifacts in %s", output_dir)


if __name__ == "__main__":
    main()
