"""Training loop: sharded steps, grad accumulation, eval, checkpoints, logs.

The HF-Trainer replacement (reference ``train.py:360-394``), built around a
single pjit-compiled step on a (data, model) mesh. Gradient accumulation is
an ``optax.MultiSteps`` wrapper, logging is stdout + JSONL, checkpointing is
async Orbax with auto-resume, and evaluation accumulates the reference's
metric suite (loss, zero-shot variation ranking, MLM/classification acc).
"""
from __future__ import annotations

import json
import os
import logging
import time
from pathlib import Path
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..parallel.mesh import make_mesh
from .checkpoint import CheckpointManager
from .metrics import MetricAccumulator
from ..parallel.distributed import put_global_batch
from .train_state import TrainState, create_train_state, make_eval_step, make_train_step, shard_train_step

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        model,
        tx: optax.GradientTransformation,
        train_iter_factory: Callable[[], Iterator[dict]],
        eval_iter_factory: Optional[Callable[[], Iterator[dict]]] = None,
        *,
        output_dir: str = "output",
        max_steps: int = 1000,
        gradient_accumulation_steps: int = 1,
        logging_steps: int = 10,
        eval_steps: int = 1000,
        max_eval_batches: int = 50,
        save_steps: int = 1000,
        save_total_limit: int = 3,
        seed: int = 42,
        mesh=None,
        model_axis: int = 1,
        resume: bool = True,
        from_pretrained: Optional[str] = None,
        from_pretrained_allow_missing: bool = False,
        load_best_model_at_end: bool = False,
        eval_has_variations: bool = True,
        labels_kind: str = "none",
        skip_batches_on_resume: bool = True,
        forward_method=None,
        wandb_project: Optional[str] = None,
        wandb_entity: Optional[str] = None,
        wandb_mode: Optional[str] = None,
        run_config: Optional[dict] = None,
    ):
        self.model = model
        if gradient_accumulation_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation_steps)
        self.tx = tx
        self.train_iter_factory = train_iter_factory
        self.eval_iter_factory = eval_iter_factory
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.max_steps = max_steps
        self.grad_accum = gradient_accumulation_steps
        self.logging_steps = logging_steps
        self.eval_steps = eval_steps
        self.max_eval_batches = max_eval_batches
        self.seed = seed
        self.mesh = mesh or make_mesh(model=model_axis)
        self.resume = resume
        self.from_pretrained = from_pretrained
        self.from_pretrained_allow_missing = from_pretrained_allow_missing
        self.load_best_model_at_end = load_best_model_at_end
        self.eval_has_variations = eval_has_variations
        self._best_eval_loss: Optional[float] = None
        self._best_eval_step: Optional[int] = None
        self._last_eval: dict = {}
        self.labels_kind = labels_kind
        self.forward_method = forward_method
        self.skip_batches_on_resume = skip_batches_on_resume

        self.ckpt = CheckpointManager(
            str(self.output_dir / "checkpoints"),
            save_interval_steps=save_steps,
            max_to_keep=save_total_limit,
        )
        from ..parallel.distributed import is_primary

        # multi-host: only process 0 writes human-facing logs / wandb /
        # result files; checkpointing still runs on every process (orbax
        # coordinates multihost saves internally)
        self._primary = is_primary()
        self._log_file = open(
            self.output_dir / "train_log.jsonl" if self._primary else os.devnull, "a"
        )
        self._jitted = None
        self._state_sharding = None
        self._batch_sharding = None
        self._eval_fn = None

        # optional wandb (reference train.py:176-181); JSONL always writes
        self._wandb = None
        if wandb_project and self._primary:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project,
                    entity=wandb_entity,
                    mode=wandb_mode or "online",
                    config=run_config,
                    dir=str(self.output_dir),
                )
            except Exception as e:  # pragma: no cover - offline envs
                logger.warning("wandb init failed (%s); JSONL logging only", e)

    # ------------------------------------------------------------------ setup

    def _setup(self, example_batch: dict) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        state = create_train_state(self.model, self.tx, rng, example_batch, method=self.forward_method)

        if self.from_pretrained:
            # finetune bootstrap (reference train.py from_pretrained key):
            # load starting params from an earlier run's model/ dir — either
            # our native Orbax layout or an HF-layout (converted/exported)
            # checkpoint directory
            import os

            if os.path.exists(os.path.join(self.from_pretrained, "model.safetensors")) or any(
                f.startswith("pytorch_model") for f in os.listdir(self.from_pretrained)
            ):
                from ..interop import load_hf_checkpoint

                _, loaded = load_hf_checkpoint(self.from_pretrained)
            else:
                from .checkpoint import load_model

                # template-free restore: the checkpoint's own tree comes back
                # as saved — a model-shaped template would make orbax raise on
                # any cross-class (staged-lineage) bootstrap before the
                # key-wise merge below ever runs
                loaded = load_model(self.from_pretrained)
            # key-wise merge restricted to the MODEL's tree: every model
            # param must be present in the checkpoint; checkpoint-only
            # extras (e.g. a decoder head this config doesn't use) are
            # dropped — keeping them would desynchronize state.params from
            # the opt_state the optimizer was init'd on and crash the first
            # tx.update with a pytree mismatch
            import flax.traverse_util as tu

            flat_t = tu.flatten_dict(state.params)
            flat_l = tu.flatten_dict(loaded)
            missing = set(flat_t) - set(flat_l)
            if missing:
                # strict by default: a same-class bootstrap missing params is
                # drift. allow_missing enables the staged-lineage transfers
                # (MLM pretrain -> contrastive -> classifier, reference
                # train.py:304-311 via HF from_pretrained's partial-load
                # semantics): shared-path params load, the rest keep their
                # fresh init
                if not self.from_pretrained_allow_missing:
                    raise ValueError(f"from_pretrained is missing params: {sorted(missing)[:5]}")
                if not (set(flat_t) & set(flat_l)):
                    raise ValueError("from_pretrained: no overlapping params at all")
                logger.warning(
                    "from_pretrained: %d/%d params newly initialized (e.g. %s)",
                    len(missing), len(flat_t), "/".join(sorted(missing)[0]),
                )
            extras = set(flat_l) - set(flat_t)
            if extras:
                logger.info(
                    "from_pretrained: ignoring %d checkpoint-only params (e.g. %s)",
                    len(extras),
                    "/".join(sorted(extras)[0]),
                )
            for k in set(flat_t) & set(flat_l):
                if tuple(flat_t[k].shape) != tuple(np.shape(flat_l[k])):
                    raise ValueError(
                        f"from_pretrained shape mismatch at {'/'.join(k)}: "
                        f"{tuple(np.shape(flat_l[k]))} vs model {tuple(flat_t[k].shape)}"
                    )
            merged = {
                k: jnp.asarray(flat_l[k], flat_t[k].dtype) if k in flat_l else flat_t[k]
                for k in flat_t
            }
            logger.info("Initialized params from %s", self.from_pretrained)
            state = state._replace(params=tu.unflatten_dict(merged))

        train_step = make_train_step(self.model, self.tx, method=self.forward_method)
        with self.mesh:
            self._jitted, self._state_sharding, self._batch_sharding = shard_train_step(
                train_step, self.mesh, state, example_batch
            )
            latest = self.ckpt.latest_step() if self.resume else None
            if latest is not None:
                logger.info("Resuming from checkpoint step %d", latest)
                # restore straight into the mesh shardings via an abstract
                # template: each process reads only its addressable shards,
                # and no committed single-device arrays are created (a
                # device_put of those to a cross-process sharding is a
                # cross-host transfer the CPU/TPU backends may not support).
                # the restored state.step carries the micro-step counter
                template = jax.tree.map(
                    lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=s),
                    state,
                    self._state_sharding,
                )
                state = self.ckpt.restore(template)
            else:
                state = jax.device_put(state, self._state_sharding)
        return state

    def _log(self, record: dict) -> None:
        record = {k: (float(v) if hasattr(v, "item") else v) for k, v in record.items()}
        self._log_file.write(json.dumps(record) + "\n")
        self._log_file.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in record.items() if k != "step"}, step=record.get("step"))
        logger.info(" ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in record.items()))

    # ------------------------------------------------------------------ train

    def train(self) -> TrainState:
        data_iter = iter(self.train_iter_factory())
        first_batch = next(data_iter)
        state = self._setup(first_batch)
        dropout_rng = jax.random.PRNGKey(self.seed + 1)

        start_step = int(state.step)
        window_t0 = time.perf_counter()
        window_loss = 0.0
        window_count = 0

        batch = first_batch
        if start_step > 0 and self.skip_batches_on_resume:
            # fast-forward the stream so step k+1 trains on batch k — resume
            # continues the same data order the uninterrupted run would have
            # seen (the reference inherits this from HF Trainer; its
            # ignore_data_skip=False default). A factory taking start_step
            # can seek directly instead of replaying the host pipeline.
            import inspect

            try:
                fparams = inspect.signature(self.train_iter_factory).parameters
            except (TypeError, ValueError):  # pragma: no cover - builtins
                fparams = {}
            if "start_step" in fparams:
                data_iter = iter(self.train_iter_factory(start_step=start_step))
                batch = next(data_iter)
            else:
                logger.info(
                    "resume: replaying %d host-pipeline batches to restore data "
                    "order (factory has no start_step seek — for deep resumes "
                    "implement one, or set skip_batches_on_resume=False)",
                    start_step,
                )
                for _ in range(start_step):
                    try:
                        batch = next(data_iter)
                    except StopIteration:
                        data_iter = iter(self.train_iter_factory())
                        batch = next(data_iter)
        # state.step counts micro-steps; optimizer steps advance every
        # grad_accum micro-steps (optax.MultiSteps)
        micro_steps = self.max_steps * self.grad_accum - start_step
        pending_losses: list = []  # device arrays; synced only when logging
        micro_base = start_step
        with self.mesh:
            for micro in range(micro_steps):
                batch_dev = put_global_batch(batch, self._batch_sharding)
                state, metrics = self._jitted(state, batch_dev, dropout_rng)
                pending_losses.append(metrics["loss"])
                window_count += 1

                step = micro_base + micro + 1
                if window_count and step % self.grad_accum == 0:
                    opt_step = step // self.grad_accum
                    if opt_step % max(self.logging_steps, 1) == 0:
                        # single host sync per logging window keeps the device
                        # pipeline full between logs
                        window_loss = float(jnp.mean(jnp.stack(pending_losses)))
                        pending_losses = []
                        dt = time.perf_counter() - window_t0
                        self._log(
                            {
                                "step": opt_step,
                                "loss": window_loss,
                                "grad_norm": float(metrics["grad_norm"]),
                                "steps_per_sec": window_count / self.grad_accum / max(dt, 1e-9),
                                "samples_per_sec": window_count
                                * int(batch_dev["input_ids"].shape[0])
                                / max(dt, 1e-9),
                            }
                        )
                        window_t0 = time.perf_counter()
                        window_count = 0

                    # eval_steps <= 0 disables periodic eval (HF semantics:
                    # no eval schedule), rather than dividing by zero
                    if (
                        self.eval_iter_factory is not None
                        and self.eval_steps > 0
                        and opt_step % self.eval_steps == 0
                        and opt_step > 0
                    ):
                        eval_metrics = self.evaluate(state)
                        self._log({"step": opt_step, **{f"eval_{k}": v for k, v in eval_metrics.items() if v is not None}})
                        self._last_eval = eval_metrics
                        eval_loss = eval_metrics.get("loss")
                        if eval_loss is not None and (
                            self._best_eval_loss is None or eval_loss < self._best_eval_loss
                        ):
                            self._best_eval_loss = float(eval_loss)
                            self._best_eval_step = opt_step
                            # persist the best step and pin it against
                            # max_to_keep pruning (fixes the retention race
                            # the reference inherits from HF Trainer)
                            self.ckpt.protect(opt_step)
                            if self.ckpt.latest_step() != opt_step:
                                self.ckpt.save(opt_step, state, force=True)

                    # orbax takes the sharded arrays directly (each process
                    # persists its addressable shards; the device->host copy
                    # happens synchronously inside save(), so the donation of
                    # state to the next step is safe). device_get here would
                    # crash on any mesh whose shards span processes.
                    if self.ckpt.should_save(opt_step):
                        self.ckpt.save(opt_step, state)
                    if opt_step >= self.max_steps:
                        break

                try:
                    batch = next(data_iter)
                except StopIteration:
                    data_iter = iter(self.train_iter_factory())
                    batch = next(data_iter)

        final_step = int(state.step) // self.grad_accum
        if self.ckpt.latest_step() != final_step:
            self.ckpt.save(final_step, state, force=True)
        self.ckpt.wait()

        # reference parity: trainer.save_metrics -> *_results.json
        # (train.py:378-386) and load_best_model_at_end (default.yaml:36-38)
        results = {
            "final_step": final_step,
            "train_loss": window_loss,
            "best_eval_loss": self._best_eval_loss,
            "best_eval_step": self._best_eval_step,
        }
        if self._primary:
            (self.output_dir / "train_results.json").write_text(json.dumps(results, indent=2))
            if self._last_eval:
                (self.output_dir / "eval_results.json").write_text(
                    json.dumps({k: v for k, v in self._last_eval.items() if v is not None}, indent=2)
                )
        if (
            self.load_best_model_at_end
            and self._best_eval_step is not None
            and self._best_eval_step != final_step
        ):
            # abstract template with the live shardings: each process restores
            # only its addressable shards (device_get of a cross-process state
            # would crash, and a concrete template would double host memory)
            template = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
                state,
            )
            restored = self.ckpt.restore(template, step=self._best_eval_step)
            if restored is not None:
                logger.info("restoring best checkpoint (step %d, eval_loss %.5g)",
                            self._best_eval_step, self._best_eval_loss)
                state = restored
            else:
                logger.warning("best checkpoint step %d no longer on disk", self._best_eval_step)
        return state

    # ------------------------------------------------------------------- eval

    def evaluate(self, state: TrainState) -> dict:
        """Evaluate on the mesh; multihost-correct.

        Each process feeds its local eval rows (same-shaped batches, disjoint
        content); the batch is assembled into a global array via
        ``put_global_batch`` and the eval step is jitted with replicated
        outputs so host-side metric accumulation sees the FULL global rows
        identically on every process. Labels/classes ride through the jit as
        auxiliary outputs — fetching them from the (data-sharded) input batch
        would crash once the mesh spans processes.

        Per-host batch COUNTS may legitimately differ (strided metadata
        shards don't divide evenly — ``MmrsDataset.get_sharded_metadata``),
        so before every step all hosts agree whether everyone still has a
        batch (``all_processes_have``); evaluation truncates to the shortest
        shard instead of hanging the pod in a collective one host never
        joins. The dropped tail is logged.
        """
        from ..parallel.mesh import batch_shardings, replicated

        if self._eval_fn is None:
            eval_step = make_eval_step(self.model, method=self.forward_method)

            def eval_step_full(state, batch):
                out = eval_step(state, batch)
                aux = {
                    k: batch[k]
                    for k in ("metadata_variation_classes", "labels")
                    if k in batch
                }
                return out, aux

            if self._state_sharding is not None:
                self._eval_fn = jax.jit(
                    eval_step_full, out_shardings=replicated(self.mesh)
                )
            else:
                self._eval_fn = jax.jit(eval_step_full)
        from ..parallel.distributed import all_processes_have

        acc = MetricAccumulator()
        losses = []
        eval_iter = iter(self.eval_iter_factory())
        i = 0
        while i < self.max_eval_batches:
            try:
                batch = next(eval_iter)
                local_have = True
            except StopIteration:
                batch = None
                local_have = False
            if not all_processes_have(local_have):
                if local_have:
                    logger.warning(
                        "evaluate: truncating at batch %d — another host's eval "
                        "shard is exhausted (unequal per-host batch counts); "
                        "this host's remaining batches are dropped", i,
                    )
                break
            i += 1
            batch = {k: v for k, v in batch.items() if k != "beatmap_id"}
            has_labels = "labels" in batch
            if self._state_sharding is not None:
                with self.mesh:
                    batch = put_global_batch(batch, batch_shardings(self.mesh, batch))
            else:
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
            out, aux = self._eval_fn(state, batch)
            if getattr(out, "loss", None) is not None:
                losses.append(float(out.loss))
            if (
                self.eval_has_variations
                and getattr(out, "logits_per_beatmap", None) is not None
                and "metadata_variation_classes" in aux
            ):
                acc.update_zero_shot(
                    np.asarray(out.logits_per_beatmap),
                    np.asarray(aux["metadata_variation_classes"]),
                )
            if has_labels and getattr(out, "logits", None) is not None:
                labels = aux["labels"]
                if self.labels_kind == "masked_lm":
                    acc.update_masked_lm(np.asarray(out.logits), np.asarray(labels))
                elif self.labels_kind == "ranked_classification":
                    acc.update_classification(np.asarray(out.logits), np.asarray(labels))
        result = acc.result()
        if losses:
            result["loss"] = float(np.mean(losses))
        return result

    def close(self):
        self._log_file.close()
        self.ckpt.close()
        if self._wandb is not None:
            self._wandb.finish()
