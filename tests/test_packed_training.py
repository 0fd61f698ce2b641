"""Packed contrastive training: loss equivalence and collator contracts."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3p_tpu.configs import tiny_cm3p_config
from cm3p_tpu.data.packing_collator import packed_batches
from cm3p_tpu.models import CM3PModule
from cm3p_tpu.models.cm3p import cm3p_loss, contrastive_loss



pytestmark = pytest.mark.slow  # see pytest.ini: excluded from the quick gate
def make_samples(n, seq_max=96, v=3, meta_len=12, seed=0, with_labels=False):
    rng = np.random.default_rng(seed)
    samples = []
    for i in range(n):
        length = int(rng.integers(24, seq_max))
        ids = np.zeros(seq_max, np.int32)
        mask = np.zeros(seq_max, np.int32)
        ids[:length] = rng.integers(1, 400, length)
        mask[:length] = 1
        classes = np.ones(v, np.int32)
        classes[0] = 0
        s = {
            "input_ids": ids,
            "attention_mask": mask,
            "metadata_ids": rng.integers(0, 200, (v, meta_len)).astype(np.int32),
            "metadata_attention_mask": np.ones((v, meta_len), np.int32),
            "metadata_variation_classes": classes,
        }
        if with_labels:
            labels = np.full(seq_max, -100, np.int32)
            pick = rng.random(length) < 0.2
            labels[:length][pick] = ids[:length][pick]
            s["labels"] = labels
        samples.append(s)
    return samples


class TestMaskedLosses:
    def test_masked_equals_unmasked_when_all_valid(self):
        rng = np.random.default_rng(0)
        sim = jnp.asarray(rng.standard_normal((4, 3, 4)), jnp.float32)
        classes = jnp.asarray(np.tile([[0, 1, 2]], (4, 1)))
        valid = jnp.ones(4)
        a = cm3p_loss(sim, classes)
        b = cm3p_loss(sim, classes, valid=valid)
        assert abs(float(a) - float(b)) < 1e-6

    def test_dummy_rows_do_not_change_loss(self):
        rng = np.random.default_rng(0)
        sim = rng.standard_normal((4, 3, 4)).astype(np.float32)
        classes = np.tile([[0, 1, 2]], (4, 1)).astype(np.int32)
        base = cm3p_loss(jnp.asarray(sim), jnp.asarray(classes))

        # append 2 dummy windows with garbage similarities
        sim6 = rng.standard_normal((6, 3, 6)).astype(np.float32) * 5
        sim6[:4, :, :4] = sim
        classes6 = np.concatenate([classes, np.tile([[0, -1, -1]], (2, 1))]).astype(np.int32)
        valid = jnp.asarray([1, 1, 1, 1, 0, 0], jnp.float32)
        masked = cm3p_loss(jnp.asarray(sim6), jnp.asarray(classes6), valid=valid)
        assert abs(float(base) - float(masked)) < 1e-5

    def test_contrastive_loss_masking_2d(self):
        rng = np.random.default_rng(1)
        logits = rng.standard_normal((3, 3)).astype(np.float32)
        base = contrastive_loss(jnp.asarray(logits))
        padded = rng.standard_normal((5, 5)).astype(np.float32) * 9
        padded[:3, :3] = logits
        valid = jnp.asarray([1, 1, 1, 0, 0], jnp.float32)
        masked = contrastive_loss(jnp.asarray(padded), row_valid=valid, col_valid=valid)
        assert abs(float(base) - float(masked)) < 1e-5


class TestCollator:
    def test_shapes_and_bookkeeping(self):
        samples = make_samples(12, with_labels=True)
        batches = list(packed_batches(iter(samples), rows=4, seq_len=128, pad_id=0, max_windows=16, drop_last=False))
        assert len(batches) >= 1
        total_windows = sum(int(b["window_valid"].sum()) for b in batches)
        assert total_windows == 12
        for b in batches:
            assert b["input_ids"].shape == (4, 128)
            assert b["window_rows"].shape == (16,)
            assert b["metadata_ids"].shape == (16, 3, 12)
            assert b["labels"].shape == (4, 128)
            # each valid window's tokens recoverable
            w = int(b["window_valid"].sum())
            for wi in range(w):
                r, seg = b["window_rows"][wi], b["window_segments"][wi]
                assert (b["segment_ids"][r] == seg).sum() > 0

    def test_labels_align_with_tokens(self):
        samples = make_samples(5, with_labels=True, seed=3)
        (batch,) = list(packed_batches(iter(samples), rows=4, seq_len=128, pad_id=0, max_windows=8, drop_last=False))
        lab = batch["labels"]
        ids = batch["input_ids"]
        m = lab != -100
        # masked-LM labels equal the token at that position (corrupted inputs
        # aside, make_samples labels the original token)
        np.testing.assert_array_equal(lab[m], ids[m])


class TestPackedForwardLoss:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_cm3p_config()
        cfg.beatmap_config.local_attention = 8
        model = CM3PModule(cfg)
        samples = make_samples(6, seed=5)
        (batch,) = list(
            packed_batches(iter(samples), rows=3, seq_len=192, pad_id=0, max_windows=8, drop_last=False)
        )
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = model.init(jax.random.PRNGKey(0), method=CM3PModule.forward_packed, **jb)
        return cfg, model, params, samples, jb

    def test_packed_loss_matches_dense(self, setup):
        cfg, model, params, samples, jb = setup
        out_packed = model.apply(params, method=CM3PModule.forward_packed, **jb)

        # dense equivalent: one row per window, padded to longest
        seq = max(int(s["attention_mask"].sum()) for s in samples)
        ids = np.zeros((len(samples), seq), np.int32)
        mask = np.zeros((len(samples), seq), np.int32)
        for i, s in enumerate(samples):
            n = int(s["attention_mask"].sum())
            ids[i, :n] = s["input_ids"][:n]
            mask[i, :n] = 1
        out_dense = model.apply(
            params,
            input_ids=jnp.asarray(ids),
            attention_mask=jnp.asarray(mask),
            metadata_ids=jnp.asarray(np.stack([s["metadata_ids"] for s in samples])),
            metadata_attention_mask=jnp.asarray(np.stack([s["metadata_attention_mask"] for s in samples])),
            metadata_variation_classes=jnp.asarray(np.stack([s["metadata_variation_classes"] for s in samples])),
        )
        # same windows, same metadata → same loss (dummies masked out)
        assert abs(float(out_packed.loss) - float(out_dense.loss)) < 2e-3, (
            float(out_packed.loss),
            float(out_dense.loss),
        )
        # per-window embeddings agree
        w = len(samples)
        np.testing.assert_allclose(
            np.asarray(out_packed.beatmap_embeds[:w]), np.asarray(out_dense.beatmap_embeds), atol=3e-4
        )

    def test_packed_train_step_runs(self, setup):
        cfg, model, params, samples, jb = setup
        from cm3p_tpu.train import muon
        from cm3p_tpu.train.train_state import create_train_state, make_train_step

        tx = muon(1e-3)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), jb, method=CM3PModule.forward_packed)
        step = make_train_step(model, tx, method=CM3PModule.forward_packed)
        new_state, metrics = jax.jit(step)(state, jb, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1


class TestPackedAudio:
    def test_packed_with_audio_matches_dense(self):
        from cm3p_tpu.processing.packing import pack_windows

        cfg = tiny_cm3p_config()
        cfg.beatmap_config.audio_token_id = 500
        cfg.beatmap_config.audio_sos_token_id = 498
        cfg.beatmap_config.audio_eos_token_id = 499
        acfg = cfg.beatmap_config.audio_config
        model = CM3PModule(cfg)
        rng = np.random.default_rng(0)

        n_tok, mel_frames = 2, 16
        seqs, feats = [], []
        for n in (40, 70, 25):
            ids = np.zeros(3 + n_tok + n, np.int32)
            ids[0] = 498
            ids[1 : 1 + n_tok] = 500
            ids[1 + n_tok] = 499
            ids[2 + n_tok :] = rng.integers(1, 400, n + 1)
            seqs.append(ids)
            feats.append(rng.standard_normal((acfg.n_mels, mel_frames)).astype(np.float32))

        packed = pack_windows(seqs, 160, 0)
        w = len(seqs)
        batch = dict(
            input_ids=jnp.asarray(packed["input_ids"]),
            segment_ids=jnp.asarray(packed["segment_ids"]),
            window_rows=jnp.asarray(packed["window_to_row"]),
            window_segments=jnp.asarray(packed["window_segment"]),
            window_valid=jnp.ones(w, jnp.int32),
            input_features=jnp.asarray(np.stack(feats)),
        )
        params = model.init(jax.random.PRNGKey(0), method=CM3PModule.forward_packed, return_loss=False, **batch)
        out_packed = model.apply(params, method=CM3PModule.forward_packed, return_loss=False, **batch)

        seq = max(len(s) for s in seqs)
        ids_d = np.zeros((w, seq), np.int32)
        mask_d = np.zeros((w, seq), np.int32)
        for i, s in enumerate(seqs):
            ids_d[i, : len(s)] = s
            mask_d[i, : len(s)] = 1
        out_dense = model.apply(
            params,
            input_ids=jnp.asarray(ids_d),
            attention_mask=jnp.asarray(mask_d),
            input_features=jnp.asarray(np.stack(feats)),
            return_loss=False,
        )
        np.testing.assert_allclose(
            np.asarray(out_packed.beatmap_embeds[:w]), np.asarray(out_dense.beatmap_embeds), atol=3e-4
        )

    def test_collator_carries_audio(self):
        samples = make_samples(4)
        for s in samples:
            s["input_features"] = np.zeros((80, 16), np.float32)
        (batch,) = list(packed_batches(iter(samples), rows=4, seq_len=128, pad_id=0, max_windows=8, drop_last=False))
        assert batch["input_features"].shape == (8, 80, 16)


class TestPackedSharded:
    def test_packed_step_on_mesh(self):
        """Packed train step compiles and runs sharded over an 8-device mesh."""
        from cm3p_tpu.parallel.mesh import make_mesh
        from cm3p_tpu.train import muon
        from cm3p_tpu.train.train_state import create_train_state, make_train_step, shard_train_step

        cfg = tiny_cm3p_config()
        model = CM3PModule(cfg)
        samples = make_samples(24, seed=7)
        batches = list(
            packed_batches(iter(samples), rows=8, seq_len=128, pad_id=0, max_windows=32, drop_last=False)
        )
        jb = {k: jnp.asarray(v) for k, v in batches[0].items()}
        tx = muon(1e-3)
        state = create_train_state(model, tx, jax.random.PRNGKey(0), jb, method=CM3PModule.forward_packed)
        step = make_train_step(model, tx, method=CM3PModule.forward_packed)
        mesh = make_mesh(data=8, model=1)
        with mesh:
            jitted, ss, bs = shard_train_step(step, mesh, state, jb)
            st = jax.device_put(state, ss)
            bt = jax.device_put(jb, bs)
            new_state, metrics = jitted(st, bt, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))


class TestPackedEval:
    def test_packed_evaluate_matches_dense_zero_shot(self, tmp_path):
        """Trainer.evaluate over packed batches produces the same zero-shot
        variation-ranking metrics as dense batches on the same windows
        (reference eval semantics train.py:92-139; ROADMAP rough edge #2)."""
        from cm3p_tpu.train import Trainer, muon

        v = 5
        samples = make_samples(16, v=v, seed=3)
        # spread variation classes 1..4 so every metric bucket fills
        for s in samples:
            s["metadata_variation_classes"] = np.array([0, 1, 2, 3, 4], np.int32)

        def dense_factory():
            def gen():
                for i in range(0, 16, 8):
                    chunk = samples[i : i + 8]
                    yield {
                        k: np.stack([s[k] for s in chunk])
                        for k in (
                            "input_ids", "attention_mask", "metadata_ids",
                            "metadata_attention_mask", "metadata_variation_classes",
                        )
                    }
            return gen()

        def packed_factory():
            return packed_batches(
                iter(list(samples)), rows=4, seq_len=128, pad_id=0,
                max_windows=12, drop_last=False,
            )

        cfg = tiny_cm3p_config()
        model = CM3PModule(cfg)
        tx = muon(1e-3)
        common = dict(
            output_dir=str(tmp_path), max_steps=1, gradient_accumulation_steps=1,
            logging_steps=1, eval_steps=100, save_steps=100, model_axis=1,
            max_eval_batches=10,
        )
        dense_tr = Trainer(model, tx, dense_factory, dense_factory, **common)
        packed_tr = Trainer(
            model, tx, packed_factory, packed_factory,
            forward_method=CM3PModule.forward_packed, **common,
        )

        from cm3p_tpu.train.train_state import create_train_state
        example = {k: jnp.asarray(v_) for k, v_ in next(iter(dense_factory())).items()}
        state = create_train_state(model, tx, jax.random.PRNGKey(0), example)

        dense_metrics = dense_tr.evaluate(state)
        packed_metrics = packed_tr.evaluate(state)
        dense_tr.close()
        packed_tr.close()

        for key in ("accuracy_year", "accuracy_status", "accuracy_tags", "accuracy_mapper"):
            assert dense_metrics.get(key) is not None, f"dense missing {key}"
            assert packed_metrics.get(key) is not None, f"packed missing {key}"
            assert packed_metrics[key] == pytest.approx(dense_metrics[key]), key
        # losses are NOT comparable: contrastive CE depends on the in-batch
        # negative count (8 dense vs up-to-12 packed windows per batch)
        assert np.isfinite(packed_metrics["loss"]) and np.isfinite(dense_metrics["loss"])
