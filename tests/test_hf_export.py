"""Round-trip: our flax checkpoint -> HF bundle -> the reference torch model.

VERDICT.md round-1 gap #1 (HF-ecosystem export direction): a model trained
here must be loadable by the reference stack (``push_to_hub.py:77-98``
layout). Contract tested end to end: init + a few real optimizer steps ->
``export_hf_checkpoint`` -> ``cm3p.modeling_cm3p.CM3PModel.from_pretrained``
on the bundle -> embeddings match ours with cosine > 0.9999, with zero
missing/unexpected keys.
"""
import sys

import numpy as np
import pytest


pytestmark = pytest.mark.slow  # see pytest.ini: excluded from the quick gate
torch = pytest.importorskip("torch")
pytest.importorskip("safetensors")
sys.path.append("/root/reference")  # APPEND: reference modules (validate_dataset, train, config, ...) must never shadow ours

try:
    from cm3p.modeling_cm3p import CM3PModel as RefModel
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference model unavailable: {e}", allow_module_level=True)

import jax
import jax.numpy as jnp

from cm3p_tpu.configs import tiny_cm3p_config
from cm3p_tpu.interop import export_hf_checkpoint, flax_to_hf_state_dict
from cm3p_tpu.models import CM3PModule


def cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.fixture(scope="module")
def trained_bundle(tmp_path_factory):
    """Init a tiny model, take 3 real contrastive train steps, export."""
    import optax

    cfg = tiny_cm3p_config()
    # default audio ids (3164+) exceed the tiny vocab of 512: keep in range
    cfg.beatmap_config.audio_sos_token_id = 498
    cfg.beatmap_config.audio_eos_token_id = 499
    cfg.beatmap_config.audio_token_id = 500
    model = CM3PModule(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(5, 500, (4, 64)), jnp.int32),
        "attention_mask": jnp.asarray(np.ones((4, 64)), jnp.int32),
        "metadata_ids": jnp.asarray(rng.integers(0, 250, (4, 12)), jnp.int32),
        "metadata_attention_mask": jnp.asarray(np.ones((4, 12)), jnp.int32),
    }
    # init WITH audio features so the lazily-created audio encoder params
    # exist in the tree (the reference model always instantiates them)
    init_ids = np.asarray(batch["input_ids"]).copy()
    init_ids[:, 0] = cfg.beatmap_config.audio_sos_token_id
    init_ids[:, 1] = cfg.beatmap_config.audio_token_id
    init_ids[:, 2] = cfg.beatmap_config.audio_token_id
    init_ids[:, 3] = cfg.beatmap_config.audio_eos_token_id
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(init_ids, jnp.int32),
        attention_mask=batch["attention_mask"],
        metadata_ids=batch["metadata_ids"],
        metadata_attention_mask=batch["metadata_attention_mask"],
        input_features=jnp.asarray(rng.standard_normal((4, 80, 16)), jnp.float32),
        return_loss=True,
    )

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return model.apply(p, **batch, return_loss=True).loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(3):
        params, opt_state, loss = step(params, opt_state)
    assert np.isfinite(float(loss))

    out_dir = tmp_path_factory.mktemp("hf_bundle")
    export_hf_checkpoint(params, cfg, out_dir)
    return cfg, model, params, out_dir, batch


class TestHFExport:
    def test_reference_loads_with_exact_keys(self, trained_bundle):
        cfg, model, params, out_dir, batch = trained_bundle
        ref, loading_info = RefModel.from_pretrained(
            out_dir, attn_implementation="sdpa", output_loading_info=True
        )
        assert loading_info["missing_keys"] == []
        assert loading_info["unexpected_keys"] == []
        assert loading_info["mismatched_keys"] == []
        n_ref = sum(p.numel() for p in ref.parameters())
        n_ours = sum(v.size for v in jax.tree.leaves(params))
        # the reference instantiates a dead (1, hidden) audio embedding table
        # that our flax tree never materializes (synthesized on export)
        assert n_ref == n_ours + cfg.beatmap_config.audio_config.hidden_size

    def test_embeddings_round_trip(self, trained_bundle):
        cfg, model, params, out_dir, batch = trained_bundle
        ref = RefModel.from_pretrained(out_dir, attn_implementation="sdpa").eval()
        with torch.no_grad():
            out_ref = ref(
                input_ids=torch.tensor(np.asarray(batch["input_ids"])),
                attention_mask=torch.tensor(np.asarray(batch["attention_mask"], np.int64)),
                metadata_ids=torch.tensor(np.asarray(batch["metadata_ids"])),
                metadata_attention_mask=torch.tensor(np.asarray(batch["metadata_attention_mask"], np.int64)),
                return_loss=False,
            )
        out_ours = model.apply(params, **batch, return_loss=False)
        assert cosine(out_ref.beatmap_embeds.numpy(), np.asarray(out_ours.beatmap_embeds)) > 0.9999
        assert cosine(out_ref.metadata_embeds.numpy(), np.asarray(out_ours.metadata_embeds)) > 0.9999
        np.testing.assert_allclose(
            np.asarray(out_ours.beatmap_embeds), out_ref.beatmap_embeds.numpy(), atol=3e-4
        )

    def test_audio_fused_round_trip(self, trained_bundle):
        cfg, model, params, out_dir, batch = trained_bundle
        ref = RefModel.from_pretrained(out_dir, attn_implementation="sdpa").eval()
        rng = np.random.default_rng(5)
        feats = rng.standard_normal((2, 80, 16)).astype(np.float32)
        ids = np.asarray(batch["input_ids"][:2]).copy()
        ids[:, 0] = cfg.beatmap_config.audio_sos_token_id
        ids[:, 1] = cfg.beatmap_config.audio_token_id
        ids[:, 2] = cfg.beatmap_config.audio_token_id
        ids[:, 3] = cfg.beatmap_config.audio_eos_token_id
        mask = np.ones_like(ids)
        with torch.no_grad():
            out_ref = ref(
                input_ids=torch.tensor(ids),
                input_features=torch.tensor(feats),
                attention_mask=torch.tensor(mask.astype(np.int64)),
                return_loss=False,
            ).beatmap_embeds.numpy()
        out_ours = np.asarray(
            model.apply(
                params,
                input_ids=jnp.asarray(ids, jnp.int32),
                input_features=jnp.asarray(feats),
                attention_mask=jnp.asarray(mask, jnp.int32),
                return_loss=False,
            ).beatmap_embeds
        )
        assert cosine(out_ref, out_ours) > 0.9999

    def test_convert_then_export_is_identity(self, trained_bundle):
        """export(convert(state)) == state for every reference tensor."""
        cfg, model, params, out_dir, batch = trained_bundle
        sys.path.insert(0, "/root/repo")
        from tools.convert_reference_checkpoint import convert_cm3p_state_dict

        state = flax_to_hf_state_dict(params)
        back = convert_cm3p_state_dict(dict(state))
        again = flax_to_hf_state_dict(back)
        assert set(state) == set(again)
        for k in state:
            np.testing.assert_array_equal(state[k], again[k], err_msg=k)


class TestPublishModelHF:
    def test_publish_bundle_loadable_by_reference(self, trained_bundle, tmp_path):
        """publish_model --hf emits an hf/ bundle the reference stack loads
        (upgrades the hub publisher to full interop parity, VERDICT r1 §2.3)."""
        import publish_model
        from cm3p_tpu.processing import CM3PProcessor
        from cm3p_tpu.train.checkpoint import save_model

        cfg, model, params, out_dir, batch = trained_bundle
        save_model(str(tmp_path / "model"), params, config=cfg)
        CM3PProcessor().save_pretrained(str(tmp_path / "processor"))
        rc = publish_model.main([
            "--model-dir", str(tmp_path / "model"),
            "--processor-dir", str(tmp_path / "processor"),
            "--output", str(tmp_path / "release"),
            "--hf",
        ])
        assert rc == 0
        assert (tmp_path / "release" / "hf" / "model.safetensors").exists()
        ref = RefModel.from_pretrained(tmp_path / "release" / "hf", attn_implementation="sdpa").eval()
        out_ours = model.apply(params, **batch, return_loss=False)
        with torch.no_grad():
            out_ref = ref(
                input_ids=torch.tensor(np.asarray(batch["input_ids"])),
                attention_mask=torch.tensor(np.asarray(batch["attention_mask"], np.int64)),
                return_loss=False,
            )
        assert cosine(out_ref.beatmap_embeds.numpy(), np.asarray(out_ours.beatmap_embeds)) > 0.9999
        card = (tmp_path / "release" / "README.md").read_text()
        assert "from_pretrained" in card and "hf/" in card


class TestFlatBundles:
    """MLM/classifier artifacts export as flat CM3PBeatmapConfig bundles
    (reference ``config_class`` of CM3PForMaskedLM / CM3PForBeatmapClassification,
    modeling_cm3p.py:1138/1242) and round-trip through the reference stack."""

    def _flat_cfg(self, **over):
        cfg = tiny_cm3p_config().beatmap_config
        cfg.audio_sos_token_id = 498
        cfg.audio_eos_token_id = 499
        cfg.audio_token_id = 500
        cfg.sparse_prediction = False
        for k, v in over.items():
            setattr(cfg, k, v)
        return cfg

    def _init_with_audio(self, model, cfg, rng):
        """Init WITH audio features so the audio-encoder params exist (the
        reference CM3PBeatmapTransformer always instantiates them)."""
        ids = np.asarray(rng.integers(5, 490, (2, 32)), np.int32)
        ids[:, 0] = cfg.audio_sos_token_id
        ids[:, 1] = cfg.audio_token_id
        ids[:, 2] = cfg.audio_token_id
        ids[:, 3] = cfg.audio_eos_token_id
        return model.init(
            jax.random.PRNGKey(0),
            jnp.asarray(ids),
            input_features=jnp.asarray(rng.standard_normal((2, 80, 16)), jnp.float32),
            attention_mask=jnp.ones((2, 32), jnp.int32),
        )

    def test_tied_masked_lm_round_trip(self, tmp_path):
        from cm3p.modeling_cm3p import CM3PForMaskedLM as RefMLM

        from cm3p_tpu.inference import load_pretrained
        from cm3p_tpu.interop import export_hf_checkpoint
        from cm3p_tpu.models import MaskedLMModule

        cfg = self._flat_cfg(tie_word_embeddings=True)
        model = MaskedLMModule(cfg)
        rng = np.random.default_rng(1)
        params = self._init_with_audio(model, cfg, rng)
        out_dir = tmp_path / "mlm_hf"
        export_hf_checkpoint(params, cfg, out_dir)

        import json

        data = json.loads((out_dir / "config.json").read_text())
        assert data["model_type"] == "CM3PBeatmap"
        assert data["architectures"] == ["CM3PForMaskedLM"]
        assert data["tie_word_embeddings"] is True

        ref, info = RefMLM.from_pretrained(
            out_dir, attn_implementation="sdpa", output_loading_info=True
        )
        # decoder.weight is tied — HF restores it from the embedding table
        assert [k for k in info["missing_keys"] if k != "decoder.weight"] == []
        assert info["unexpected_keys"] == []
        ref = ref.eval()

        ids = np.asarray(rng.integers(5, 490, (2, 32)), np.int32)
        mask = np.ones_like(ids)
        ours = np.asarray(
            model.apply(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask)).logits,
            np.float32,
        )
        with torch.no_grad():
            theirs = ref(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask.astype(np.int64))
            ).logits.numpy()
        assert cosine(ours, theirs) > 0.9999

        # and back into OUR stack: load_pretrained auto-detects the flat
        # HF layout and rebuilds a *tied* MaskedLM (review finding: the tie
        # flag must survive the round trip or params go missing)
        _, model2, params2 = load_pretrained(str(out_dir), dtype=jnp.float32)
        assert isinstance(model2, MaskedLMModule)
        assert model2.config.tie_word_embeddings is True
        again = np.asarray(
            model2.apply(params2, jnp.asarray(ids), attention_mask=jnp.asarray(mask)).logits,
            np.float32,
        )
        np.testing.assert_allclose(again, ours, atol=2e-5)

    def test_classifier_round_trip(self, tmp_path):
        from cm3p.modeling_cm3p import CM3PForBeatmapClassification as RefCls

        from cm3p_tpu.inference import load_pretrained
        from cm3p_tpu.interop import export_hf_checkpoint
        from cm3p_tpu.models import ClassifierModule

        cfg = self._flat_cfg(num_labels=3, problem_type="single_label_classification")
        model = ClassifierModule(cfg)
        rng = np.random.default_rng(2)
        params = self._init_with_audio(model, cfg, rng)
        out_dir = tmp_path / "cls_hf"
        export_hf_checkpoint(params, cfg, out_dir)

        import json

        data = json.loads((out_dir / "config.json").read_text())
        assert data["architectures"] == ["CM3PForBeatmapClassification"]

        ref, info = RefCls.from_pretrained(
            out_dir, attn_implementation="sdpa", output_loading_info=True
        )
        assert info["missing_keys"] == []
        assert info["unexpected_keys"] == []
        ref = ref.eval()

        ids = np.asarray(rng.integers(5, 490, (2, 32)), np.int32)
        mask = np.ones_like(ids)
        ours = np.asarray(
            model.apply(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask)).logits,
            np.float32,
        )
        with torch.no_grad():
            theirs = ref(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask.astype(np.int64))
            ).logits.numpy()
        assert cosine(ours, theirs) > 0.999

        _, model2, params2 = load_pretrained(str(out_dir), dtype=jnp.float32)
        assert isinstance(model2, ClassifierModule)
        again = np.asarray(
            model2.apply(params2, jnp.asarray(ids), attention_mask=jnp.asarray(mask)).logits,
            np.float32,
        )
        np.testing.assert_allclose(again, ours, atol=2e-5)

    def test_publish_model_hf_flat_artifact(self, tmp_path):
        """publish_model --hf must not crash on a flat-config artifact
        (review finding: load_config returns a BeatmapConfig there)."""
        import publish_model
        from cm3p_tpu.models import MaskedLMModule
        from cm3p_tpu.processing import CM3PProcessor
        from cm3p_tpu.train.checkpoint import save_model

        cfg = self._flat_cfg(tie_word_embeddings=False)
        model = MaskedLMModule(cfg)
        params = self._init_with_audio(model, cfg, np.random.default_rng(3))
        save_model(str(tmp_path / "model"), params, config=cfg)
        CM3PProcessor().save_pretrained(str(tmp_path / "processor"))
        rc = publish_model.main([
            "--model-dir", str(tmp_path / "model"),
            "--processor-dir", str(tmp_path / "processor"),
            "--output", str(tmp_path / "release"),
            "--hf",
        ])
        assert rc == 0
        assert (tmp_path / "release" / "hf" / "model.safetensors").exists()
        card = (tmp_path / "release" / "README.md").read_text()
        assert "CM3PForMaskedLM" in card


class TestLoadPretrainedHF:
    def test_load_pretrained_detects_hf_layout(self, trained_bundle):
        """inference.load_pretrained consumes an HF bundle directly (either a
        published reference checkpoint or our exported one)."""
        from cm3p_tpu.inference import load_pretrained

        cfg, model, params, out_dir, batch = trained_bundle
        _, model2, params2 = load_pretrained(str(out_dir), dtype=jnp.float32)
        out_a = model.apply(params, **batch, return_loss=False).beatmap_embeds
        out_b = model2.apply(params2, **batch, return_loss=False).beatmap_embeds
        assert cosine(np.asarray(out_a), np.asarray(out_b)) > 0.9999


class TestProcessorExport:
    """VERDICT r2 missing #1: the processor half of the HF round trip.

    export_hf_processor writes the reference's AutoProcessor layout
    (per-attribute subfolders + vocab.jsons + auto_map); the REFERENCE's own
    CM3PProcessor.from_pretrained must load it and tokenize bit-identically
    to ours."""

    @pytest.fixture(scope="class")
    def ref_processor_cls(self):
        from tests import slider_shim

        slider_shim.install()
        try:
            from cm3p.parsing_cm3p import CM3PBeatmapParser
            from cm3p.processing_cm3p import CM3PProcessor as RefProcessor
            from cm3p.tokenization_cm3p import CM3PBeatmapTokenizer, CM3PMetadataTokenizer
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference processor unavailable: {e}")
        from tests import ref_compat

        ref_compat.install(CM3PBeatmapParser, CM3PBeatmapTokenizer, CM3PMetadataTokenizer)
        return RefProcessor

    @pytest.fixture(scope="class")
    def bundle(self, tmp_path_factory):
        from cm3p_tpu.interop.hf_export import export_hf_processor
        from cm3p_tpu.processing import CM3PProcessor

        ours = CM3PProcessor()
        out = tmp_path_factory.mktemp("proc_export")
        export_hf_processor(ours, out)
        return ours, out

    def test_layout_matches_reference_save(self, bundle):
        _, out = bundle
        for rel in (
            "processor_config.json",
            "audio_feature_extractor/preprocessor_config.json",
            "beatmap_parser/preprocessor_config.json",
            "beatmap_tokenizer/tokenizer_config.json",
            "beatmap_tokenizer/vocab.json",
            "beatmap_tokenizer/special_tokens_map.json",
            "metadata_tokenizer/tokenizer_config.json",
            "metadata_tokenizer/vocab.json",
            "metadata_tokenizer/special_tokens_map.json",
        ):
            assert (out / rel).exists(), rel

    def test_reference_loads_and_tokenizes_identically(self, bundle, ref_processor_cls):
        from transformers.utils import PaddingStrategy

        ours, out = bundle
        ref = ref_processor_cls.from_pretrained(str(out))
        assert type(ref.beatmap_tokenizer).__name__ == "CM3PBeatmapTokenizer"
        assert ref.beatmap_tokenizer.vocab_size == ours.beatmap_tokenizer.vocab_size

        beatmap = str(
            __import__("pathlib").Path(__file__).parent.parent
            / "resources"
            / "Denkishiki Karen Ongaku Shuudan - Aoki Kotou no Anguis (OliBomby) [Ardens Spes].osu"
        )
        r = ref(
            beatmap=beatmap, window_length_sec=16.0, window_stride_sec=16.0,
            padding=PaddingStrategy.LONGEST, return_tensors=None,
            multiply_metadata=False, populate_metadata=False, metadata_variations=1,
        )
        o = ours(beatmap=beatmap, window_length_sec=16.0, window_stride_sec=16.0, padding="longest")
        np.testing.assert_array_equal(np.asarray(r["input_ids"]), np.asarray(o["input_ids"]))
        np.testing.assert_array_equal(
            np.asarray(r["attention_mask"]), np.asarray(o["attention_mask"])
        )

    def test_reference_metadata_tokenization_identical(self, bundle, ref_processor_cls):
        ours, out = bundle
        ref = ref_processor_cls.from_pretrained(str(out))
        meta = {"difficulty": 5.5, "year": 2015, "mode": "osu", "mapper": "OliBomby"}
        r = ref(metadata=meta, return_tensors=None)
        o = ours(metadata=meta)
        np.testing.assert_array_equal(np.asarray(r["input_ids"]), np.asarray(o["input_ids"]))

    def test_corpus_map_roundtrip(self, bundle, ref_processor_cls):
        """A non-std corpus map tokenizes identically through the loaded bundle."""
        from transformers.utils import PaddingStrategy

        ours, out = bundle
        ref = ref_processor_cls.from_pretrained(str(out))
        path = str(
            __import__("pathlib").Path(__file__).parent.parent
            / "resources" / "perf_corpus" / "mania_dense.osu"
        )
        r = ref(
            beatmap=path, window_length_sec=16.0, window_stride_sec=16.0,
            padding=PaddingStrategy.LONGEST, return_tensors=None,
            multiply_metadata=False, populate_metadata=False, metadata_variations=1,
        )
        o = ours(beatmap=path, window_length_sec=16.0, window_stride_sec=16.0, padding="longest")
        np.testing.assert_array_equal(np.asarray(r["input_ids"]), np.asarray(o["input_ids"]))


class TestHubPushBranch:
    """Execute the --repo-id upload branch against a stub huggingface_hub
    (same rationale as the wandb stub: the branch would otherwise ship with
    zero executed coverage and silently break on an API drift).
    publish_model.py:148-166."""

    def _stub_hub(self, monkeypatch, fail=False):
        import sys
        import types

        calls = {"create_repo": [], "create_branch": [], "upload_folder": []}

        class StubApi:
            def create_repo(self, repo_id, exist_ok=False):
                calls["create_repo"].append({"repo_id": repo_id, "exist_ok": exist_ok})

            def create_branch(self, repo_id, branch, exist_ok=False):
                calls["create_branch"].append({"repo_id": repo_id, "branch": branch})

            def upload_folder(self, **kw):
                if fail:
                    raise RuntimeError("no network")
                calls["upload_folder"].append(kw)

        stub = types.ModuleType("huggingface_hub")
        stub.HfApi = StubApi
        monkeypatch.setitem(sys.modules, "huggingface_hub", stub)
        return calls

    def _bundle_args(self, tmp_path):
        from cm3p_tpu.processing import CM3PProcessor
        from cm3p_tpu.train.checkpoint import save_model
        from cm3p_tpu.configs import tiny_cm3p_config
        from cm3p_tpu.models import CM3PModule

        cfg = tiny_cm3p_config()
        model = CM3PModule(cfg)
        rng = np.random.default_rng(5)
        params = model.init(
            jax.random.PRNGKey(0),
            input_ids=rng.integers(0, 100, (1, 16)).astype(np.int32),
            attention_mask=np.ones((1, 16), np.int32),
            metadata_ids=rng.integers(0, 50, (1, 2, 8)).astype(np.int32),
            metadata_attention_mask=np.ones((1, 2, 8), np.int32),
            metadata_variation_classes=np.zeros((1, 2), np.int32),
        )
        save_model(str(tmp_path / "model"), jax.device_get(params), config=cfg)
        CM3PProcessor().save_pretrained(str(tmp_path / "processor"))
        return [
            "--model-dir", str(tmp_path / "model"),
            "--processor-dir", str(tmp_path / "processor"),
            "--output", str(tmp_path / "release"),
        ]

    def test_push_with_revision_and_pr(self, tmp_path, monkeypatch):
        import publish_model

        calls = self._stub_hub(monkeypatch)
        rc = publish_model.main(
            self._bundle_args(tmp_path)
            + ["--repo-id", "someone/CM3P-TPU", "--revision", "v2", "--create-pr"]
        )
        assert rc == 0
        assert calls["create_repo"] == [{"repo_id": "someone/CM3P-TPU", "exist_ok": True}]
        assert calls["create_branch"][0]["branch"] == "v2"
        up = calls["upload_folder"][0]
        assert up["repo_id"] == "someone/CM3P-TPU"
        assert up["revision"] == "v2"
        assert up["create_pr"] is True
        assert up["folder_path"] == str(tmp_path / "release")

    def test_push_failure_keeps_local_bundle(self, tmp_path, monkeypatch):
        import publish_model

        self._stub_hub(monkeypatch, fail=True)
        rc = publish_model.main(
            self._bundle_args(tmp_path) + ["--repo-id", "someone/CM3P-TPU"]
        )
        assert rc == 1
        # the local bundle is complete despite the failed push
        assert (tmp_path / "release" / "README.md").exists()
