"""Numerical parity vs the reference PyTorch implementation.

Instantiates the actual reference ``CM3PModel`` (imported from
/root/reference, random init, sdpa, fp32), converts its state dict with
``tools/convert_reference_checkpoint.py``, and checks that our flax model
reproduces its embeddings/logits — the BASELINE.md cosine-parity contract
exercised end to end without needing the published checkpoint.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.append("/root/reference")  # APPEND: reference modules (validate_dataset, train, config, ...) must never shadow ours
sys.path.insert(0, "/root/repo")

try:
    from cm3p.configuration_cm3p import CM3PConfig as RefConfig
    from cm3p.modeling_cm3p import CM3PModel as RefModel
except Exception as e:  # pragma: no cover
    pytest.skip(f"reference model unavailable: {e}", allow_module_level=True)

import jax
import jax.numpy as jnp

from cm3p_tpu.configs import AudioConfig, BeatmapConfig, CM3PConfig, MetadataConfig
from cm3p_tpu.models import CM3PModule
from tools.convert_reference_checkpoint import convert_cm3p_state_dict

TINY = dict(
    metadata_config=dict(
        vocab_size=256, hidden_size=32, intermediate_size=64, num_hidden_layers=3, num_attention_heads=4
    ),
    beatmap_config=dict(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        global_attn_every_n_layers=3,
        local_attention=8,  # exercise the sliding-window path at short lengths
        audio_token_id=500,
        audio_sos_token_id=498,
        audio_eos_token_id=499,
        audio_config=dict(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            projector_intermediate_size=128,
            projector_dim=64,
            global_attn_every_n_layers=3,
            local_attention=8,
        ),
    ),
    projection_dim=32,
)


@pytest.fixture(scope="module")
def models():
    torch.manual_seed(0)
    ref_cfg = RefConfig(**{k: dict(v) if isinstance(v, dict) else v for k, v in TINY.items()})
    ref_cfg._attn_implementation = "sdpa"
    ref = RefModel(ref_cfg).eval()

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_cm3p_state_dict(state)
    params = jax.tree.map(jnp.asarray, params)

    cfg = CM3PConfig(
        metadata_config=MetadataConfig(**TINY["metadata_config"]),
        beatmap_config=BeatmapConfig(
            **{k: (AudioConfig(**v) if k == "audio_config" else v) for k, v in TINY["beatmap_config"].items()}
        ),
        projection_dim=TINY["projection_dim"],
    )
    ours = CM3PModule(cfg)
    return ref, ours, params


def cosine(a: np.ndarray, b: np.ndarray) -> float:
    a = a.reshape(-1).astype(np.float64)
    b = b.reshape(-1).astype(np.float64)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


class TestReferenceParity:
    def test_param_count_matches(self, models):
        ref, _, params = models
        n_ref = sum(p.numel() for p in ref.parameters())
        n_ours = sum(v.size for v in jax.tree.leaves(params))
        assert n_ours == n_ref

    def test_metadata_tower_parity(self, models):
        ref, ours, params = models
        rng = np.random.default_rng(0)
        meta = rng.integers(0, 250, (3, 12))
        mask = np.ones((3, 12), np.int64)
        mask[:, -3:] = 0
        with torch.no_grad():
            out_ref = ref(
                metadata_ids=torch.tensor(meta),
                metadata_attention_mask=torch.tensor(mask),
                return_loss=False,
            ).metadata_embeds.numpy()
        out_ours = np.asarray(
            ours.apply(
                params,
                metadata_ids=jnp.asarray(meta, jnp.int32),
                metadata_attention_mask=jnp.asarray(mask, jnp.int32),
                return_loss=False,
            ).metadata_embeds
        )
        assert cosine(out_ref, out_ours) > 0.9999, (out_ref[0][:4], out_ours[0][:4])
        np.testing.assert_allclose(out_ours, out_ref, atol=2e-4)

    def test_beatmap_tower_parity_no_audio(self, models):
        ref, ours, params = models
        rng = np.random.default_rng(1)
        ids = rng.integers(0, 490, (2, 48))
        mask = np.ones((2, 48), np.int64)
        mask[1, -10:] = 0
        with torch.no_grad():
            out_ref = ref(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask), return_loss=False
            ).beatmap_embeds.numpy()
        out_ours = np.asarray(
            ours.apply(
                params,
                input_ids=jnp.asarray(ids, jnp.int32),
                attention_mask=jnp.asarray(mask, jnp.int32),
                return_loss=False,
            ).beatmap_embeds
        )
        assert cosine(out_ref, out_ours) > 0.9999
        np.testing.assert_allclose(out_ours, out_ref, atol=2e-4)

    def test_beatmap_tower_parity_with_audio(self, models):
        ref, ours, params = models
        rng = np.random.default_rng(2)
        # 16 mel frames -> conv/2 -> 8 -> /4 -> 2 audio tokens per row
        feats = rng.standard_normal((2, 80, 16)).astype(np.float32)
        ids = rng.integers(0, 490, (2, 48))
        ids[:, 0] = 498
        ids[:, 1] = 500
        ids[:, 2] = 500
        ids[:, 3] = 499
        mask = np.ones((2, 48), np.int64)
        with torch.no_grad():
            out_ref = ref(
                input_ids=torch.tensor(ids),
                input_features=torch.tensor(feats),
                attention_mask=torch.tensor(mask),
                return_loss=False,
            ).beatmap_embeds.numpy()
        out_ours = np.asarray(
            ours.apply(
                params,
                input_ids=jnp.asarray(ids, jnp.int32),
                input_features=jnp.asarray(feats),
                attention_mask=jnp.asarray(mask, jnp.int32),
                return_loss=False,
            ).beatmap_embeds
        )
        assert cosine(out_ref, out_ours) > 0.9999
        np.testing.assert_allclose(out_ours, out_ref, atol=5e-4)

    def test_full_forward_logits_and_loss(self, models):
        ref, ours, params = models
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 490, (3, 32))
        meta = rng.integers(0, 250, (3, 4, 12))
        classes = np.tile(np.array([[0, 1, 2, -1]]), (3, 1))
        with torch.no_grad():
            out_ref = ref(
                input_ids=torch.tensor(ids),
                metadata_ids=torch.tensor(meta),
                metadata_variation_classes=torch.tensor(classes),
                return_loss=True,
            )
        out_ours = ours.apply(
            params,
            input_ids=jnp.asarray(ids, jnp.int32),
            metadata_ids=jnp.asarray(meta, jnp.int32),
            metadata_variation_classes=jnp.asarray(classes, jnp.int32),
            return_loss=True,
        )
        np.testing.assert_allclose(
            np.asarray(out_ours.logits_per_metadata), out_ref.logits_per_metadata.numpy(), atol=3e-4
        )
        assert abs(float(out_ours.loss) - float(out_ref.loss)) < 1e-4


class TestPallasPathParity:
    """The production Pallas path (fused kernels + in-kernel rope) vs the
    torch reference at a flash-active length (the suite above runs short
    sequences that route to XLA attention; this pins the kernel path)."""

    def test_beatmap_tower_pallas_flash_parity(self, models):
        import functools

        import jax.experimental.pallas as pl

        ref, _, params = models
        from cm3p_tpu.configs import AudioConfig, BeatmapConfig, CM3PConfig, MetadataConfig

        cfg = CM3PConfig(
            metadata_config=MetadataConfig(**TINY["metadata_config"]),
            beatmap_config=BeatmapConfig(
                **{k: (AudioConfig(**v) if k == "audio_config" else v) for k, v in TINY["beatmap_config"].items()}
            ),
            projection_dim=TINY["projection_dim"],
        )
        ours_pallas = CM3PModule(cfg, attn_impl="pallas")

        rng = np.random.default_rng(7)
        L = 576  # >= 512 so the encoder routes through the flash kernels
        ids = rng.integers(0, 490, (2, L))
        mask = np.ones((2, L), np.int64)
        mask[1, -64:] = 0
        with torch.no_grad():
            out_ref = ref(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask), return_loss=False
            ).beatmap_embeds.numpy()

        orig = pl.pallas_call
        try:
            pl.pallas_call = functools.partial(orig, interpret=True)
            out_ours = np.asarray(
                ours_pallas.apply(
                    params,
                    input_ids=jnp.asarray(ids, jnp.int32),
                    attention_mask=jnp.asarray(mask, jnp.int32),
                    return_loss=False,
                ).beatmap_embeds
            )
        finally:
            pl.pallas_call = orig
        assert cosine(out_ref, out_ours) > 0.9999
        np.testing.assert_allclose(out_ours, out_ref, atol=5e-4)
