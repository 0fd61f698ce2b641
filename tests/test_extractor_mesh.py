"""Data-parallel mesh extraction: extract_beatmap_embeddings over all local
devices produces the same parquet as the single-device path.

Runs the real CLI entry in-process on the 8-device CPU mesh the test
conftest configures (the same topology `dryrun_multichip` validates), both
dense and packed, with `--no-mesh` as the reference. Also covers the
tail-batch padding (row counts that don't divide the device count).
"""
import numpy as np
import pandas as pd
import pytest

import extract_beatmap_embeddings as ex

BUNDLED = (
    "resources/Denkishiki Karen Ongaku Shuudan - Aoki Kotou no Anguis (OliBomby) [Ardens Spes].osu"
)


def _extract(tmp_path, tag, *extra):
    out = tmp_path / f"emb_{tag}.parquet"
    ex.main(
        [
            "--beatmap-files", BUNDLED,
            "--output", str(out),
            "--tiny-model",
            "--no-audio",
            "--max-length", "512",
            "--batch-size", "8",
            *extra,
        ]
    )
    df = pd.read_parquet(out)
    assert len(df) >= 1
    df = df.sort_values("beatmap_id").reset_index(drop=True)
    # stack AFTER sorting so the mesh/no-mesh comparison pairs the same id
    emb = np.stack([np.asarray(e, np.float32) for e in df["embedding"]])
    assert np.isfinite(emb).all()
    return df, emb


class TestExtractorMesh:
    def test_dense_mesh_matches_no_mesh(self, tmp_path):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh from conftest")
        base_df, base = _extract(tmp_path, "nomesh", "--no-pack", "--no-mesh")
        mesh_df, mesh = _extract(tmp_path, "mesh", "--no-pack")
        assert list(base_df["beatmap_id"]) == list(mesh_df["beatmap_id"])
        np.testing.assert_allclose(mesh, base, atol=1e-5)

    def test_packed_mesh_matches_no_mesh(self, tmp_path):
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh from conftest")
        base_df, base = _extract(tmp_path, "pk_nomesh", "--pack", "--no-mesh")
        mesh_df, mesh = _extract(tmp_path, "pk_mesh", "--pack")
        assert list(base_df["beatmap_id"]) == list(mesh_df["beatmap_id"])
        np.testing.assert_allclose(mesh, base, atol=1e-5)

    def test_tail_batch_padding(self, tmp_path):
        """A window count that doesn't divide the device count exercises the
        tail-batch padding (batch-size 16 > total windows)."""
        import jax

        if len(jax.devices()) < 2:
            pytest.skip("needs the multi-device CPU mesh from conftest")
        base_df, base = _extract(tmp_path, "tail_nomesh", "--no-pack", "--no-mesh", "--batch-size", "16")
        mesh_df, mesh = _extract(tmp_path, "tail_mesh", "--no-pack", "--batch-size", "16")
        assert list(base_df["beatmap_id"]) == list(mesh_df["beatmap_id"])
        np.testing.assert_allclose(mesh, base, atol=1e-5)
