"""Sequence-parallel attention: sharded result == single-device result."""
import functools

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

from cm3p_tpu.ops import flash_attention as fa
from cm3p_tpu.parallel.mesh import make_mesh
from cm3p_tpu.parallel.sequence import sequence_sharded_attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True))


@pytest.mark.parametrize("window", [None, 64])
def test_seq_sharded_matches_dense(window):
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("seq",))

    B, H, L, D = 1, 2, 1024, 64
    rng = np.random.default_rng(0)
    # head-minor (B, L, H, D): the kernels' native layout
    q = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    mask = jnp.asarray((np.arange(L) < 900).astype(np.int32))[None].repeat(B, 0)

    with mesh:
        out_sharded = sequence_sharded_attention(q, k, v, mask, mesh, seq_axis="seq", window=window)
    ref = fa._xla_reference(
        q.reshape(B, L, H * D), k.reshape(B, L, H * D), v.reshape(B, L, H * D),
        jnp.ones_like(mask), mask, window, H,
    ).reshape(B, L, H, D)
    # compare only unpadded rows
    np.testing.assert_allclose(
        np.asarray(out_sharded)[:, :900], np.asarray(ref)[:, :900], atol=3e-5
    )
