"""Device mesh and sharding rules.

The reference is single-node DDP-at-most (SURVEY.md §2.5); here parallelism
is a first-class capability expressed on one ``jax.sharding.Mesh`` with two
axes:

* ``data``  — batch (DP). Gradient reduction and the global-batch
  contrastive similarity matrix ride XLA collectives over ICI; because the
  loss is written against the *global* logical batch under jit, in-batch
  negatives automatically span the whole mesh (the all-gather the reference
  lacks).
* ``model`` — tensor parallelism for the tower weights (Megatron-style:
  QKV/Wi column-sharded, attn-Wo/MLP-Wo row-sharded).

Everything is annotation-driven: params get NamedShardings from
:func:`param_shardings`, batches from :func:`batch_shardings`, and XLA's
SPMD partitioner propagates the rest.
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} does not match {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


# (regex on the param path, PartitionSpec) — first match wins.
_TP_RULES: list[tuple[str, P]] = [
    (r"attn/Wqkv/kernel$", P(None, "model")),
    (r"attn/Wo/kernel$", P("model", None)),
    (r"mlp/Wi/kernel$", P(None, "model")),
    (r"mlp/Wo/kernel$", P("model", None)),
    (r"tok_embeddings/embedding$", P(None, "model")),
    (r"(beatmap|metadata)_projection/kernel$", P("model", None)),
    (r"decoder/kernel$", P(None, "model")),
    (r"multi_modal_projector/linear_1/kernel$", P(None, "model")),
    (r"multi_modal_projector/linear_2/kernel$", P("model", None)),
    (r"conv[12]/kernel$", P(None, None, "model")),
]


def partition_spec_for(path: tuple, value: Any, tp_enabled: bool = True) -> P:
    """PartitionSpec for one parameter leaf."""
    if not tp_enabled:
        return P()
    name = "/".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)
    for pattern, spec in _TP_RULES:
        if re.search(pattern, name):
            if len(spec) <= value.ndim and all(
                s is None or value.shape[i] % 1 == 0 for i, s in enumerate(spec)
            ):
                return spec
    return P()


def param_shardings(mesh: Mesh, params: Any, tp_enabled: Optional[bool] = None) -> Any:
    """NamedSharding tree for a param pytree."""
    if tp_enabled is None:
        tp_enabled = mesh.shape.get("model", 1) > 1
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, partition_spec_for(path, v, tp_enabled)), params
    )


def batch_shardings(mesh: Mesh, batch: Any) -> Any:
    """Shard every batch array over the data axis (first dim)."""
    return jax.tree.map(lambda v: NamedSharding(mesh, P("data", *([None] * (v.ndim - 1)))), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
