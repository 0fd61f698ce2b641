"""Backend-aware defaults shared by the CLI entry points and ops."""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

# Mesh-aware Pallas: kill switch for the ops' shard_map self-wrapping
MESH_PALLAS_ENABLED = os.environ.get("CM3P_MESH_PALLAS", "1") != "0"


def active_mesh():
    """The ambient ``jax.sharding.Mesh`` (entered via ``with mesh:``), or None.

    Returns None when no mesh context is active OR when already inside a
    shard_map manual region (nested shard_maps over different meshes are
    illegal — e.g. the SP path wraps flash_attention itself).

    GSPMD cannot partition a ``pallas_call`` (an opaque custom call gets
    all-gathered to replicated), so the Pallas ops use this to self-wrap in
    ``shard_map`` over the (data, model) axes — batch over ``data``, heads
    over ``model`` — making the kernels run on local shards under pjit the
    way XLA ops do. Uses private JAX internals behind a broad guard: if the
    API moves, behavior degrades to the old replicated semantics, never to
    an error.
    """
    if not MESH_PALLAS_ENABLED:
        return None
    try:
        from jax._src import core as _core

        if _core.get_axis_env().axis_sizes:
            return None
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        if m is not None and not m.empty:
            return m
    except Exception:
        return None
    return None


def resolve_attn_impl(requested: str = "pallas") -> str:
    """Downgrade ``pallas`` to ``xla`` when the active backend is CPU.

    The Mosaic kernels only run compiled on TPU; on CPU a ``pallas_call``
    raises "Only interpret mode is supported on CPU backend", and interpret
    mode is orders of magnitude too slow for real sequence lengths. Entry
    points default to ``pallas`` and route through this so ``--cpu`` runs
    (and CPU-only CI) fall back to the XLA attention path automatically.
    """
    if requested != "pallas":
        return requested
    import jax

    if jax.default_backend() == "cpu":
        logger.info("attn_impl='pallas' requires TPU; using 'xla' on the CPU backend")
        return "xla"
    return requested
