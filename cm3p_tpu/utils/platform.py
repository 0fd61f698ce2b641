"""Backend-aware defaults shared by the CLI entry points."""
from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


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
