"""Persistent XLA compilation cache setup.

The remote-compile relay makes first compiles cost 30s-10min; the persistent
cache cuts repeat compiles to sub-second even across processes. Entry points
call :func:`enable_compilation_cache` before building models.
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.environ.get("CM3P_COMPILATION_CACHE", os.path.expanduser("~/.jax_cache"))


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        logger.warning("compilation cache unavailable: %s", e)
