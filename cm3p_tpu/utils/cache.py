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

    # TPU-path tool only: XLA:CPU cache entries record compile-machine
    # tuning features (+prefer-no-scatter/-gather) that another host's (or
    # even this host's) loader can reject or mis-execute — the same hazard
    # that disables the AOT executable cache on CPU (utils/aot.py class
    # docstring; cpu_aot_loader logs "could lead to execution errors such
    # as SIGILL" when serving such entries). CPU compiles are cheap; skip.
    try:
        if jax.default_backend() == "cpu":
            logger.info("persistent compilation cache disabled on the CPU backend")
            return
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover
        logger.warning("compilation cache unavailable: %s", e)
