"""JAX runtime setup: persistent compilation cache.

First-compile latency dominates cold starts (remote-compile TPU environments
can take minutes per program); the persistent cache makes every later process
reuse compiled artifacts. Call early in every entry point.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_done = False


def init_compilation_cache(cache_dir: str | None = None) -> None:
    global _done
    if _done:
        return
    _done = True
    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.cache/speaksense_jax"))
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        log.debug("jax compilation cache at %s", cache_dir)
    except Exception as e:  # pragma: no cover
        log.warning("compilation cache unavailable: %s", e)
