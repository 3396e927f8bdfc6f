"""Process-level runtime setup helpers."""

from __future__ import annotations

import os


def setup_compilation_cache(cache_dir: str = "") -> None:
    """Enable JAX's persistent compilation cache.

    The flagship train step takes minutes to compile cold; the cache makes
    every subsequent process start (resume, eval, sweep point) near-instant.
    Safe to call multiple times; no-op if the backend doesn't support it.
    """
    import jax

    cache_dir = (cache_dir or os.environ.get("UGAITNET_CACHE_DIR")
                 or os.path.expanduser("~/.cache/ugaitnet_tpu/jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
