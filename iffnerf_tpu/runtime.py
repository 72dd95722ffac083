"""Runtime environment setup shared by the CLIs: platform override and a
persistent XLA compilation cache (compiles through this container's remote
TPU relay take minutes; the cache makes re-runs instant)."""

from __future__ import annotations

import os


def setup(platform_env: str = "IFFNERF_PLATFORM",
          cache_dir: str | None = None) -> None:
    import jax

    if os.environ.get(platform_env):
        jax.config.update("jax_platforms", os.environ[platform_env])
    cache_dir = cache_dir or os.environ.get(
        "IFFNERF_COMPILE_CACHE", os.path.expanduser("~/.cache/iffnerf_xla")
    )
    # CPU AOT cache entries are machine-feature-pinned and can SIGILL when
    # loaded on a different host; only cache accelerator compiles.
    if jax.default_backend() == "cpu":
        return
    if cache_dir and cache_dir != "0":
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
