"""Persistent XLA compilation cache.

Sketch-step programs are compiled per chunk-count bucket; on remote-compile
TPU setups a cold compile costs tens of seconds. The persistent cache makes
every process after the first start hot.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "") -> None:
    import jax

    cache_dir = path or os.environ.get(
        "HYPERGEN_JAX_CACHE", os.path.expanduser("~/.cache/hypergen_tpu_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
