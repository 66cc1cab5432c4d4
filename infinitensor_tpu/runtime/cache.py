"""Persistent compilation cache.

The analog of the reference's PerfEngine JSON persistence, but for the thing
that actually matters on TPU: compiled XLA executables. Enabling this makes
cold starts (notably the multi-minute first remote compile through the
tunnel) a one-time cost per (program, shapes, compiler version).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/infinitensor_tpu/xla")


def enable_compilation_cache(path: str = _DEFAULT_DIR,
                             min_compile_time_secs: float = 1.0) -> str:
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
