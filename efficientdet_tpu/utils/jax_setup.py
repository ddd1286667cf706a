"""Runtime jax configuration that must be applied via ``jax.config``.

On this rig a site hook pre-imports jax at interpreter startup, so
``JAX_*`` environment variables set by our entry points are read TOO LATE
to take effect as config defaults. Round 1 ran its entire life with the
persistent compilation cache silently disabled because of this (the env
var was set, ``jax.config.jax_compilation_cache_dir`` stayed ``None``).
``jax.config.update`` always wins, so every entry point calls these
helpers explicitly.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = "/root/.cache/jax_comp"


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on jax's persistent compilation cache (idempotent).

    Safe to call before or after backend initialization; cheap to call
    repeatedly. Honors ``JAX_COMPILATION_CACHE_DIR`` if the caller set it.
    """
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or DEFAULT_CACHE_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never fail the caller


def force_cpu_platform() -> None:
    """Pin jax to the host CPU platform (virtual-device tests / dryruns).

    Must run before any array op. Overrides the site hook's
    ``jax_platforms='axon,cpu'`` pin, which ``os.environ`` cannot (jax is
    already imported by the time user code runs).
    """
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backends already up; explicit jax.devices("cpu") still works
