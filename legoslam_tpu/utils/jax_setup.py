"""Process-wide JAX runtime setup helpers.

The fused frame step (plus its Pallas kernels) is a multi-minute compile;
every entry point (apps, bench, driver hooks) should hit the same persistent
compilation cache so only the first run after a code change pays it.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = "/tmp/legoslam_jax_cache"
_done = False


def enable_compilation_cache(path: str | None = None) -> None:
    """Point JAX's persistent compilation cache at a shared directory.

    Safe to call multiple times / before or after backend init; failures are
    non-fatal (some platforms lack cache support).
    """
    global _done
    if _done:
        return
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT_CACHE)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _done = True
    except Exception:
        pass
