"""Persistent XLA compilation cache.

TPU compiles of the full trunk take minutes (notably through remote-tunnel
backends); enabling JAX's on-disk compilation cache makes every subsequent
process start warm.  Called by the CLIs, bench, and tests that compile the
full model.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None):
    import jax
    cache_dir = cache_dir or os.environ.get(
        'ABX_COMPILE_CACHE',
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), '.cache',
            'xla_compile'))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
    except Exception:  # older jax without these flags
        pass
    return cache_dir
