"""Persistent XLA compilation cache.

The GAN training step is a large graph (3 discriminator families x 2 phases
x fwd+bwd); cold XLA-CPU compiles take minutes.  Caching compiled modules
on disk makes repeated runs (tests, the driver's dryrun, training restarts)
near-instant.  Safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(repo_root, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these options
