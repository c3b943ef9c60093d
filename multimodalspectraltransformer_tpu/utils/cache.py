"""Persistent XLA compilation cache.

First compile of the full model costs minutes on TPU (and the reference-
scale CLI pays it on every invocation without a cache). Enabling the
jax persistent compilation cache makes every repeat CLI/bench/test run
reuse compiled executables across processes.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "") -> str:
    """Point jax at a persistent on-disk compilation cache and return the
    directory used. Default: $MMT_XLA_CACHE or ~/.cache/mmt_tpu_xla."""
    import jax

    path = path or os.environ.get(
        "MMT_XLA_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "mmt_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
