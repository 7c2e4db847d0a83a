"""Persistent XLA compilation cache.

The N=243 train_step's one-time compile is ~16 minutes through the remote-
compile tunnel (RESULTS.md) — the reference has no compile step at all, so a
cold start that long is a real usability regression vs. its "python main.py
and go" workflow.  JAX's persistent compilation cache
(``jax_compilation_cache_dir``) serializes compiled executables keyed by the
HLO + compile options, so every process after the first deserializes in
seconds instead of recompiling.

Every CLI entry point (train.py / bench.py / eval.py / demo.py / tools/*)
calls :func:`enable_compilation_cache` at startup.  Env knobs:

- ``GFT_COMPILE_CACHE=0``      disable entirely
- ``GFT_COMPILE_CACHE_DIR=...`` override the cache location
  (default ``~/.cache/gym_formation_tpu/jax_cache``)
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "gym_formation_tpu", "jax_cache"
)

_enabled_dir = None


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``cache_dir`` (created if
    missing).  Returns the directory in use, or None when disabled via
    ``GFT_COMPILE_CACHE=0``.  Idempotent."""
    global _enabled_dir
    if os.environ.get("GFT_COMPILE_CACHE", "1") in ("0", "false", "off"):
        return None
    if _enabled_dir is not None:
        return _enabled_dir
    cache_dir = (
        cache_dir or os.environ.get("GFT_COMPILE_CACHE_DIR") or _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took any real compile time; tiny programs aren't
    # worth the disk round trip
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled_dir = cache_dir
    return cache_dir
