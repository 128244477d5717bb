"""Persistent XLA compilation cache.

Cold library scans are compile-bound on this class of runtime (a
120-track mixed-format scan measured ~440 s of remote compiles vs ~19 s
of actual work), and every fresh process used to pay it again. JAX's
persistent cache stores serialized executables keyed by computation
hash, so the second process reuses them.

Called from the analysis entry modules (not the package __init__: pure
bitstream operations must not pay the jax import).
"""

from __future__ import annotations

import os

_DONE = False


def ensure_compilation_cache() -> None:
    """Point jax at a persistent on-disk executable cache (idempotent).

    Opt out with MP3RGAIN_NO_COMPILE_CACHE=1; relocate with
    MP3RGAIN_COMPILE_CACHE_DIR."""
    global _DONE
    if _DONE or os.environ.get("MP3RGAIN_NO_COMPILE_CACHE"):
        return
    _DONE = True
    try:
        import jax

        cache_dir = os.environ.get("MP3RGAIN_COMPILE_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "mp3rgain_tpu", "xla"
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        # Cache is an optimization only — any failure (read-only home,
        # old jax) must never break analysis.
        pass
