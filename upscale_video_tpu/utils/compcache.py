"""Persistent XLA compilation cache wiring.

The Valar device program costs minutes of XLA/Mosaic compile time per
process (NOTES.md: ~7 min for the fused-RDB program at a 480px tile), and
the reference-style workflows are MANY short processes over the same
program (upscale -> fix-frames -> test-images all rebuild the same step).
JAX ships a persistent on-disk compilation cache that removes the repeat
cost; this module turns it on at every engine build.

Opt-out/retarget via ``UPSCALE_TPU_COMPILATION_CACHE_DIR`` (empty/"off"
disables; a path retargets).  Backends whose executables cannot be
serialized simply miss the cache — JAX degrades to a normal compile, so
enabling this is always safe.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

_DONE = False


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Idempotently enable JAX's persistent compilation cache.

    Returns the cache dir in effect, or None when disabled."""
    global _DONE
    env = os.environ.get("UPSCALE_TPU_COMPILATION_CACHE_DIR")
    d = cache_dir if cache_dir is not None else env
    if d is not None and d.strip().lower() in ("", "0", "off", "none"):
        return None
    if d is None:
        d = os.path.join(
            os.path.expanduser("~"), ".cache", "upscale_video_tpu", "xla"
        )
    if _DONE:
        return d
    try:
        import jax

        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # cache every compile that took real time; leave sub-second CPU
        # test compiles out of the write path
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _DONE = True
        return d
    except Exception as e:  # unknown config name on an older jax, RO fs, ...
        log.debug("compilation cache not enabled: %s", e)
        return None


def cache_dir_in_use() -> Optional[str]:
    """The persistent cache dir a prior :func:`enable_compilation_cache`
    put into effect, or None when disabled/unavailable."""
    if not _DONE:
        return None
    try:
        import jax

        return jax.config.jax_compilation_cache_dir
    except Exception:
        return None
