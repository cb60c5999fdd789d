"""Persistent XLA compilation cache for fast cold starts.

First compiles of the jitted pipeline programs are the dominant cold-start
cost in production serving (the full scene pipeline compiles ~a dozen
programs; on a tunneled dev chip that is minutes of wall time).  JAX ships
a persistent on-disk compilation cache; this helper turns it on with
sensible defaults so serving processes and repeated benchmark runs reuse
each other's compiles.

Enabled by default in the production entries — ``cli.main`` and
``training.checkpoint.load_deblender`` call it best-effort (opt out with
``DEBVADER_NO_COMPILE_CACHE=1``) — as well as by bench.py and the bench
scripts.  Setting ``JAX_COMPILATION_CACHE_DIR`` in the environment also
works natively and overrides the default directory.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

__all__ = ["enable_compilation_cache"]

_DEFAULT_DIR = "~/.cache/debvader_tpu/xla"


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache and return the directory.

    cache_dir: target directory (created if missing).  Defaults to
    ``$JAX_COMPILATION_CACHE_DIR`` or ``~/.cache/debvader_tpu/xla``.
    Programs compiling in under 1 s are not persisted (cache churn for no
    win; override via ``$DEBVADER_CACHE_MIN_COMPILE_SECS`` — tests use 0);
    all supported backends are allowed so CPU test runs cache too.

    Best-effort: an unwritable filesystem or an old JAX without these
    flags returns None rather than failing the caller — the cache is an
    accelerator, never a dependency.
    """
    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    try:
        path = Path(cache_dir).expanduser()
        path.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(path))
        min_secs = float(os.environ.get("DEBVADER_CACHE_MIN_COMPILE_SECS", 1.0))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError, ValueError):
        return None
    return str(path)
