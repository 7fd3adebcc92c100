"""Persistent XLA compilation cache wiring for the CLIs.

The reference pays torch's JIT warmup once per process; under jit the cost
is the XLA compile, which for the flagship train step is tens of seconds
per bucket shape. Persisting compiled executables to disk makes every rerun
(and every later bucket-shape encounter across runs) a cache hit instead.

The cache directory resolves from, in order: an explicit CLI flag, the
``DASPEECH_COMPILE_CACHE`` environment variable, then the default
``~/.cache/daspeech_tpu/xla`` (pass ``--compilation-cache-dir ""`` to
disable). Safe to call before or after backend initialization.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import jax

_DEFAULT = "~/.cache/daspeech_tpu/xla"


def enable_compilation_cache(cli_value: Optional[str] = None) -> Optional[str]:
    """Point jax's persistent compilation cache at a directory.

    Returns the directory in use, or None when disabled (empty string from
    the flag or the env var).
    """
    path = cli_value
    if path is None:
        path = os.environ.get("DASPEECH_COMPILE_CACHE", _DEFAULT)
    if not path:
        return None
    path = str(Path(path).expanduser())
    Path(path).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every executable, however small/fast-compiling: CLI runs span
    # many shapes (bucketed batches) and re-tracing is the common case
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
