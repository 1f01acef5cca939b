"""Runtime configuration helpers."""

from __future__ import annotations

import os
from pathlib import Path


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> None:
    """Cache XLA executables across processes so repeat CLI invocations skip
    the multi-second jit compile (first compile on TPU is ~10 s; cached loads
    are ~100 ms). Safe to call multiple times."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get(
            "VADC_TPU_CACHE_DIR",
            str(Path.home() / ".cache" / "vadc_tpu" / "jax_cache"),
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
