"""Runtime configuration helpers."""

from __future__ import annotations

import os
from pathlib import Path


def honor_jax_platforms_env() -> None:
    """Make `JAX_PLATFORMS` authoritative for CLI processes.

    Some managed environments install a sitecustomize that force-registers an
    experimental remote-device plugin and overrides `jax_platforms`, silently
    ignoring the env var. A subprocess launched with `JAX_PLATFORMS=cpu`
    (tests, cluster cron jobs, air-gapped boxes) then runs every op through a
    remote-device tunnel — measured here as ~70 s of RTT stalls for a 3 s
    clip that takes ~4 s on local CPU. Re-applying the env var through
    jax.config after import restores the documented JAX contract."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> None:
    """Cache XLA executables across processes so repeat CLI invocations skip
    the multi-second jit compile (first compile on TPU is ~10 s; cached loads
    are ~100 ms). Safe to call multiple times.

    Also re-applies JAX_PLATFORMS (see honor_jax_platforms_env): every entry
    point that wants the cache also wants the documented platform contract."""
    import jax

    honor_jax_platforms_env()
    if cache_dir is None:
        cache_dir = os.environ.get(
            "VADC_TPU_CACHE_DIR",
            str(Path.home() / ".cache" / "vadc_tpu" / "jax_cache"),
        )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
