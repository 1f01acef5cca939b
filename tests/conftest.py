"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the driver
dry-runs the real multi-chip path separately via __graft_entry__)."""

import os

# Must be set before jax initializes its backends. Unconditional: the outer
# environment may carry JAX_PLATFORMS=<remote-plugin>, and runtime helpers
# re-apply the env var via honor_jax_platforms_env() — the suite must pin
# both the env var and the config to local CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from pathlib import Path

import numpy as np
import pytest

import jax

# The environment's sitecustomize may force-register a TPU plugin and
# override jax_platforms (ignoring JAX_PLATFORMS); force CPU after import so
# tests run locally on the 8 virtual devices, not through a device tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU test recompiles of the full model are
# tens of seconds; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/vadc_tpu_jax_cache")
# Threshold 0: the suite's dominant cost is EAGER full-model calls, which
# compile hundreds of tiny per-op executables (each well under the usual
# 0.5 s threshold) — persisting all of them cuts an eager v3 forward from
# ~9.7 s to ~1.9 s on a warm cache (measured, single-core CPU box).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

REFERENCE_TESTDATA = Path("/root/reference/testdata")


@pytest.fixture(scope="session")
def testdata() -> Path:
    if not REFERENCE_TESTDATA.is_dir():
        pytest.skip("reference testdata not available")
    return REFERENCE_TESTDATA


def max_abs_error(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"shape mismatch {a.shape} vs {b.shape}"
    return float(np.max(np.abs(a - b))) if a.size else 0.0


def error_magnitude(err: float) -> str:
    """Bucket a max-abs error like the reference harness does (test.c:70-130)."""
    if err == 0.0:
        return "zero"
    for exp in range(-10, 1):
        if err <= 10.0**exp:
            return f"1e{exp}"
    return "above-1"


def assert_close(actual, expected, atol: float, label: str = ""):
    err = max_abs_error(actual, expected)
    assert err <= atol, (
        f"{label or 'tensor'}: max abs error {err:.3e} "
        f"(bucket {error_magnitude(err)}) exceeds atol {atol:.1e}"
    )
    return err
