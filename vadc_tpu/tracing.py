"""Profiling / tracing — the role Tracy zones play in the reference.

The reference wraps every NN op in TracyCZone/TracyCZoneEnd pairs streamed to
an external viewer (SURVEY.md §5.1). The TPU-native equivalents:

  * `zone(name)` — `jax.named_scope` wrapper; zone names annotate the HLO so
    per-op cost shows up in XLA/TensorBoard/Perfetto traces. Zero cost when
    no profiler is attached (they are just metadata), mirroring Tracy's
    compile-time gating.
  * `profile(outdir)` — context manager around `jax.profiler.trace`; produces
    a TensorBoard/Perfetto-loadable trace directory. The CLI exposes it as
    `VADC_TPU_PROFILE=<dir>`.

Zone coverage mirrors the reference's zone set: stft, adaptive_norm, each
encoder layer, lstm, decoder (reference conv.c:117, stft.c:17, lstm.c:41,
transformer.c:18, misc.c:3, silero_v3.c:6).
"""

from __future__ import annotations

import contextlib
import os

import jax


def zone(name: str):
    """Named profiling zone (usable as context manager)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def profile(outdir: str | None = None):
    """Capture a device trace for the enclosed block. If `outdir` is None the
    env var VADC_TPU_PROFILE is consulted; if neither is set this is a no-op."""
    outdir = outdir or os.environ.get("VADC_TPU_PROFILE")
    if not outdir:
        yield
        return
    with jax.profiler.trace(outdir):
        yield
