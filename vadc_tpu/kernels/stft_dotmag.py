"""Fused spectrum-dot + magnitude: the fusion XLA structurally cannot do.

Round-4 HLO buffer accounting (docs/PERFORMANCE.md "Round 4") showed the
turbo step is at ~100% of its intermediate-HBM-traffic bound, and the #1
intermediate is the fp32 spectrum [B, 25, 258] (50.4 MB at batch 2048): XLA
must materialize a dot's output before any consumer fusion reads it, so the
spectrum costs a 50 MB write + 50 MB read before the magnitude reduces it
to 129 channels. (The r3 "split-matmul STFT" experiment measured exactly
this: splitting into re/im dots so the magnitude could fuse still
materialized the first dot's output as the second fusion's operand.)

This kernel takes the XLA-materialized frames (the framing stays on the
XLA side — its gather-free hop-block slices are already optimal there, and
the r3 in-kernel-framing attempt lost 5x to the 64-deep contraction it
forced), computes both half-spectrum dots with the full 256-deep
contraction in VMEM, and writes ONLY the [*, cutoff] magnitude. Per step
at batch 2048 that removes the 50 MB spectrum write and its 50 MB re-read
— ~100 MB of the ~450 MB the traffic accounting charges to the step.

Toolchain safety (tools/tpu_check.py probe matrix): 2-D dots with
128-multiple contractions are the remote Mosaic toolchain's reliable
subset; re/im are SEPARATE [n_fft, cutoff] operands, so no 129-boundary
lane slicing or lane concat appears anywhere (the two still-flaky probes).

Reference being fused: my_stft_ + magnitude, stft.c:194-213 — the
reference's hand-unrolled AVX2 loop fuses the dot and the magnitude into
one pass on CPU for the same reason.

MEASURED (r4, TPU v5e, batch 2048, docs/turbo_gap_r4.jsonl "dotmag"):
on-chip parity is BIT-EXACT (max abs err 0.0 — same bf16-operand fp32-accum
MXU math), but the whole turbo step gets 60% SLOWER (0.82-0.85 vs 0.51 ms,
block_rows swept 256-2048), and a dependent-chain op-level A/B isolates the
cause: the kernel runs 417 us vs the einsum path's 230 us — the remote
Mosaic lowering of these [bm,256]x[256,129] dots achieves ~0.55x of XLA's
dot throughput, which swamps the ~100 MB/step traffic saving. XLA's einsum
path is itself AT its traffic bound, so there is nothing to reclaim by
scheduling. Ships default-OFF (functional.STFT_DOTMAG_PALLAS); interpret
parity in tests/test_kernels.py keeps it re-runnable the day the toolchain
moves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(frames_ref, wr_ref, wi_ref, out_ref):
    a = frames_ref[...]
    sr = jnp.dot(a, wr_ref[...], preferred_element_type=jnp.float32)
    si = jnp.dot(a, wi_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = jnp.sqrt(sr * sr + si * si).astype(out_ref.dtype)


def dot_magnitude(
    frames: jax.Array,
    wr: jax.Array,
    wi: jax.Array,
    *,
    block_rows: int = 1024,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jax.Array:
    """frames [..., n_fft] x (wr, wi) [n_fft, cutoff] -> magnitude
    [..., cutoff] = sqrt((frames@wr)^2 + (frames@wi)^2), spectrum never
    leaving VMEM. Leading dims are flattened into one row axis; the row
    count must divide by block_rows after flattening (all callers' batch
    shapes are powers of two times 25/13/7/4 frames — block_rows is clamped
    to a divisor)."""
    lead = frames.shape[:-1]
    n_fft = frames.shape[-1]
    cutoff = wr.shape[-1]
    rows = 1
    for d in lead:
        rows *= d
    a2 = frames.reshape(rows, n_fft)
    bm = min(block_rows, rows)
    while rows % bm:
        bm //= 2
    out = pl.pallas_call(
        _kernel,
        grid=(rows // bm,),
        in_specs=[
            pl.BlockSpec((bm, n_fft), lambda i: (i, 0)),
            pl.BlockSpec((n_fft, cutoff), lambda i: (0, 0)),
            pl.BlockSpec((n_fft, cutoff), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, cutoff), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, cutoff), out_dtype),
        interpret=interpret,
    )(a2, wr, wi)
    return out.reshape(*lead, cutoff)


def split_basis(basis: jax.Array, dtype=None) -> tuple[jax.Array, jax.Array]:
    """[2*cutoff, n_fft] Fourier basis (re rows then im) -> transposed
    (wr, wi) [n_fft, cutoff] kernel operands."""
    cutoff = basis.shape[0] // 2
    wr = basis[:cutoff].T
    wi = basis[cutoff:].T
    if dtype is not None:
        wr, wi = wr.astype(dtype), wi.astype(dtype)
    return wr, wi
