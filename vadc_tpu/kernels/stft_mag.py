"""Fused STFT + magnitude as one Pallas kernel.

The XLA path (functional.stft_magnitude_nlc) materializes the full
258-channel real/imag spectrum in HBM (fp32 [B, 25, 258] = 53 MB at batch
2048) before the magnitude reduces it to 129 channels; the STFT stage
measures ~97 us of the ~505 us turbo step, bandwidth-bound. This kernel
keeps the spectrum in VMEM and writes only the [B, 25, 129] magnitude.

Formulation notes (constraints of the remote Mosaic toolchain, probed in
tools/tpu_check.py):
  * frames are NOT gathered or lane-concatenated (lane-concat of slab
    slices miscompiles — still-blocked probe): the hop divides n_fft, so
    frame f of the hop-blocked audio is blocks[f : f + n_fft/hop]
    flattened, and the filter matmul decomposes into n_fft/hop shifted
    [*, hop] x [hop, C] matmuls accumulated in registers — the hop-block
    decomposition that loses under XLA (extra HBM round-trips) but is free
    here where the frames would otherwise have to be materialized;
  * re/im are laid out in separate 128-aligned column groups of the
    prepacked basis so the magnitude's two squares read aligned lane
    slices (col 129 / 258 boundaries are not sublane-sliceable).

Reference being fused: my_stft_ + magnitude, stft.c:15-224 (the reference's
own hand-unrolled 8x8 AVX2 fused dot is the same fusion idea on CPU).

MEASURED (r3, TPU v5e, batch 2048, scan difference): **539 us/window — a
LOSS** vs the XLA stft stage (~97 us inside the turbo step; 397 us for the
standalone fp32 pipeline this was timed against). The hop-block form caps
the MXU at a 64-deep contraction with a half-wasted 512-wide output, and
the only route to a full 256-deep dot (materializing frames in VMEM)
needs 64-aligned lane writes or a lane concat — both outside this remote
Mosaic toolchain's reliable subset (tools/tpu_check.py probes). Kept as
the documented experiment + interpret-mode parity test; NOT wired into
any model path. Consistent with the r2 conclusion that this toolchain's
lowering, not kernel design, bounds the fused kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vadc_tpu.nn.functional import reflect_pad_last


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _basis_layout(n_fft: int, hop: int, cutoff: int, col_pad: int):
    """Shape constants only (cache key); see prepack_basis."""
    return n_fft // hop, col_pad


def prepack_basis(basis: jax.Array, hop: int) -> jax.Array:
    """[2*cutoff, n_fft] Fourier basis -> [n_fft/hop, hop, 2*col_pad] with
    re filters in columns [0, col_pad) and im in [col_pad, 2*col_pad),
    col_pad 128-aligned. Host-side, once per model load."""
    n_filters, n_fft = basis.shape
    cutoff = n_filters // 2
    col_pad = _round_up(cutoff, 128)
    k = n_fft // hop
    out = jnp.zeros((k, hop, 2 * col_pad), jnp.float32)
    re = basis[:cutoff]  # [cutoff, n_fft]
    im = basis[cutoff:]
    for i in range(k):
        seg = slice(i * hop, (i + 1) * hop)
        out = out.at[i, :, :cutoff].set(re[:, seg].T)
        out = out.at[i, :, col_pad : col_pad + cutoff].set(im[:, seg].T)
    return out


def _kernel(blocks_ref, basis_ref, out_ref, *, n_frames: int, k: int, col_pad: int, cutoff: int):
    blk = blocks_ref.shape[0]
    acc = jnp.zeros((blk * n_frames, 2 * col_pad), jnp.float32)
    for i in range(k):
        seg = blocks_ref[:, i : i + n_frames, :]  # [blk, F, hop]
        seg2d = seg.reshape(blk * n_frames, seg.shape[-1])
        acc = acc + jnp.dot(
            seg2d, basis_ref[i], preferred_element_type=jnp.float32
        )
    re = acc[:, :col_pad]
    im = acc[:, col_pad:]
    mag = jnp.sqrt(re * re + im * im)  # [blk*F, col_pad]
    out_ref[:] = mag.reshape(blk, n_frames, col_pad)[:, :, :cutoff]


def stft_magnitude_pallas(
    audio: jax.Array,
    basis_packed: jax.Array,
    *,
    pad_left: int,
    pad_right: int,
    hop: int,
    cutoff: int,
    block_streams: int = 64,
) -> jax.Array:
    """audio [B, S] -> magnitude [B, F, cutoff], frames-major (NLC).

    basis_packed from prepack_basis. B must divide by block_streams (the
    callers' batch shapes are powers of two)."""
    k, hop_, _ = basis_packed.shape
    assert hop_ == hop
    n_fft = k * hop
    col_pad = basis_packed.shape[2] // 2
    padded = reflect_pad_last(audio, pad_left, pad_right)
    b, length = padded.shape
    assert length % hop == 0, (length, hop)
    n_frames = (length - n_fft) // hop + 1
    blocks = padded.reshape(b, length // hop, hop)
    blk = min(block_streams, b)
    assert b % blk == 0, (b, blk)
    kern = functools.partial(
        _kernel, n_frames=n_frames, k=k, col_pad=col_pad, cutoff=cutoff
    )
    return pl.pallas_call(
        kern,
        grid=(b // blk,),
        in_specs=[
            pl.BlockSpec((blk, length // hop, hop), lambda i: (i, 0, 0)),
            pl.BlockSpec((k, hop, 2 * col_pad), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((blk, n_frames, cutoff), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_frames, cutoff), jnp.float32),
    )(blocks, basis_packed)
