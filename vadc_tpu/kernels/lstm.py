"""Fused multi-layer LSTM as a Pallas TPU kernel.

The XLA path (vadc_tpu.nn.functional.lstm) lowers each scan step to separate
gate-matmul/elementwise kernels with (h, c) round-tripping through HBM. Here
the whole sequence runs inside ONE kernel per stream block: fused ih|hh
weights (~256 KB) and the (h, c) stack stay in VMEM for all T steps, each
step is a single [BLK, 2H] x [2H, 4H] MXU matmul per layer plus VPU gate
math. Grid is over stream blocks — streams are independent, so blocks never
communicate.

Matches the semantics of the reference LSTM stack (lstm.c:31-218): gate
order i,f,g,o, biases pre-summed. Correctness oracle: nn.functional.lstm
(tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from vadc_tpu.nn import functional as F


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _lstm_kernel(x_ref, h0_ref, c0_ref, w_ref, b_ref, y_ref, hn_ref, cn_ref):
    """x [T, BLK, H]; h0/c0 [L, BLK, H]; w [L, 4H, 2H]; b [L, 4H];
    y [T, BLK, H]; hn/cn [L, BLK, H]."""
    num_layers = h0_ref.shape[0]
    seq_len = x_ref.shape[0]

    w = [w_ref[layer].T for layer in range(num_layers)]  # [2H, 4H]
    b = [b_ref[layer] for layer in range(num_layers)]
    hidden = x_ref.shape[-1]

    def step(t, carry):
        hs, cs = carry  # tuples of [BLK, H]
        inp = x_ref[t]
        new_h, new_c = [], []
        for layer in range(num_layers):
            gates = (
                jnp.dot(
                    jnp.concatenate([inp, hs[layer]], axis=-1),
                    w[layer],
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
                + b[layer]
            )
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g = F._tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c_new = f * cs[layer] + i * g
            h_new = o * F._tanh(c_new)
            new_h.append(h_new)
            new_c.append(c_new)
            inp = h_new
        y_ref[t] = inp
        return tuple(new_h), tuple(new_c)

    h = tuple(h0_ref[layer] for layer in range(num_layers))
    c = tuple(c0_ref[layer] for layer in range(num_layers))
    h, c = lax.fori_loop(0, seq_len, step, (h, c))
    for layer in range(num_layers):
        hn_ref[layer] = h[layer]
        cn_ref[layer] = c[layer]


def _lstm_decoder_kernel(
    x_ref, h0_ref, c0_ref, w_ref, b_ref, dw_ref, db_ref, probs_ref, hn_ref, cn_ref
):
    """LSTM + v3 decoder in one kernel: the decoder's frame mean commutes
    with its linear conv, so relu(h_top) is accumulated across steps and the
    2-logit projection applied once (reference decoder: relu -> 1x1 conv ->
    frame mean -> sigmoid, silero_v3.c:231-303)."""
    num_layers = h0_ref.shape[0]
    seq_len = x_ref.shape[0]
    hidden = x_ref.shape[-1]

    w = [w_ref[layer].T for layer in range(num_layers)]
    b = [b_ref[layer] for layer in range(num_layers)]

    def step(t, carry):
        hs, cs, acc = carry
        inp = x_ref[t]
        new_h, new_c = [], []
        for layer in range(num_layers):
            gates = (
                jnp.dot(
                    jnp.concatenate([inp, hs[layer]], axis=-1),
                    w[layer],
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )
                + b[layer]
            )
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g = F._tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c_new = f * cs[layer] + i * g
            h_new = o * F._tanh(c_new)
            new_h.append(h_new)
            new_c.append(c_new)
            inp = h_new
        return tuple(new_h), tuple(new_c), acc + jax.nn.relu(inp)

    h = tuple(h0_ref[layer] for layer in range(num_layers))
    c = tuple(c0_ref[layer] for layer in range(num_layers))
    zero = jnp.zeros((x_ref.shape[1], hidden), jnp.float32)
    h, c, acc = lax.fori_loop(0, seq_len, step, (h, c, zero))
    for layer in range(num_layers):
        hn_ref[layer] = h[layer]
        cn_ref[layer] = c[layer]
    logits = jnp.dot(
        acc / seq_len,
        dw_ref[:].T,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    ) + db_ref[:]
    probs_ref[:] = jax.nn.sigmoid(logits[:, 1:2])


@functools.partial(jax.jit, static_argnames=("block_streams",))
def lstm_decoder_fused(
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    w: jax.Array,
    b: jax.Array,
    dec_w: jax.Array,
    dec_b: jax.Array,
    *,
    block_streams: int = 512,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(encoder feats [B, T, H], state, lstm + decoder weights) ->
    (speech probs [B], hn, cn) in one kernel per stream block."""
    batch, seq, hidden = x.shape
    num_layers = w.shape[0]
    blk = min(block_streams, batch)
    if batch % blk:
        raise ValueError(f"batch {batch} not a multiple of block {blk}")
    grid = (batch // blk,)

    xt = x.transpose(1, 0, 2)
    probs, hn, cn = pl.pallas_call(
        _lstm_decoder_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((seq, blk, hidden), lambda i: (0, i, 0)),
            pl.BlockSpec((num_layers, blk, hidden), lambda i: (0, i, 0)),
            pl.BlockSpec((num_layers, blk, hidden), lambda i: (0, i, 0)),
            pl.BlockSpec(w.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(b.shape, lambda i: (0, 0)),
            pl.BlockSpec(dec_w.shape, lambda i: (0, 0)),
            pl.BlockSpec(dec_b.shape, lambda i: (0,)),
        ],
        out_specs=[
            pl.BlockSpec((blk, 1), lambda i: (i, 0)),
            pl.BlockSpec((num_layers, blk, hidden), lambda i: (0, i, 0)),
            pl.BlockSpec((num_layers, blk, hidden), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_layers, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((num_layers, batch, hidden), jnp.float32),
        ],
        interpret=_interpret(),
    )(xt, h0, c0, w, b, dec_w, dec_b)
    return probs[:, 0], hn, cn


@functools.partial(jax.jit, static_argnames=("block_streams",))
def lstm_fused(
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    w: jax.Array,
    b: jax.Array,
    *,
    block_streams: int = 512,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in replacement for nn.functional.lstm (batch-major interface).

    x: [B, T, H]; h0, c0: [L, B, H]; w: [L, 4H, 2H]; b: [L, 4H].
    Returns (y [B, T, H], hn, cn). B must be a multiple of block_streams
    (callers pad; the engine's batch sizes are powers of two).
    """
    batch, seq, hidden = x.shape
    num_layers = w.shape[0]
    blk = min(block_streams, batch)
    if batch % blk:
        raise ValueError(f"batch {batch} not a multiple of block {blk}")
    grid = (batch // blk,)

    xt = x.transpose(1, 0, 2)  # time-major [T, B, H]
    y, hn, cn = pl.pallas_call(
        _lstm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((seq, blk, hidden), lambda i: (0, i, 0)),
            pl.BlockSpec((num_layers, blk, hidden), lambda i: (0, i, 0)),
            pl.BlockSpec((num_layers, blk, hidden), lambda i: (0, i, 0)),
            pl.BlockSpec(w.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec(b.shape, lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((seq, blk, hidden), lambda i: (0, i, 0)),
            pl.BlockSpec((num_layers, blk, hidden), lambda i: (0, i, 0)),
            pl.BlockSpec((num_layers, blk, hidden), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((seq, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((num_layers, batch, hidden), jnp.float32),
            jax.ShapeDtypeStruct((num_layers, batch, hidden), jnp.float32),
        ],
        interpret=_interpret(),
    )(xt, h0, c0, w, b)
    return y.transpose(1, 0, 2), hn, cn
