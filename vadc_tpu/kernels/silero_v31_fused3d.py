"""Silero v3.1 encoder+LSTM+decoder as ONE Pallas kernel — 3-D edition.

Round-2 Mosaic toolchains compile batched `lax.dot_general`, 3-D x 2-D
`jnp.dot`, and leading-dim-split reshapes (probed; round 1's SIGABRTs are
gone). That retires the 2-D workarounds of silero_v31_fused2d:

  * activations live as [BLK, S, C] (no stream-major row matrices);
  * attention is TRUE batched per-stream SDPA — 1/BLK the score FLOPs of
    the block-diagonal masked form, no iota masks;
  * conv stride-2 is a pad + [BLK, S/2, 2, C] reshape + slice — the
    quadratically-sized ([BLK*S_out, BLK*S_in]) selection matrices are
    gone, which is what capped the 2-D kernel's block size (at BLK=128 the
    selection matrices alone were ~21 MB and the remote compiler died);
  * the LSTM reads x[:, t, :] slabs directly — no frame-major permutation.

The STFT + adaptive norm stay in XLA (fast there; the in-kernel hop-block
variant pushed the whole-model compile over the remote compiler's limits).
Correctness oracle: models/silero_v31.forward (interpret parity 4e-10).

MEASURED (TPU v5e, batch 2048, steady-state): **5.5 ms/chunk-step at
BLK=32** vs 2.5 ms for the 2-D kernel and 1.03 ms for plain XLA — this
remote Mosaic toolchain lowers the 3-D forms (batched dots, 3-D
elementwise) an order of magnitude less efficiently than the 2-D subset,
and BLK >= 64 SIGKILLs its compile helper (~13 min then killed). Full
experiment matrix in docs/PERFORMANCE.md. The kernel stands as the natural
formulation for a standard Mosaic toolchain; on this one the XLA path
remains the production default.

Reference hot path being fused: silero_v3.c:72-215.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from vadc_tpu.models.weights import V3_STRIDES
from vadc_tpu.nn import functional as F
from vadc_tpu.nn.functional import BATCH_NORM_EPS, LAYER_NORM_EPS

SEQ0 = 25


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _make_kernel(treedef, blk: int, fast: bool, seq0: int = SEQ0):
    # fast mode = precision DEFAULT on fp32 values (bf16 MXU multiplies).
    # Do NOT explicitly cast operands to bf16: 3-D dots whose contraction
    # dim is not a multiple of 128 (the 129-bin spectrogram) crash the
    # remote Mosaic compiler when the operands are bf16-typed, but lower
    # fine as fp32 values at DEFAULT precision — same arithmetic (probed).
    dot_prec = lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST

    def dot(a, b):
        """[..., K] x [K, O] — 3-D x 2-D dots lower fine on this toolchain."""
        return jnp.dot(
            a, b, preferred_element_type=jnp.float32, precision=dot_prec
        )

    def bdot(a, b, dims):
        return lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32, precision=dot_prec
        )

    def layer_norm(x, w, b):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * lax.rsqrt(var + LAYER_NORM_EPS) * w + b

    def attention(h, p):
        """h [BLK, S, C]: Silero's k.q^T 2-head SDPA, per stream."""
        c_out = h.shape[2]
        hd = c_out // 2
        qkv = dot(h, p["qkv_w"][:].T) + p["qkv_b"][:]  # [BLK, S, 3C]
        out = None
        for head in range(2):
            q = qkv[:, :, head * hd : (head + 1) * hd]
            k_ = qkv[:, :, c_out + head * hd : c_out + (head + 1) * hd]
            v = qkv[:, :, 2 * c_out + head * hd : 2 * c_out + (head + 1) * hd]
            scores = bdot(k_, q, (((2,), (2,)), ((0,), (0,))))  # [BLK, S, S]
            scores = scores / jnp.sqrt(jnp.float32(hd))
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            alpha = jnp.exp(scores)
            alpha = alpha / jnp.sum(alpha, axis=-1, keepdims=True)
            head_out = bdot(alpha, v, (((2,), (1,)), ((0,), (0,))))  # [BLK,S,hd]
            proj = dot(head_out, p["att_proj_w"][:, head * hd : (head + 1) * hd].T)
            out = proj if out is None else out + proj
        return out + p["att_proj_b"][:]

    def transformer_layer(x, p, stride):
        """x [BLK, S, C_in] -> [BLK, ceil(S/stride), C_out]."""
        blk_, seq, c_in = x.shape
        # depthwise conv k5 pad2 along S: 5 shifted multiplies
        dw_t = p["dw_w"][:].T  # [5, C]
        xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
        acc = dw_t[0:1, :][None] * xp[:, 0:seq, :]
        for k in range(1, 5):
            acc = acc + dw_t[k : k + 1, :][None] * xp[:, k : k + seq, :]
        h = jax.nn.relu(acc + p["dw_b"][:])
        # pointwise + projection residual
        h = dot(h, p["pw_w"][:].T) + p["pw_b"][:]
        if "proj_w" in p:
            h = h + dot(x, p["proj_w"][:].T) + p["proj_b"][:]
        else:
            h = h + x
        h = jax.nn.relu(h)
        c_out = h.shape[2]
        # transformer block (post-norm)
        h = h + attention(h, p)
        h = layer_norm(h, p["norm1_w"][:], p["norm1_b"][:])
        ff = jax.nn.relu(dot(h, p["lin1_w"][:].T) + p["lin1_b"][:])
        ff = dot(ff, p["lin2_w"][:].T) + p["lin2_b"][:]
        h = layer_norm(h + ff, p["norm2_w"][:], p["norm2_b"][:])
        # strided 1x1 conv: pad-to-even + pair-reshape + even slice
        if stride == 2:
            s_pad = (seq + 1) // 2 * 2
            if s_pad != seq:
                h = jnp.pad(h, ((0, 0), (0, s_pad - seq), (0, 0)))
            h = h.reshape(blk_, s_pad // 2, 2, c_out)[:, :, 0, :]
        elif stride != 1:
            raise NotImplementedError(f"stride {stride}")
        h = dot(h, p["conv_w"][:].T) + p["conv_b"][:]
        if "bn_w" in p:  # absent in BN-folded archives
            inv = lax.rsqrt(p["bn_var"][:] + BATCH_NORM_EPS)
            h = (h - p["bn_mean"][:]) * inv * p["bn_w"][:] + p["bn_b"][:]
        return jax.nn.relu(h)

    def kernel(*refs):
        param_refs = jax.tree.unflatten(treedef, refs[: treedef.num_leaves])
        x_ref, h0_ref, c0_ref = refs[treedef.num_leaves : treedef.num_leaves + 3]
        probs_ref, hn_ref, cn_ref = refs[treedef.num_leaves + 3 :]

        x = x_ref[:]  # [BLK, S0, 129]
        for layer_p, stride in zip(param_refs["layers"], V3_STRIDES):
            x = transformer_layer(x, layer_p, stride)
        # x: [BLK, 7, 64]

        # 2-layer LSTM; decoder folded into a running relu-sum. The fused
        # ih|hh weight is row-split into two matmuls: concatenating a
        # 3-D-slab slice with the hidden state on the lane dim miscompiles
        # on the remote Mosaic toolchain (probed), and two [B,64]x[64,256]
        # dots cost the same as one [B,128]x[128,256] anyway.
        hidden = 64
        w_x = [param_refs["lstm_w"][layer].T[:hidden] for layer in range(2)]
        w_h = [param_refs["lstm_w"][layer].T[hidden:] for layer in range(2)]
        b_l = [param_refs["lstm_b"][layer] for layer in range(2)]
        h = [h0_ref[0], h0_ref[1]]
        c = [c0_ref[0], c0_ref[1]]
        seq = x.shape[1]
        dec_acc = jnp.zeros((blk, hidden), jnp.float32)
        for t in range(seq):
            inp = x[:, t, :]
            for layer in range(2):
                gates = dot(inp, w_x[layer]) + dot(h[layer], w_h[layer]) + b_l[layer]
                i = jax.nn.sigmoid(gates[:, :hidden])
                f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
                g = F._tanh(gates[:, 2 * hidden : 3 * hidden])
                o = jax.nn.sigmoid(gates[:, 3 * hidden :])
                c[layer] = f * c[layer] + i * g
                h[layer] = o * F._tanh(c[layer])
                inp = h[layer]
            dec_acc = dec_acc + jax.nn.relu(inp)
        hn_ref[0], hn_ref[1] = h[0], h[1]
        cn_ref[0], cn_ref[1] = c[0], c[1]
        logits = dot(dec_acc / seq, param_refs["dec_w"][:].T) + param_refs["dec_b"][:]
        probs_ref[:] = jax.nn.sigmoid(logits[:, 1:2])

    return kernel


@functools.partial(jax.jit, static_argnames=("block_streams", "fast"))
def forward_fused3d(
    params: dict,
    audio: jax.Array,
    h: jax.Array,
    c: jax.Array,
    *,
    block_streams: int = 128,
    fast: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in v3.1 forward: XLA front-end (STFT + adaptive norm) + the
    fused 3-D encoder/LSTM/decoder kernel. audio [B, 1536]; h, c [2, B, 64]."""
    batch = audio.shape[0]
    blk = min(block_streams, batch)
    if batch % blk:
        raise ValueError(f"batch {batch} not a multiple of block {blk}")
    if fast:
        with F.fast_math():
            spect = F.stft_magnitude_nlc(
                audio, params["stft_basis"], pad_left=128, pad_right=128, hop=64
            )
            x = F.adaptive_audio_normalization_nlc(spect)
    else:
        spect = F.stft_magnitude_nlc(
            audio, params["stft_basis"], pad_left=128, pad_right=128, hop=64
        )
        x = F.adaptive_audio_normalization_nlc(spect)  # [B, S0, 129]
    seq0 = x.shape[1]

    leaves, treedef = jax.tree.flatten(params)
    grid = (batch // blk,)
    param_specs = [
        pl.BlockSpec(leaf.shape, lambda i, nd=leaf.ndim: (0,) * nd) for leaf in leaves
    ]
    probs, hn, cn = pl.pallas_call(
        _make_kernel(treedef, blk, fast, seq0),
        grid=grid,
        in_specs=param_specs
        + [
            pl.BlockSpec((blk, seq0, x.shape[2]), lambda i: (i, 0, 0)),
            pl.BlockSpec((2, blk, 64), lambda i: (0, i, 0)),
            pl.BlockSpec((2, blk, 64), lambda i: (0, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((blk, 1), lambda i: (i, 0)),
            pl.BlockSpec((2, blk, 64), lambda i: (0, i, 0)),
            pl.BlockSpec((2, blk, 64), lambda i: (0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, 1), jnp.float32),
            jax.ShapeDtypeStruct((2, batch, 64), jnp.float32),
            jax.ShapeDtypeStruct((2, batch, 64), jnp.float32),
        ],
        interpret=_interpret(),
    )(*leaves, x, h, c)
    return probs[:, 0], hn, cn
