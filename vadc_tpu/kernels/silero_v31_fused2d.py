"""Silero v3.1 encoder+LSTM+decoder as ONE Pallas kernel — 2-D-only edition.

The natural whole-model kernel (silero_v31_fused.py) needs 3-D batched dots
and leading-dim-split reshapes, which the remote Mosaic toolchain in this
environment cannot compile (it SIGABRTs; see probe notes there). This
version expresses the ENTIRE pipeline in the subset that toolchain is proven
to handle — 2-D matmuls, elementwise ops, row/lane slices, 2-operand
concats, integer-indexed 3-D refs:

  * activations live as 2-D [BLK*S, C] row matrices, rows stream-major
    (row = stream * S + frame);
  * the depthwise conv k5 is 5 row-shifted multiplies with iota-derived
    frame-boundary masks (zero padding == masking the out-of-stream rows);
  * attention runs over the whole block at once: scores = K @ Q^T is
    [BLK*S, BLK*S] with a block-diagonal same-stream mask (iota row//S ==
    col//S) — a deliberate FLOP overspend (x BLK on the tiny attention
    matmuls, ~2% of model FLOPs at BLK=32) that buys pure 2-D dots;
  * strided 1x1 convs and the frame-major relayout before the LSTM are
    selection matmuls with tiny precomputed 0/1 matrices;
  * the LSTM consumes contiguous [BLK, H] row slabs (the layer-4 selection
    permutes rows to frame-major), and the decoder's frame mean folds into
    a running relu-sum as in the reference decoder algebra.

The STFT + adaptive normalization stay in XLA (fast there; the gather-free
variant measured slower under XLA and the in-kernel variant needs the
crashing reshape). Correctness oracle: models/silero_v31.forward.

MEASURED (TPU v5e, batch 2048, steady-state): 2.5 ms/chunk-step in bf16 at
BLK=32 vs 1.03 ms for the plain-XLA path, so XLA remains the default. The
round-2 toolchain added batched dot_general (attn_3d=True swaps in true
per-stream attention at 1/BLK the score FLOPs) — measured 2.56 ms: the
kernel is bound by its sequential per-block op chain, not attention FLOPs.
Scaling the block up does not help either: BLK=64 measures 2.75 ms (the
selection matmuls grow quadratically with BLK) and BLK=128 exceeds the
remote compile helper's limits. Full experiment matrix: docs/PERFORMANCE.md.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from vadc_tpu.models.weights import V3_STRIDES
from vadc_tpu.nn import functional as F
from vadc_tpu.nn.functional import BATCH_NORM_EPS, LAYER_NORM_EPS

SEQ0 = 25  # frames entering the encoder (1536-sample chunks)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _seq_sizes(seq0: int = SEQ0) -> list[int]:
    sizes = [seq0]
    for stride in V3_STRIDES:
        sizes.append(-(-sizes[-1] // stride))
    return sizes  # [25, 13, 7, 7, 7]


def _selection_matrices(blk: int, seq0: int = SEQ0) -> list[np.ndarray]:
    """Per-layer row-selection matrices.

    Layers with stride s keep frames 0, s, 2s... of each stream; the last
    layer's matrix additionally permutes rows to frame-major (row = frame *
    BLK + stream) so the LSTM reads contiguous per-step slabs."""
    sizes = _seq_sizes(seq0)
    sels = []
    for layer, stride in enumerate(V3_STRIDES):
        s_in, s_out = sizes[layer], sizes[layer + 1]
        last = layer == len(V3_STRIDES) - 1
        m = np.zeros((blk * s_out, blk * s_in), np.float32)
        for b in range(blk):
            for fo in range(s_out):
                row = fo * blk + b if last else b * s_out + fo
                m[row, b * s_in + fo * stride] = 1.0
        sels.append(m)
    return sels


def _make_kernel(treedef, blk: int, fast: bool, seq0: int = SEQ0, attn_3d: bool = False):
    sizes = _seq_sizes(seq0)
    dot_prec = lax.Precision.DEFAULT if fast else lax.Precision.HIGHEST
    in_dt = jnp.bfloat16 if fast else jnp.float32

    def dot(a, b):
        return jnp.dot(
            a.astype(in_dt),
            b.astype(in_dt),
            preferred_element_type=jnp.float32,
            precision=dot_prec,
        )

    def bdot(a, b, dims):
        return lax.dot_general(
            a.astype(in_dt),
            b.astype(in_dt),
            dims,
            preferred_element_type=jnp.float32,
            precision=dot_prec,
        )

    def layer_norm(x, w, b):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        return (x - mean) * lax.rsqrt(var + LAYER_NORM_EPS) * w + b

    def transformer_layer(x, p, sel_ref, seq):
        rows, c_in = x.shape
        # frame index of each row (rows are stream-major)
        fi = lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % seq
        # ---- depthwise conv k5 pad2 via masked row shifts ----
        dw_t = p["dw_w"][:].T  # [5, C]
        xp = jnp.pad(x, ((2, 2), (0, 0)))
        acc = None
        for k in range(5):
            shift = k - 2
            valid = ((fi + shift >= 0) & (fi + shift < seq)).astype(jnp.float32)
            term = xp[k : k + rows, :] * dw_t[k : k + 1, :] * valid
            acc = term if acc is None else acc + term
        h = jax.nn.relu(acc + p["dw_b"][:])
        # ---- pointwise + projection residual ----
        c_out = p["pw_w"].shape[0]
        h = dot(h, p["pw_w"][:].T) + p["pw_b"][:]
        if "proj_w" in p:
            h = h + dot(x, p["proj_w"][:].T) + p["proj_b"][:]
        else:
            h = h + x
        h = jax.nn.relu(h)
        # ---- attention (k.q^T orientation) ----
        qkv = dot(h, p["qkv_w"][:].T) + p["qkv_b"][:]  # [R, 3C]
        hd = c_out // 2
        attn_out = None
        if attn_3d:
            # true per-stream batched attention (toolchains with batched
            # dot_general): 1/BLK the score FLOPs of the block-diagonal
            # form, no mask
            qkv3 = qkv.reshape(blk, seq, 3 * c_out)
            for head in range(2):
                q = qkv3[:, :, head * hd : (head + 1) * hd]
                k_ = qkv3[:, :, c_out + head * hd : c_out + (head + 1) * hd]
                v = qkv3[:, :, 2 * c_out + head * hd : 2 * c_out + (head + 1) * hd]
                scores = bdot(k_, q, (((2,), (2,)), ((0,), (0,))))  # [BLK,S,S]
                scores = scores / jnp.sqrt(jnp.float32(hd))
                scores = scores - jnp.max(scores, axis=-1, keepdims=True)
                alpha = jnp.exp(scores)
                alpha = alpha / jnp.sum(alpha, axis=-1, keepdims=True)
                head_out = bdot(alpha, v, (((2,), (1,)), ((0,), (0,))))
                proj = dot(
                    head_out.reshape(rows, hd),
                    p["att_proj_w"][:, head * hd : (head + 1) * hd].T,
                )
                attn_out = proj if attn_out is None else attn_out + proj
        else:
            # block-diagonal fallback: whole-block [R, R] masked dots (the
            # only form the round-1 Mosaic toolchain compiled) — a
            # deliberate xBLK FLOP overspend on the tiny attention matmuls
            row_stream = lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // seq
            col_stream = lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // seq
            same = row_stream == col_stream
            for head in range(2):
                q = qkv[:, head * hd : (head + 1) * hd]
                k_ = qkv[:, c_out + head * hd : c_out + (head + 1) * hd]
                v = qkv[:, 2 * c_out + head * hd : 2 * c_out + (head + 1) * hd]
                scores = dot(k_, q.T) / jnp.sqrt(jnp.float32(hd))
                scores = jnp.where(same, scores, -1e30)
                scores = scores - jnp.max(scores, axis=-1, keepdims=True)
                alpha = jnp.exp(scores)
                alpha = alpha / jnp.sum(alpha, axis=-1, keepdims=True)
                head_out = dot(alpha, v)  # [R, hd]
                # concat-free head merge: out_proj columns for this head
                proj = dot(head_out, p["att_proj_w"][:, head * hd : (head + 1) * hd].T)
                attn_out = proj if attn_out is None else attn_out + proj
        h = h + attn_out + p["att_proj_b"][:]
        h = layer_norm(h, p["norm1_w"][:], p["norm1_b"][:])
        ff = jax.nn.relu(dot(h, p["lin1_w"][:].T) + p["lin1_b"][:])
        ff = dot(ff, p["lin2_w"][:].T) + p["lin2_b"][:]
        h = layer_norm(h + ff, p["norm2_w"][:], p["norm2_b"][:])
        # ---- strided 1x1 conv (selection matmul) + batchnorm + relu ----
        h = dot(sel_ref[:], h)
        h = dot(h, p["conv_w"][:].T) + p["conv_b"][:]
        if "bn_w" in p:  # BN-folded archives (official .onnx) omit these
            inv = lax.rsqrt(p["bn_var"][:] + BATCH_NORM_EPS)
            h = (h - p["bn_mean"][:]) * inv * p["bn_w"][:] + p["bn_b"][:]
        return jax.nn.relu(h)

    def kernel(*refs):
        param_refs = jax.tree.unflatten(treedef, refs[: treedef.num_leaves])
        sel_refs = refs[treedef.num_leaves : treedef.num_leaves + 4]
        x_ref, h0_ref, c0_ref = refs[treedef.num_leaves + 4 : treedef.num_leaves + 7]
        probs_ref, hn_ref, cn_ref = refs[treedef.num_leaves + 7 :]

        x = x_ref[:]
        for layer_idx, layer_p in enumerate(param_refs["layers"]):
            x = transformer_layer(x, layer_p, sel_refs[layer_idx], sizes[layer_idx])
        # x: [seq4 * BLK, 64] frame-major

        # ---- 2-layer LSTM, decoder folded into a running relu-sum ----
        w_l = [param_refs["lstm_w"][layer].T for layer in range(2)]
        b_l = [param_refs["lstm_b"][layer] for layer in range(2)]
        hidden = 64
        h = [h0_ref[0], h0_ref[1]]
        c = [c0_ref[0], c0_ref[1]]
        seq = sizes[-1]
        dec_acc = jnp.zeros((blk, hidden), jnp.float32)
        for t in range(seq):
            inp = x[t * blk : (t + 1) * blk, :]
            for layer in range(2):
                gates = dot(jnp.concatenate([inp, h[layer]], axis=-1), w_l[layer]) + b_l[layer]
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


@functools.partial(jax.jit, static_argnames=("block_streams", "fast", "attn_3d"))
def forward_fused2d(
    params: dict,
    audio: jax.Array,
    h: jax.Array,
    c: jax.Array,
    *,
    block_streams: int = 32,
    fast: bool = False,
    attn_3d: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in v3.1 forward: XLA front-end (STFT + adaptive norm) + the
    fused 2-D encoder/LSTM/decoder kernel. audio [B, 1536]; h, c [2, B, 64]."""
    batch = audio.shape[0]
    blk = min(block_streams, batch)
    if batch % blk:
        raise ValueError(f"batch {batch} not a multiple of block {blk}")
    if fast:
        with F.fast_math():
            spect = F.stft_magnitude_nlc(
                audio, params["stft_basis"], pad_left=128, pad_right=128, hop=64
            )
    else:
        spect = F.stft_magnitude_nlc(
            audio, params["stft_basis"], pad_left=128, pad_right=128, hop=64
        )
    x = F.adaptive_audio_normalization_nlc(spect)  # [B, 25, 129]
    seq0 = x.shape[1]
    x2d = x.reshape(batch * seq0, x.shape[2])

    leaves, treedef = jax.tree.flatten(params)
    sels = [jnp.asarray(m) for m in _selection_matrices(blk, seq0)]
    sizes = _seq_sizes(seq0)

    grid = (batch // blk,)
    param_specs = [
        pl.BlockSpec(leaf.shape, lambda i, nd=leaf.ndim: (0,) * nd) for leaf in leaves
    ]
    sel_specs = [pl.BlockSpec(s.shape, lambda i: (0, 0)) for s in sels]
    probs, hn, cn = pl.pallas_call(
        _make_kernel(treedef, blk, fast, seq0, attn_3d),
        grid=grid,
        in_specs=param_specs
        + sel_specs
        + [
            pl.BlockSpec((blk * seq0, x.shape[2]), lambda i: (i, 0)),
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
    )(*leaves, *sels, x2d, h, c)
    return probs[:, 0], hn, cn
