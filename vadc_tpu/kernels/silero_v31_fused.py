"""Silero v3.1 full forward as ONE fused Pallas TPU kernel.

Why: the model is tiny (~200 KB weights, <=25-frame sequences) but the XLA
path materializes ~20 intermediate activation tensors per chunk-step in HBM
(26 MB each at batch 2048), so the step is HBM-bandwidth- and
launch-overhead-bound. Here the whole pipeline — STFT matmul, magnitude,
adaptive normalization, 4 encoder stages (conv block + 2-head attention +
strided 1x1 conv + batchnorm), 2-layer LSTM, decoder — runs inside one
kernel per block of streams: all weights and every intermediate stay in
VMEM; HBM traffic is exactly (audio in, probs + state out).

Grid is over stream blocks (streams are independent; no cross-block
communication). All contractions run on the MXU in fp32 (HIGHEST-equivalent
via preferred_element_type) to preserve the golden-test fidelity contract.
Correctness oracle: models/silero_v31.forward (tests/test_kernels.py) —
probabilities agree to ~1e-8.

TOOLCHAIN NOTE: the remote Mosaic compiler available in the current build
environment SIGABRTs on leading-dim-split reshapes, 3-D x 2-D dots, and
batched dot_general (verified with minimal probe kernels), so this kernel
currently runs in interpret mode / awaits a standard Mosaic toolchain; the
simple-2-D-dot kernels (kernels/lstm.py) compile and run on the TPU today.

Reference pipeline being fused: silero_v3.c:72-215.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from vadc_tpu.nn import functional as F

from vadc_tpu.models.weights import V3_STRIDES
from vadc_tpu.nn.functional import ADAPTIVE_NORM_FILTER, LAYER_NORM_EPS, BATCH_NORM_EPS

N_FFT = 256
HOP = 64
CUTOFF = 129
PAD = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot(a, b):
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST
    )


def _log1p_series(y):
    """fp32 log1p to ~1 ulp (VPU ops only; see functional.accurate_log1p)."""
    z = 1.0 + y
    bits = lax.bitcast_convert_type(z, jnp.int32)
    e = (bits >> 23) - 127
    m = lax.bitcast_convert_type(
        (bits & jnp.int32(0x007FFFFF)) | jnp.int32(0x3F800000), jnp.float32
    )
    big = m > 1.4142135
    m = jnp.where(big, m * 0.5, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    poly = 1.0 + t2 * (
        1.0 / 3.0 + t2 * (0.2 + t2 * (1.0 / 7.0 + t2 * (1.0 / 9.0 + t2 * (1.0 / 11.0))))
    )
    return e * jnp.float32(0.693359375) + (2.0 * t * poly + e * jnp.float32(-2.12194440e-4))


def _layer_norm(x, w, b):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + LAYER_NORM_EPS) * w + b


def _attention(x, p):
    """x [BLK, S, C] -> [BLK, S, C]; Silero's k.q^T 2-head attention."""
    blk, seq, dim = x.shape
    hd = dim // 2
    qkv = _dot(x.reshape(blk * seq, dim), p["qkv_w"][:].T) + p["qkv_b"][:]
    qkv = qkv.reshape(blk, seq, 3 * dim)
    outs = []
    for head in range(2):
        q = qkv[:, :, head * hd : (head + 1) * hd]
        k = qkv[:, :, dim + head * hd : dim + (head + 1) * hd]
        v = qkv[:, :, 2 * dim + head * hd : 2 * dim + (head + 1) * hd]
        scores = lax.dot_general(
            k, q, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )  # [BLK, S, S] = k @ q^T
        scores = scores / jnp.sqrt(jnp.float32(hd))
        scores = scores - jnp.max(scores, axis=-1, keepdims=True)
        alpha = jnp.exp(scores)
        alpha = alpha / jnp.sum(alpha, axis=-1, keepdims=True)
        outs.append(
            lax.dot_general(
                alpha, v, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
        )  # [BLK, S, hd]
    attn = jnp.concatenate(outs, axis=-1).reshape(blk * seq, dim)
    out = _dot(attn, p["att_proj_w"][:].T) + p["att_proj_b"][:]
    return out.reshape(blk, seq, dim)


def _transformer_layer(x, p, stride):
    """x [BLK, S, C_in] -> [BLK, S_out, C_out]. Fused ConvBlock +
    TransformerBlock + strided 1x1 conv + BatchNorm + ReLU."""
    blk, seq, c_in = x.shape
    # depthwise conv k5 pad2 along seq (cross-correlation); taps read as
    # [1, C] row slices of the transposed weight (integer indexing on the
    # lane dim lowers to an unsupported gather in Mosaic)
    dw_t = p["dw_w"][:].T  # [5, C]
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
    acc = dw_t[0:1, :][None] * xp[:, 0:seq, :]
    for k in range(1, 5):
        acc = acc + dw_t[k : k + 1, :][None] * xp[:, k : k + seq, :]
    h = jax.nn.relu(acc + p["dw_b"][:])
    # pointwise + projection residual
    c_out = p["pw_w"].shape[0]
    h = _dot(h.reshape(blk * seq, c_in), p["pw_w"][:].T) + p["pw_b"][:]
    if "proj_w" in p:
        h = h + _dot(x.reshape(blk * seq, c_in), p["proj_w"][:].T) + p["proj_b"][:]
    else:
        h = h + x.reshape(blk * seq, c_in)
    h = jax.nn.relu(h).reshape(blk, seq, c_out)
    # transformer block (post-norm)
    h = h + _attention(h, p)
    h = _layer_norm(h, p["norm1_w"][:], p["norm1_b"][:])
    ff = jax.nn.relu(_dot(h.reshape(blk * seq, c_out), p["lin1_w"][:].T) + p["lin1_b"][:])
    ff = _dot(ff, p["lin2_w"][:].T) + p["lin2_b"][:]
    h = _layer_norm(h + ff.reshape(blk, seq, c_out), p["norm2_w"][:], p["norm2_b"][:])
    # strided 1x1 conv + batchnorm + relu. Stride-2 via pad-to-even, reshape
    # to pairs, slice the even element (strided middle-dim loads and N-way
    # stacks don't lower reliably in Mosaic).
    if stride == 2:
        s_pad = (seq + 1) // 2 * 2
        if s_pad != seq:
            h = jnp.pad(h, ((0, 0), (0, s_pad - seq), (0, 0)))
        h = h.reshape(blk, s_pad // 2, 2, c_out)[:, :, 0:1, :].reshape(
            blk, s_pad // 2, c_out
        )
    elif stride != 1:
        raise NotImplementedError(f"stride {stride}")
    s_out = h.shape[1]
    h = _dot(h.reshape(blk * s_out, c_out), p["conv_w"][:].T) + p["conv_b"][:]
    inv = lax.rsqrt(p["bn_var"][:] + BATCH_NORM_EPS)
    h = (h - p["bn_mean"][:]) * inv * p["bn_w"][:] + p["bn_b"][:]
    return jax.nn.relu(h).reshape(blk, s_out, c_out)


def _make_kernel(treedef, n_frames: int, blk: int):
    def kernel(*refs):
        param_refs = jax.tree.unflatten(treedef, refs[: treedef.num_leaves])
        basis4_ref, norm_w_ref, audio_ref, h0_ref, c0_ref = refs[
            treedef.num_leaves : treedef.num_leaves + 5
        ]
        probs_ref, hn_ref, cn_ref = refs[treedef.num_leaves + 5 :]

        # ---- STFT as ONE MXU matmul on non-overlapping 64-sample blocks ----
        # A frame is 4 consecutive hop-blocks, so spec[f] = sum_j A[f+j] @ B_j
        # where B_j is the basis rows for block j. basis4 [64, 4*258] holds
        # the four B_j side by side: one matmul, then 4 shifted adds — no
        # frame materialization (overlap-stacking crashes the Mosaic backend
        # and wastes 4x VMEM).
        n_blocks = n_frames + 3  # padded samples / HOP
        # audio arrives pre-shaped [BLK, n_blocks, HOP]; merging leading dims
        # is the only reshape Mosaic lowers cheaply (lane-splitting reshapes
        # crash the backend)
        a = audio_ref[:].reshape(blk * n_blocks, HOP)
        pprod = _dot(a, basis4_ref[:]).reshape(blk, n_blocks, 4 * 2 * CUTOFF)
        w2 = 2 * CUTOFF
        spec = (
            pprod[:, 0:n_frames, 0:w2]
            + pprod[:, 1 : n_frames + 1, w2 : 2 * w2]
            + pprod[:, 2 : n_frames + 2, 2 * w2 : 3 * w2]
            + pprod[:, 3 : n_frames + 3, 3 * w2 :]
        )
        real, imag = spec[:, :, :CUTOFF], spec[:, :, CUTOFF:]
        mag = jnp.sqrt(real * real + imag * imag)  # [BLK, F, 129]

        # ---- adaptive audio normalization ----
        # mean_mean = frame-mean of (7-tap smooth of reflect-padded channel
        # means) collapses to ONE weighted sum: norm_w folds the taps, the
        # reflect indexing, and the final 1/F (precomputed on host).
        loge = _log1p_series(mag * 1048576.0)
        mean = jnp.mean(loge, axis=-1)  # over channels -> [BLK, F]
        mean_mean = jnp.sum(mean * norm_w_ref[:], axis=-1)  # [BLK]
        x = loge - mean_mean[:, None, None]  # [BLK, F, 129]

        # ---- encoder: 4 fused transformer layers ----
        for layer_p, stride in zip(param_refs["layers"], V3_STRIDES):
            x = _transformer_layer(x, layer_p, stride)
        # x: [BLK, 7, 64]

        # ---- 2-layer LSTM over the frame axis; decoder accumulated inline ----
        # decoder = relu -> 1x1 conv -> frame mean -> sigmoid; conv is linear
        # so accumulate relu(h_top) across steps and apply the conv once.
        w_l = [param_refs["lstm_w"][layer].T for layer in range(2)]  # [128, 256]
        b_l = [param_refs["lstm_b"][layer] for layer in range(2)]
        hidden = 64
        h = [h0_ref[0], h0_ref[1]]
        c = [c0_ref[0], c0_ref[1]]
        seq = x.shape[1]
        dec_acc = jnp.zeros((blk, hidden), jnp.float32)
        for t in range(seq):
            inp = x[:, t, :]
            for layer in range(2):
                gates = _dot(jnp.concatenate([inp, h[layer]], axis=-1), w_l[layer]) + b_l[layer]
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

        logits = _dot(dec_acc / seq, param_refs["dec_w"][:].T) + param_refs["dec_b"][:]
        probs_ref[:] = jax.nn.sigmoid(logits[:, 1:2])  # keep 2-D for TPU

    return kernel


@functools.partial(jax.jit, static_argnames=("block_streams",))
def forward_fused(
    params: dict,
    audio: jax.Array,
    h: jax.Array,
    c: jax.Array,
    *,
    block_streams: int = 128,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Drop-in fused replacement for models.silero_v31.forward.

    audio: [B, S] raw chunk samples; h, c: [2, B, 64]. B must be a multiple
    of block_streams. Returns (probs [B], hn, cn).
    """
    batch, samples = audio.shape
    blk = min(block_streams, batch)
    if batch % blk:
        raise ValueError(f"batch {batch} not a multiple of block {blk}")
    n_frames = samples // HOP + 1

    padded = jnp.pad(audio, ((0, 0), (PAD, PAD)), mode="reflect")
    n_blocks = padded.shape[1] // HOP
    padded = padded.reshape(batch, n_blocks, HOP)
    leaves, treedef = jax.tree.flatten(params)

    # hop-block STFT basis: basis4[:, j*516+...] = basis rows for block j
    basis_t = params["stft_basis"].T  # [256, 258]
    basis4 = jnp.concatenate(
        [basis_t[j * HOP : (j + 1) * HOP] for j in range(4)], axis=1
    )  # [64, 4*258]

    # adaptive-norm collapsed weights: frame-mean of the 7-tap smoothing of
    # the reflect-padded per-frame means == sum_i norm_w[i] * mean[i]
    import numpy as _np

    norm_w = _np.zeros(n_frames, _np.float32)
    for f in range(n_frames):
        for k, tap in enumerate(ADAPTIVE_NORM_FILTER):
            j = f + k - 3
            if j < 0:
                j = -j
            elif j >= n_frames:
                j = 2 * n_frames - 2 - j
            norm_w[j] += tap
    norm_w = jnp.asarray(norm_w[None, :] / n_frames)  # [1, F]

    grid = (batch // blk,)
    param_specs = [
        pl.BlockSpec(leaf.shape, lambda i, nd=leaf.ndim: (0,) * nd)
        for leaf in leaves
    ]
    probs, hn, cn = pl.pallas_call(
        _make_kernel(treedef, n_frames, blk),
        grid=grid,
        in_specs=param_specs
        + [
            pl.BlockSpec(basis4.shape, lambda i: (0, 0)),
            pl.BlockSpec(norm_w.shape, lambda i: (0, 0)),
            pl.BlockSpec((blk, n_blocks, HOP), lambda i: (i, 0, 0)),
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
    )(*leaves, basis4, norm_w, padded, h, c)
    return probs[:, 0], hn, cn
