"""Silero VAD v4 — pure-JAX forward.

v4 differs from v3.1 (reference Silero_V4, silero_vad.py:191-236):
  * STFT reflect-pads (n_fft - hop)/2 = 96 on both sides (silero_vad.py:13);
  * the first conv block consumes cat([spect, normalized]) — 258 channels;
  * encoder stages have NO transformer blocks (ConvBlock + strided 1x1 conv +
    BatchNorm + ReLU only); at 16 kHz stage 3's conv uses stride 2;
  * the LSTM lives in a decoder dict; the decoder head is 1-logit
    (relu -> conv 64->1 -> sigmoid -> frame mean).

Param schema (produced by vadc_tpu.export): `stft_basis`, four stage groups
`stage{1..4}.*` with the same keys as v3 minus attention/norm/linear, fused
`lstm_w`/`lstm_b`, `dec_w`/`dec_b`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vadc_tpu.nn import functional as F
from vadc_tpu.models.weights import V4_STRIDES_16K, V4_STRIDES_8K, _canon

SAMPLE_RATE = 16000
NUM_LSTM_LAYERS = 2
HIDDEN = 64
STFT_PAD = 96
STFT_HOP = 64

_STAGE_KEYS = {
    "dw_w": ("dw_conv_weights", "dw"),
    "dw_b": ("dw_conv_biases", None),
    "pw_w": ("pw_conv_weights", "pw"),
    "pw_b": ("pw_conv_biases", None),
    "proj_w": ("proj_weights", "pw"),
    "proj_b": ("proj_biases", None),
    "conv_w": ("conv_weights", "pw"),
    "conv_b": ("conv_biases", None),
    "bn_w": ("batch_norm_weights", None),
    "bn_b": ("batch_norm_biases", None),
    "bn_mean": ("batch_norm_running_mean", None),
    "bn_var": ("batch_norm_running_var", None),
}


def silero_v4_params(tensors: dict[str, np.ndarray], sample_rate: int = 16000) -> dict:
    basis = np.asarray(tensors["forward_basis_buffer"])
    stages = []
    for i in (1, 2, 3, 4):
        p: dict = {}
        for out_key, (name, kind) in _STAGE_KEYS.items():
            full = f"stage{i}.{name}"
            if full not in tensors:
                # proj is architecturally absent on stage 3; batch-norm
                # tensors are absent when the exporter folded BN into the
                # 1x1 convs (the official .onnx does this).
                if out_key in ("proj_w", "proj_b") or out_key.startswith("bn_"):
                    continue
                raise KeyError(f"missing weight tensor {full!r}")
            p[out_key] = _canon(np.asarray(tensors[full]), kind)
        stages.append(p)
    return {
        "stft_basis": jnp.asarray(basis.reshape(basis.shape[0], -1), jnp.float32),
        "stages": stages,
        "lstm_w": jnp.asarray(tensors["weights"], jnp.float32),
        "lstm_b": jnp.asarray(tensors["biases"], jnp.float32),
        "dec_w": _canon(np.asarray(tensors["decoder_weights"]), "pw"),
        "dec_b": jnp.asarray(tensors["decoder_biases"], jnp.float32),
    }


def init_state(n_streams: int) -> tuple[jax.Array, jax.Array]:
    shape = (NUM_LSTM_LAYERS, n_streams, HIDDEN)
    return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)


def conv_stage(x: jax.Array, p: dict, *, stride: int) -> jax.Array:
    """v4 encoder stage over [B, L, C]: ConvBlock -> strided 1x1 conv ->
    BatchNorm -> ReLU (a v3 transformer layer minus the transformer block).
    BatchNorm is skipped when absent (folded into the conv at export)."""
    h = F.conv_block_nlc(
        x, p["dw_w"], p["dw_b"], p["pw_w"], p["pw_b"], p.get("proj_w"), p.get("proj_b")
    )
    if stride != 1:
        h = h[:, ::stride, :]
    h = F.linear(h, p["conv_w"], p["conv_b"])
    if "bn_w" in p:
        h = F.batch_norm1d_nlc(h, p["bn_mean"], p["bn_var"], p["bn_w"], p["bn_b"])
    return jax.nn.relu(h)


def encode(params: dict, audio: jax.Array, *, sample_rate: int = 16000) -> jax.Array:
    """audio [B, S] -> features [B, T, 64] (channels-last throughout).
    sample_rate selects the encoder strides and must be static under jit
    (the official model's 16 kHz branch strides stage 3 by 2)."""
    spect = F.stft_magnitude_nlc(
        audio, params["stft_basis"], pad_left=STFT_PAD, pad_right=STFT_PAD, hop=STFT_HOP
    )
    normalized = F.adaptive_audio_normalization_nlc(spect)  # compute dtype
    x = jnp.concatenate(
        [spect.astype(F.compute_dtype()), normalized], axis=-1
    )  # [B, F, 258]
    strides = V4_STRIDES_16K if sample_rate == 16000 else V4_STRIDES_8K
    for stage_params, stride in zip(params["stages"], strides):
        x = conv_stage(x, stage_params, stride=stride)
    return x


def forward(
    params: dict, audio: jax.Array, h: jax.Array, c: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Independent-stream forward. audio [B, S]; h, c [2, B, 64] -> probs [B]."""
    feats = encode(params, audio)  # [B, T, 64]
    out, hn, cn = F.lstm(feats, h, c, params["lstm_w"], params["lstm_b"])
    return F.decoder_v5_nlc(out, params["dec_w"], params["dec_b"]), hn, cn


def forward_minibatched(
    params: dict, audio: jax.Array, h: jax.Array, c: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Chunks-of-one-stream forward; h, c [2, 1, 64]."""
    feats = encode(params, audio)
    out, hn, cn = F.lstm_minibatched(feats, h, c, params["lstm_w"], params["lstm_b"])
    return F.decoder_v5_nlc(out, params["dec_w"], params["dec_b"]), hn, cn


class _V48k:
    """Module shim for the 8 kHz branch of the official v4 model (stage-3
    conv stride 1 instead of 2; chunk sizes are in 8 kHz samples)."""

    SAMPLE_RATE = 8000
    NUM_LSTM_LAYERS = NUM_LSTM_LAYERS
    HIDDEN = HIDDEN
    init_state = staticmethod(init_state)

    @staticmethod
    def encode(params, audio):
        # the chunk-blocked scan (engine/runner._scan_tblock) resolves
        # `module.encode`; without this the 8 kHz branch would fall back
        # to the module-level encode's 16 kHz stage-3 stride
        return encode(params, audio, sample_rate=8000)

    @staticmethod
    def forward(params, audio, h, c):
        feats = encode(params, audio, sample_rate=8000)
        out, hn, cn = F.lstm(feats, h, c, params["lstm_w"], params["lstm_b"])
        return F.decoder_v5_nlc(out, params["dec_w"], params["dec_b"]), hn, cn

    @staticmethod
    def forward_minibatched(params, audio, h, c):
        feats = encode(params, audio, sample_rate=8000)
        out, hn, cn = F.lstm_minibatched(feats, h, c, params["lstm_w"], params["lstm_b"])
        return F.decoder_v5_nlc(out, params["dec_w"], params["dec_b"]), hn, cn


v4_8k = _V48k()
