"""Silero VAD v5 — pure-JAX forward.

v5 architecture (reference Silero_Vad_5, silero_vad.py:367-433):
  * each chunk is 512 samples prefixed with the previous chunk's last 64
    samples (the "context") -> 576-sample model input;
  * STFT: reflect pad right-only 64, hop 128 (STFT_conv2,
    silero_vad.py:290-313) -> [B, 129, 4] frames;
  * encoder: 4 reparameterized k=3 convs (MobileOneBlock), shapes
    (128,129,3)/s1, (64,128,3)/s2, (64,64,3)/s2, (128,64,3)/s1, each + ReLU
    -> [B, 128, 1];
  * 1-layer LSTM hidden 128;
  * decoder: relu -> conv 128->1 -> sigmoid -> frame mean.

Param schema: `stft_basis`, `enc{1..4}.w` [O, I, 3] / `enc{1..4}.b` [O],
fused `lstm_w` [1, 512, 256] / `lstm_b` [1, 512], `dec_w`/`dec_b`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vadc_tpu.nn import functional as F
from vadc_tpu.models.weights import _canon

SAMPLE_RATE = 16000
CONTEXT_SAMPLES = 64  # reference SILERO_V5_CONTEXT_SIZE (vadc.h:90)
WINDOW_SAMPLES = 512
NUM_LSTM_LAYERS = 1
HIDDEN = 128
STFT_PAD_RIGHT = 64
STFT_HOP = 128

ENCODER_STRIDES = (1, 2, 2, 1)


def silero_v5_params(tensors: dict[str, np.ndarray]) -> dict:
    basis = np.asarray(tensors["forward_basis_buffer"])
    enc = []
    for i in (1, 2, 3, 4):
        enc.append(
            {
                "w": jnp.asarray(tensors[f"enc{i}.weight"], jnp.float32),
                "b": jnp.asarray(tensors[f"enc{i}.bias"], jnp.float32),
            }
        )
    return {
        "stft_basis": jnp.asarray(basis.reshape(basis.shape[0], -1), jnp.float32),
        "encoder": enc,
        "lstm_w": jnp.asarray(tensors["weights"], jnp.float32),
        "lstm_b": jnp.asarray(tensors["biases"], jnp.float32),
        "dec_w": _canon(np.asarray(tensors["decoder_weights"]), "pw"),
        "dec_b": jnp.asarray(tensors["decoder_biases"], jnp.float32),
    }


def init_state(n_streams: int) -> tuple[jax.Array, jax.Array]:
    shape = (NUM_LSTM_LAYERS, n_streams, HIDDEN)
    return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)


def init_context(n_streams: int) -> jax.Array:
    """Zero 64-sample audio context carried between consecutive chunks."""
    return jnp.zeros((n_streams, CONTEXT_SAMPLES), jnp.float32)


def encode(
    params: dict,
    audio: jax.Array,
    *,
    pad_right: int = STFT_PAD_RIGHT,
    hop: int = STFT_HOP,
) -> jax.Array:
    """audio [B, 576] (context + window) -> features [B, frames, 128]
    (channels-last throughout). The 8 kHz branch uses half-rate STFT
    geometry (pad 32, hop 64, n_fft 128)."""
    x = F.stft_magnitude_nlc(
        audio, params["stft_basis"], pad_left=0, pad_right=pad_right, hop=hop,
        log_sensitive=False,  # spectrum feeds convs directly (no log1p)
    )
    # turbo tier: encoder activations bf16-resident (no-op otherwise)
    x = x.astype(F.compute_dtype())
    for p, stride in zip(params["encoder"], ENCODER_STRIDES):
        x = jax.nn.relu(F.conv1d_nlc(x, p["w"], p["b"], stride=stride, padding=1))
    return x


def forward(
    params: dict, audio: jax.Array, h: jax.Array, c: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Independent-stream forward. audio [B, 576]; h, c [1, B, 128]."""
    feats = encode(params, audio)  # [B, T, 128]
    out, hn, cn = F.lstm(feats, h, c, params["lstm_w"], params["lstm_b"])
    return F.decoder_v5_nlc(out, params["dec_w"], params["dec_b"]), hn, cn


def forward_minibatched(
    params: dict, audio: jax.Array, h: jax.Array, c: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Chunks-of-one-stream forward; h, c [1, 1, 128]."""
    feats = encode(params, audio)
    out, hn, cn = F.lstm_minibatched(feats, h, c, params["lstm_w"], params["lstm_b"])
    return F.decoder_v5_nlc(out, params["dec_w"], params["dec_b"]), hn, cn


def attach_context(chunks: jax.Array, context: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Prefix each chunk with the previous chunk's carried tail.

    chunks: [B, window] new audio per stream; context: [B, ctx] carried tail
    (64 samples at 16 kHz, 32 at 8 kHz). Returns (model input
    [B, ctx+window], new context). Reference: process_chunks_v5
    (vadc.c:105-162), chunks_v5_from_raw_int16 (utils.py:277-283).
    """
    inp = jnp.concatenate([context, chunks], axis=-1)
    return inp, chunks[:, -context.shape[-1] :]


class _V58k:
    """Module shim for the 8 kHz branch of the official v5 model
    (`_model_8k`): same 4-reparam-conv + LSTM-128 architecture at half-rate
    STFT geometry — 256-sample chunks with a 32-sample carried context,
    n_fft 128 (65 frequency bins), hop 64, right-only reflect pad 32. The
    reference reaches this branch only through ORT's sr input
    (onnx_helpers.c:314-357); here it is a first-class family."""

    SAMPLE_RATE = 8000
    CONTEXT_SAMPLES = 32
    WINDOW_SAMPLES = 256
    NUM_LSTM_LAYERS = NUM_LSTM_LAYERS
    HIDDEN = HIDDEN
    STFT_PAD_RIGHT = 32
    STFT_HOP = 64

    init_state = staticmethod(init_state)
    silero_v5_params = staticmethod(silero_v5_params)
    attach_context = staticmethod(attach_context)

    @staticmethod
    def init_context(n_streams: int) -> jax.Array:
        return jnp.zeros((n_streams, _V58k.CONTEXT_SAMPLES), jnp.float32)

    @staticmethod
    def encode(params, audio):
        return encode(
            params, audio, pad_right=_V58k.STFT_PAD_RIGHT, hop=_V58k.STFT_HOP
        )

    @staticmethod
    def forward(params, audio, h, c):
        feats = _V58k.encode(params, audio)
        out, hn, cn = F.lstm(feats, h, c, params["lstm_w"], params["lstm_b"])
        return F.decoder_v5_nlc(out, params["dec_w"], params["dec_b"]), hn, cn

    @staticmethod
    def forward_minibatched(params, audio, h, c):
        feats = _V58k.encode(params, audio)
        out, hn, cn = F.lstm_minibatched(
            feats, h, c, params["lstm_w"], params["lstm_b"]
        )
        return F.decoder_v5_nlc(out, params["dec_w"], params["dec_b"]), hn, cn


v5_8k = _V58k()
