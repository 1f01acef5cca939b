"""Silero VAD v3.1 16 kHz — full forward pass in pure JAX.

Pipeline (reference silero_run_one_batch_with_context, silero_v3.c:72-215;
Silero_V3.forward, silero_vad.py:262-272):

    audio [B, S] --reflect pad 128/128, hop 64--> STFT magnitude [B, 129, 25]
    -> adaptive audio normalization
    -> 4 encoder stages (ConvBlock + TransformerBlock + strided 1x1 conv + BN
       + ReLU), conv strides 2,2,1,1  -> [B, 64, 7]
    -> 2-layer LSTM (hidden 64, fused ih|hh weights, pre-summed biases)
    -> decoder: relu -> 1x1 conv 64->2 -> frame mean -> sigmoid
    -> speech probability = channel 1

Two LSTM batch semantics are exposed:
  * `forward` — each batch row is an INDEPENDENT stream with its own (h, c)
    stack [2, B, 64]. This is the TPU-native multi-stream hot path.
  * `forward_minibatched` — the reference driver's semantics: the batch axis
    holds consecutive chunks of ONE stream, flattened through the LSTM so
    state threads chunk-to-chunk ((h, c) are [2, 1, 64]); used for
    golden-parity with the reference CLI (vadc.c:56-103).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vadc_tpu.nn import functional as F
from vadc_tpu.models.weights import V3_STRIDES

SAMPLE_RATE = 16000
CHUNK_SAMPLES_DEFAULT = 1536  # 96 ms; any multiple of 256 in [512, 1536] works
NUM_LSTM_LAYERS = 2
HIDDEN = 64
STFT_PAD = 128
STFT_HOP = 64


def init_state(n_streams: int) -> tuple[jax.Array, jax.Array]:
    """Zero LSTM state for a batch of independent streams: (h, c) [2, B, 64]."""
    shape = (NUM_LSTM_LAYERS, n_streams, HIDDEN)
    return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)


def encode(params: dict, audio: jax.Array) -> jax.Array:
    """Front-end: audio [B, S] -> encoder features [B, 64, S//256 + 1]."""
    from vadc_tpu.tracing import zone

    with zone("stft"):
        spect = F.stft_magnitude(
            audio, params["stft_basis"], pad_left=STFT_PAD, pad_right=STFT_PAD, hop=STFT_HOP
        )
    with zone("adaptive_norm"):
        x = F.adaptive_audio_normalization(spect)
    for i, (layer_params, stride) in enumerate(zip(params["layers"], V3_STRIDES)):
        with zone(f"encoder_layer_{i + 1}"):
            x = F.transformer_layer(x, layer_params, stride=stride)
    return x


def encode_nlc(params: dict, audio: jax.Array) -> jax.Array:
    """Sequence-major front-end: audio [B, S] -> features [B, T, 64].

    Numerically the same pipeline as `encode` but channels-last end-to-end —
    the STFT naturally emits frames-major data and attention/layernorm/LSTM
    want channels-last, so this path has ZERO transposes (the NCL path
    relayouts ~26 MB per step at batch 2048 around every transformer block)."""
    from vadc_tpu.tracing import zone

    with zone("stft"):
        spect = F.stft_magnitude_nlc(
            audio, params["stft_basis"], pad_left=STFT_PAD, pad_right=STFT_PAD, hop=STFT_HOP
        )
    with zone("adaptive_norm"):
        x = F.adaptive_audio_normalization_nlc(spect)
    for i, (layer_params, stride) in enumerate(zip(params["layers"], V3_STRIDES)):
        with zone(f"encoder_layer_{i + 1}"):
            x = F.transformer_layer_nlc(x, layer_params, stride=stride)
    return x


def encode_csb(params: dict, audio: jax.Array) -> jax.Array:
    """Batch-minor front-end: audio [B, S] -> features [64, T, B].

    Layout experiment (kept runnable; NOT the production path): the NLC
    encoder keeps channels (16-64) on the 128-wide lane dim, so every
    activation tile is lane-padded; putting the stream batch minor instead
    makes every encoder tensor dense. Under SUSTAINED load on a v5e chip
    this measures 4% SLOWER than NLC (0.965 vs 0.928 ms/chunk-step at batch
    2048) — XLA's padded-but-batch-major matmul lowering beats the dense
    batch-minor einsums here; short-burst timings that favored this layout
    were chip clock-ramp artifacts. See docs/PERFORMANCE.md."""
    from vadc_tpu.tracing import zone

    with zone("stft"):
        spect = F.stft_magnitude_nlc(
            audio, params["stft_basis"], pad_left=STFT_PAD, pad_right=STFT_PAD, hop=STFT_HOP
        )
    with zone("adaptive_norm"):
        x = F.adaptive_audio_normalization_nlc(spect)
    x = jnp.transpose(x, (2, 1, 0))  # [C, S, B] — one relayout in
    for i, (layer_params, stride) in enumerate(zip(params["layers"], V3_STRIDES)):
        with zone(f"encoder_layer_{i + 1}"):
            x = F.transformer_layer_csb(x, layer_params, stride=stride)
    return x


def forward(
    params: dict, audio: jax.Array, h: jax.Array, c: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched independent-stream forward.

    audio: [B, S]; h, c: [2, B, 64]. Returns (probs [B], hn, cn).
    """
    from vadc_tpu.tracing import zone

    feats = encode_nlc(params, audio)  # [B, T, 64]
    with zone("lstm"):
        out, hn, cn = F.lstm(feats, h, c, params["lstm_w"], params["lstm_b"])
    with zone("decoder"):
        probs = F.decoder_v3_nlc(out, params["dec_w"], params["dec_b"])
    return probs, hn, cn


def forward_pallas(
    params: dict, audio: jax.Array, h: jax.Array, c: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """forward with the encoder+LSTM+decoder fused into ONE Pallas kernel.
    STFT + adaptive norm stay in XLA. Numerics match `forward` at the
    active tier (fast-tier kernel vs fast-tier XLA probs agree to ~2e-4
    on-chip; faithful mode runs all dots at HIGHEST).

    Kernel selection: the 2-D formulation (silero_v31_fused2d, BLK=32,
    1.88 ms/chunk-step at batch 2048). Round 4 briefly selected the 3-D
    kernel on the strength of a 0.094 ms/step figure, which round 5
    re-measurement exposed as a METHODOLOGY ARTIFACT: it came from an
    independent-steps loop passing identical input buffers every call —
    a shape that reads several times fast through the remote-device
    tunnel (round-5 control: XLA fast measures 1.44 ms/step identical-args
    vs 4.86 ms dependent-chain in the same loop). Under the trustworthy
    sustained-scan methodology fused3d measures 5.72-5.76 ms/chunk-step —
    the same ~5.5 ms the round-2/3 matrix always showed (3-D Mosaic
    lowering inefficiency; docs/PERFORMANCE.md "Pallas status"), and the
    cause of BENCH_r04's flagged v3_pallas 1.87 -> 5.77 regression
    (tools/pallas_recheck.py is the experiment).

    Inherits bf16 fast-math from the active functional.fast_math() trace
    context (the runner's fast_math flag). The kernels are written for
    fp32 activations, so the turbo tier's bf16-resident compute dtype is
    narrowed back to the fast tier here (same DEFAULT matmul precision)."""
    from vadc_tpu.kernels.silero_v31_fused2d import forward_fused2d
    from vadc_tpu.nn import functional as F

    fwd = forward_fused2d
    if F.compute_dtype() != jnp.float32:
        with F.precision_mode("fast"):
            return fwd(params, audio, h, c, fast=True)
    return fwd(params, audio, h, c, fast=F._PRECISION != F.HIGHEST)


def forward_minibatched(
    params: dict, audio: jax.Array, h: jax.Array, c: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Reference-parity forward: batch rows are consecutive chunks of ONE
    stream; LSTM state threads through them sequentially.

    audio: [N, S]; h, c: [2, 1, 64]. Returns (probs [N], hn, cn).
    """
    feats = encode_nlc(params, audio)  # [N, T, 64]
    out, hn, cn = F.lstm_minibatched(
        feats, h, c, params["lstm_w"], params["lstm_b"]
    )
    probs = F.decoder_v3_nlc(out, params["dec_w"], params["dec_b"])
    return probs, hn, cn
