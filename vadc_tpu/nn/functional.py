"""Pure-JAX NN ops for the Silero VAD model families.

These are the correctness oracles for the whole framework: every op matches
the reference semantics (cited per-function) and is validated against the
reference's golden `.testtensor` fixtures at fp32. Pallas TPU kernels in
`vadc_tpu.kernels` fuse hot combinations of these; this module stays the
plain-XLA reference path.

Conventions:
  * activations are NCL — [batch, channels, length] — except where noted,
    matching the reference layout so golden fixtures apply directly;
  * all contractions run at `lax.Precision.HIGHEST` (full fp32 on the MXU)
    because the fidelity contract is max-abs-error against fp32 references
    (reference test.c:148-168 uses atol-only comparison);
  * everything here is functional and jit/vmap/scan-safe: no data-dependent
    Python control flow, static shapes only.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp
from jax import lax

HIGHEST = lax.Precision.HIGHEST

# Module-wide matmul precision. HIGHEST = full fp32 on the MXU (the fidelity
# contract); DEFAULT = bf16 multiplies with fp32 accumulation (~2-6x MXU
# throughput, probabilities deviate at the ~1e-2 level). Switched by
# fast_math(); read at TRACE time, so callers must trace separate jit
# programs per mode (StreamRunner(fast_math=True) does).
_PRECISION = HIGHEST

# Module-wide activation-storage dtype for the encoder. fp32 by default; the
# 'turbo' tier stores encoder activations (and encoder weights at the point
# of use) in bfloat16, halving HBM traffic on a step that is bandwidth- and
# op-count-bound, NOT FLOP-bound (docs/PERFORMANCE.md). Reductions that are
# numerically delicate (softmax, layer-norm statistics) still accumulate in
# fp32 inside their fusions; only what is READ and WRITTEN to HBM shrinks.
_COMPUTE_DTYPE = jnp.float32

# Exact-fp32 LSTM gate accumulation: compute the [B,4H] = [B,2H]x[2H,4H]
# gate matmul as a VPU broadcast-reduce instead of on the MXU. At HIGHEST
# the MXU runs fp32 as a multi-pass bf16-product composition whose
# accumulation order differs from scalar C; the VPU form is true fp32 FMAs.
# Fidelity experiment (r3, see docs/PERFORMANCE.md): closes the per-op
# LSTM error vs the reference fixture on-chip. Off by default — the 128-256
# wide contraction on the VPU costs far more than the MXU at production
# batch; flip on for fidelity-critical verification runs.
LSTM_VPU_GATES = False

# fp32-accumulate the attention chain's two reductions. Only the TURBO tier
# actually changes (bf16-resident activations; the other tiers' operands are
# already fp32, measured bit-identical). R3 on-chip A/B at batch 2048:
# turbo 0.481 ms with vs 0.505 without (no cost — the reduce's accumulator
# never leaves registers), deviation vs faithful 1.39e-3 vs 1.45e-3 on the
# probe input. The r2 advisor flagged the bf16 25-32-term sums as the
# tier's tightest numerical spot; this closes it for free.
ATTN_SUM_FP32_ACCUM = True

# Use the VPU broadcast-multiply-reduce attention chain at HIGHEST precision
# too (r2 measured it a 1.43x whole-model win for the bf16 tiers; r3
# measures the fp32 crossover — see docs/PERFORMANCE.md). Read at trace
# time, like _PRECISION.
VPU_ATTENTION_AT_HIGHEST = True


#: matmul precision tiers (TPU v5e, batch 2048, sustained steady-state —
#: current measurements in docs/PERFORMANCE.md's headline table):
#:   faithful — fp32 (6-pass) matmuls; the golden-fidelity contract.
#:              ~1.25 ms/chunk-step (r3: VPU attention runs here too).
#:   balanced — bf16_3x matmuls: ~0.83 ms at ~2e-5 max probability
#:              deviation vs faithful — still inside the reference's
#:              1e-4 per-op tier.
#:   fast     — single-pass bf16 matmuls EXCEPT the v3/v4 STFT, which runs
#:              at HIGH because the adaptive norm's log1p amplifies the
#:              bf16 spectral noise floor on real speech material (see
#:              _stft_precision): ~0.68 ms at ≤~0.02 max probability
#:              deviation on speechlike input (~4e-4 on broadband probes).
#:   turbo    — single-pass bf16 throughout + bf16-RESIDENT encoder
#:              activations (the LSTM, decoder, adaptive norm, and all
#:              recurrent state stay fp32). Max throughput (~0.47 ms);
#:              probability deviation up to ~0.04 on speechlike input,
#:              decision-compatible with the 0.5/0.35 hysteresis
#:              (tools/accuracy_eval.py scores every tier identically at
#:              the segment level).
PRECISION_MODES = {
    "faithful": (lax.Precision.HIGHEST, jnp.float32),
    "balanced": (lax.Precision.HIGH, jnp.float32),
    "fast": (lax.Precision.DEFAULT, jnp.float32),
    "turbo": (lax.Precision.DEFAULT, jnp.bfloat16),
}


@contextlib.contextmanager
def precision_mode(mode: str):
    """Trace enclosed model code at a named matmul-precision tier."""
    global _PRECISION, _COMPUTE_DTYPE
    prev = (_PRECISION, _COMPUTE_DTYPE)
    _PRECISION, _COMPUTE_DTYPE = PRECISION_MODES[mode]
    try:
        yield
    finally:
        _PRECISION, _COMPUTE_DTYPE = prev


def compute_dtype():
    """Activation-storage dtype of the active precision tier."""
    return _COMPUTE_DTYPE


def fast_math():
    """Trace enclosed model code with bf16 matmuls (fp32 accumulation)."""
    return precision_mode("fast")

# 7-tap smoothing filter of AdaptiveAudioNormalization. The reference embeds
# these constants directly (reference misc.c:5-13); they come from the Silero
# v3 jit checkpoint's `adaptive_normalization.filter_` buffer.
ADAPTIVE_NORM_FILTER = (
    0.03663284704089164733887,
    0.11128076165914535522461,
    0.21674531698226928710938,
    0.27068215608596801757812,
    0.21674531698226928710938,
    0.11128076165914535522461,
    0.03663284704089164733887,
)

LAYER_NORM_EPS = 1e-5
BATCH_NORM_EPS = 1e-5


def linear(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """`x @ w.T + b` with PyTorch weight convention w: [out, in].

    Reference: tensor_linear, tensor.h:675-723.
    """
    y = jnp.matmul(x, w.astype(x.dtype).T, precision=_PRECISION)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def reflect_pad_last(x: jax.Array, left: int, right: int) -> jax.Array:
    """Reflect-pad the last dim (edge excluded, PyTorch 'reflect' semantics).

    Reference: tensor_reflect_pad_last_dim_lr, tensor.h:912-958.
    """
    pad = [(0, 0)] * (x.ndim - 1) + [(left, right)]
    return jnp.pad(x, pad, mode="reflect")


def _stft_precision(log_sensitive: bool):
    """(matmul precision, cast-operands-to-bf16) for the STFT of the active
    tier.

    Single-pass bf16 puts a broadband rounding floor ~-48 dB under the
    spectrum. Harmless where the spectrum feeds convs directly (v5), but
    v3/v4's adaptive normalization applies log1p(2^20 * mag), whose slope at
    near-zero bins turns that floor into O(1) FEATURE errors on any material
    with deep spectral nulls between harmonics — i.e. on speech, the thing a
    VAD runs on (white-noise probes never expose it; measured on-chip with
    synthaudio speech: max probability deviation 0.041 vs faithful at a
    -60 dB acoustic noise floor, 0.79 on pure harmonics). Splitting either
    operand alone does not help (measured: the hi*lo cross terms carry the
    correction), so the 'fast' tier runs this one einsum at HIGH (bf16_3x)
    with fp32 operands: deviation halves to 0.020 / 0.29, costing
    ~0.48->0.68 ms/chunk-step at batch 2048. 'turbo' keeps the single-pass
    bf16 STFT: it IS the documented max-throughput tier, decisions stay
    hysteresis-compatible (accuracy_eval), and the deviation is recorded in
    docs/PERFORMANCE.md."""
    if _PRECISION != lax.Precision.DEFAULT:
        return _PRECISION, False
    if not log_sensitive or _COMPUTE_DTYPE == jnp.bfloat16:
        return _PRECISION, True
    return lax.Precision.HIGH, False


# Fused spectrum-dot+magnitude Pallas kernel on the bf16 STFT paths:
# None = auto (on when the runtime backend is a TPU, off on CPU where
# Mosaic kernels cannot compile), True/False = forced. Measured on-chip in
# round 4 (docs/PERFORMANCE.md); tools/tpu_check.py asserts its parity.
STFT_DOTMAG_PALLAS: bool | None = False


def _backend_is_tpu() -> bool:
    # Deliberately an allowlist, not "!= cpu": the Mosaic kernel is only
    # validated on the TPU toolchain, so gpu/rocm/metal backends must take
    # the einsum fallback. "axon" is the remote-TPU tunnel backend this
    # repo actually runs on (same set tools/tpu_check.py accepts). Not
    # cached — backends can initialize after an early CPU-context call,
    # and the check is two attribute reads.
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _stft_dotmag_enabled() -> bool:
    if STFT_DOTMAG_PALLAS is None:
        return _backend_is_tpu()
    return STFT_DOTMAG_PALLAS


def stft_magnitude(
    audio: jax.Array,
    basis: jax.Array,
    *,
    pad_left: int,
    pad_right: int,
    hop: int,
    log_sensitive: bool = True,
) -> jax.Array:
    """Short-time Fourier magnitude via a Fourier-basis conv1d.

    audio: [B, samples]; basis: [n_fft+2, n_fft] precomputed windowed Fourier
    filters (real filters then imaginary, split at cutoff = n_fft//2 + 1).
    Returns [B, cutoff, frames].

    v3/v4 reflect-pad symmetrically, v5 pads right-only (reference stft.c:15-224,
    silero_vad.py:21-46 and 290-313). Implemented as frame extraction + one MXU
    matmul: frames [B, F, n_fft] x basis.T [n_fft, n_fft+2], which keeps the
    FLOPs in a single large jnp.dot instead of a skinny conv.
    """
    n_filters, n_fft = basis.shape
    cutoff = n_fft // 2 + 1
    precision, cast_bf16 = _stft_precision(log_sensitive)
    if cast_bf16:
        # see stft_magnitude_nlc: identical on TPU (MXU rounds DEFAULT
        # operands to bf16 anyway), halves the framing traffic
        audio = audio.astype(jnp.bfloat16)
        basis = basis.astype(jnp.bfloat16)
    padded = reflect_pad_last(audio, pad_left, pad_right)
    frames = _frame(padded, n_fft, hop)  # [B, F, n_fft]
    spec = jnp.einsum(
        "bfn,cn->bcf",
        frames,
        basis,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    real = spec[:, :cutoff, :]
    imag = spec[:, cutoff:, :]
    return jnp.sqrt(real * real + imag * imag)


def _frame(x: jax.Array, frame_len: int, hop: int) -> jax.Array:
    """Extract overlapping frames from [B, L] -> [B, F, frame_len]."""
    batch, length = x.shape
    num_frames = (length - frame_len) // hop + 1
    starts = jnp.arange(num_frames) * hop
    idx = starts[:, None] + jnp.arange(frame_len)[None, :]
    return x[:, idx]




def accurate_log1p(y: jax.Array) -> jax.Array:
    """fp32 log1p to ~1 ulp for y >= 0 (XLA's builtin log is only ~6e-6 rel).

    Classic fdlibm construction, all VPU-friendly ops (works inside Pallas):
    z = 1+y split into 2^e * m with m in [sqrt(1/2), sqrt(2)); log(m) via the
    atanh series in t = (m-1)/(m+1); ln2 applied as a hi/lo two-constant sum.
    Needed because the adaptive-normalization contract is max-abs-error <=1e-4
    against fp64-accurate references over log values up to ~18.
    """
    z = 1.0 + y
    bits = lax.bitcast_convert_type(z, jnp.int32)
    e = (bits >> 23) - 127
    m = lax.bitcast_convert_type(
        (bits & jnp.int32(0x007FFFFF)) | jnp.int32(0x3F800000), jnp.float32
    )
    # renormalize m into [sqrt(1/2), sqrt(2)) so |t| <= 0.1716
    big = m > 1.4142135
    m = jnp.where(big, m * 0.5, m)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    # 2*atanh(t) = 2t(1 + t^2/3 + t^4/5 + t^6/7 + t^8/9 + t^10/11)
    poly = 1.0 + t2 * (
        1.0 / 3.0 + t2 * (0.2 + t2 * (1.0 / 7.0 + t2 * (1.0 / 9.0 + t2 * (1.0 / 11.0))))
    )
    log_m = 2.0 * t * poly
    ln2_hi = jnp.float32(0.693359375)  # exact in fp32
    ln2_lo = jnp.float32(-2.12194440e-4)
    return e * ln2_hi + (log_m + e * ln2_lo)


def accurate_tanh(x: jax.Array) -> jax.Array:
    """fp32 tanh to ~2e-6 abs (measured on a v5e over [-9, 9]; the
    hardware/XLA builtin tanh approximation measures 4.4e-5 abs there —
    three decades above the 3e-8 f32 rounding floor, and the dominant term
    of the faithful-tier LSTM's accumulated error: the r3 diagnosis showed
    gate matmuls at 2.1e-6 and sigmoid at 6.9e-7, ruling both out).

    Symmetric exp form: tanh(x) = sign(x) * (1 - e) / (1 + e) with
    e = exp(-2|x|); accuracy is bounded by exp's ~3.7e-6 relative error.
    All VPU-friendly ops (works inside Pallas kernels too)."""
    a = jnp.abs(x)
    e = jnp.exp(-2.0 * a)
    return jnp.sign(x) * (1.0 - e) / (1.0 + e)


def _tanh(x: jax.Array) -> jax.Array:
    """Precision-selected tanh: the exp-based ~2e-6 form for the faithful
    AND balanced tiers (balanced's bf16_3x matmuls deviate only ~2e-5, so
    the builtin tanh's 4.4e-5 would be its weakest link); the builtin
    (slightly cheaper) in the bf16 fast/turbo tiers, where matmul rounding
    already dominates."""
    return jnp.tanh(x) if _PRECISION == lax.Precision.DEFAULT else accurate_tanh(x)


def _log1p(y: jax.Array) -> jax.Array:
    """Precision-selected log1p: the 1-ulp fdlibm construction under the
    fidelity contract; XLA's builtin (~6e-6 rel, ~2x cheaper on the VPU —
    the adaptive-norm log1p is VPU-bound at ~50 us/step at batch 2048) in
    fast-math mode, where matmul rounding already dominates."""
    return accurate_log1p(y) if _PRECISION == HIGHEST else jnp.log1p(y)


def adaptive_audio_normalization(spect: jax.Array) -> jax.Array:
    """log1p-rescale then subtract a smoothed per-batch mean loudness scalar.

    spect: [B, C, F]. Matches AdaptiveAudioNormalization (reference misc.c:1-124,
    silero_vad.py:49-64): spect_e = log1p(spect * 2**20); per-frame mean over
    channels; reflect-pad 3 and smooth with the fixed 7-tap filter; mean over
    frames; subtract that scalar from the whole spectrogram.
    """
    spect_e = _log1p(spect * 1048576.0)
    mean = jnp.mean(spect_e, axis=1, keepdims=True)  # [B, 1, F]
    mean_padded = reflect_pad_last(mean, 3, 3)
    taps = jnp.asarray(ADAPTIVE_NORM_FILTER, dtype=spect.dtype)
    # precision matters: a bare `@` contracts at the backend DEFAULT,
    # which on TPU rounds fp32 operands to bf16 — spect_e reaches ~18, so
    # the smoothed means (and the global mean_mean shift they feed) would
    # pick up O(1e-2) error, breaching the faithful tier's 1e-4 contract
    smoothed = jnp.matmul(
        _frame(mean_padded[:, 0, :], 7, 1), taps, precision=_PRECISION
    )  # [B, F]
    mean_mean = jnp.mean(smoothed, axis=-1)[:, None, None]  # [B, 1, 1]
    return spect_e - mean_mean


def depthwise_conv5(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Depthwise conv1d, kernel 5, zero-pad 2, stride 1.

    x: [B, C, L]; w: [C, 5]; b: [C]. Reference: dw_conv_tensor /
    convolve_k5_pad2, conv.c:17-113 (PyTorch cross-correlation semantics).
    Expressed as a sum of 5 shifted scales — pure VPU work that XLA fuses into
    a handful of elementwise ops, cheaper than a grouped-conv lowering for
    kernel width 5.
    """
    xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2)))
    length = x.shape[-1]
    y = jnp.zeros_like(x)
    for k in range(5):
        y = y + xp[:, :, k : k + length] * w[None, :, k, None]
    return y + b[None, :, None]


def pointwise_conv(x: jax.Array, w: jax.Array, b: jax.Array | None, stride: int = 1) -> jax.Array:
    """Kernel-1 conv1d = channel matmul (optionally strided).

    x: [B, C, L]; w: [O, C]; b: [O]. Reference: conv_tensor kernel-1 fast path,
    conv.c:532-589.
    """
    if stride != 1:
        x = x[:, :, ::stride]
    y = jnp.einsum("oc,bcl->bol", w, x, precision=_PRECISION)
    if b is not None:
        y = y + b[None, :, None]
    return y


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None,
    *,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jax.Array:
    """General NCL conv1d (cross-correlation, PyTorch convention).

    x: [B, C, L]; w: [O, C/groups, K]; b: [O]. Reference: conv_tensor,
    conv.c:115-712.
    """
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=_PRECISION,
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def conv_block(
    x: jax.Array,
    dw_w: jax.Array,
    dw_b: jax.Array,
    pw_w: jax.Array,
    pw_b: jax.Array,
    proj_w: jax.Array | None,
    proj_b: jax.Array | None,
) -> jax.Array:
    """relu(pw_conv(relu(dw_conv(x))) + proj(x)).

    proj is a pointwise channel projection when in/out channel counts differ,
    identity otherwise. Reference: conv_block, conv.c:761-814; ConvBlock,
    silero_vad.py:66-89.
    """
    h = jax.nn.relu(depthwise_conv5(x, dw_w, dw_b))
    h = pointwise_conv(h, pw_w, pw_b)
    if proj_w is not None:
        h = h + pointwise_conv(x, proj_w, proj_b)
    else:
        h = h + x
    return jax.nn.relu(h)


def layer_norm(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """LayerNorm over the last dim, eps 1e-5, biased variance.

    Reference: layer_norm, misc.c:143-210.
    """
    xf = x.astype(jnp.float32)  # stats in fp32 (no-op outside turbo)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = lax.rsqrt(var + LAYER_NORM_EPS)
    return ((xf - mean) * inv * w + b).astype(x.dtype)


def batch_norm1d(
    x: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    w: jax.Array,
    b: jax.Array,
) -> jax.Array:
    """Inference BatchNorm1d over channel dim of [B, C, L], eps 1e-5.

    Reference: batch_norm1d, misc.c:221-258.
    """
    inv = lax.rsqrt(running_var + BATCH_NORM_EPS)
    scale = (w * inv)[None, :, None]
    shift = (b - running_mean * w * inv)[None, :, None]
    return x * scale + shift


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically-stable softmax with fp32 statistics — THE softmax
    `attention` applies to its score tensors (both formulations).

    Max-subtract form, matching softmax_inplace_stable (reference
    tensor.h:751-784; golden fixture from test.c:900). Statistics always
    run in fp32 even when scores arrive bf16-resident (turbo tier);
    returns fp32 — callers cast back to their residency dtype.
    """
    return jax.nn.softmax(x.astype(jnp.float32), axis=axis)


def attention(
    x: jax.Array,
    qkv_w: jax.Array,
    qkv_b: jax.Array,
    proj_w: jax.Array,
    proj_b: jax.Array,
    *,
    n_heads: int = 2,
) -> jax.Array:
    """Silero's 2-head self-attention — with its idiosyncratic k.q^T order.

    x: [B, S, D]. alpha = softmax(k @ q^T / sqrt(head_dim)); out = alpha @ v.
    Note the score matrix is k-major (NOT the usual q-major): this matches
    MultiHeadAttention.forward (silero_vad.py:102-124) and dual_head_attention
    (reference transformer.c:13-153) exactly, and is not equivalent to the
    standard orientation because softmax normalizes over the q axis.
    """
    bsz, seq, dim = x.shape
    head_dim = dim // n_heads
    if _PRECISION == HIGHEST and not VPU_ATTENTION_AT_HIGHEST:
        # fp32 matmul path (the pre-r3 faithful default; kept selectable for
        # A/B and as the layout reference). The batched-head form benches
        # best among the matmul formulations (2.49 vs 2.68 ms per
        # chunk-step at batch 2048 full-model).
        qkv = linear(x, qkv_w, qkv_b)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(bsz, seq, n_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scores = jnp.einsum("bhsd,bhtd->bhst", k, q, precision=_PRECISION)
        alpha = softmax(scores / jnp.sqrt(jnp.float32(head_dim)), axis=-1)
        out = jnp.einsum("bhst,bhtd->bhsd", alpha, v, precision=_PRECISION)
        out = out.transpose(0, 2, 1, 3).reshape(bsz, seq, dim)
        return linear(out, proj_w, proj_b)
    # Fast path: ONE fused QKV matmul, then the whole score/softmax/weighted-
    # sum chain as broadcast-multiply-REDUCE fusions on the VPU — the head
    # dim is only 8-32, far under the 128x128 MXU tile, so expressing
    # scores = k.q^T and out = alpha.v as dots forces tiny padded matmul
    # kernels AND materializes the lane-padded [B, S, S] score matrices in
    # HBM between them. As elementwise reductions XLA fuses qkv-slicing,
    # scores, softmax, and the weighted sum into a couple of fusions that
    # never materialize the score tensor. Measured on a v5e at batch 2048
    # (sustained, whole model): 547 us/chunk-step vs 784 us for the
    # row-split per-head matmul formulation — a 1.43x whole-model win.
    # Head layout: qkv columns are [q_h0|q_h1|k_h0|k_h1|v_h0|v_h1], so the
    # [B, S, H, hd] reshape is exactly the per-head row-split of qkv_w, and
    # flattening the head outputs back to [B, S, D] matches the projection
    # weight's column order. Softmax statistics run in fp32 even when
    # activations are bf16-resident (turbo); the casts are no-ops in fast
    # mode. NOTE the [B, S, T, H, hd] broadcast below is ~1.3 GB at batch
    # 2048 BEFORE reduction; correctness of the memory footprint relies on
    # XLA fusing the broadcast into the reduce (holds on current
    # toolchains). If a future backend change makes this path OOM or slow,
    # lost fusion here is the first suspect — the matmul formulation above
    # (VPU_ATTENTION_AT_HIGHEST=False) is the fallback. (Also measured, all SLOWER: VPU-reducing the pointwise/FF/conv
    # linears — 2-6x worse, the crossover is attention-only; the bilinear
    # folded form +110 us; 4-D batched-head dots +130 us. docs/PERFORMANCE.md.)
    scale = jnp.sqrt(jnp.float32(head_dim))
    qkv = linear(x, qkv_w, qkv_b)  # [B, S, 3D]
    qh = qkv[..., 0 * dim : 1 * dim].reshape(bsz, seq, n_heads, head_dim)
    kh = qkv[..., 1 * dim : 2 * dim].reshape(bsz, seq, n_heads, head_dim)
    vh = qkv[..., 2 * dim : 3 * dim].reshape(bsz, seq, n_heads, head_dim)
    # scores[b,s,t,h] = sum_d k[b,s,h,d] q[b,t,h,d]  (k-major, softmax over q)
    acc = jnp.float32 if ATTN_SUM_FP32_ACCUM else None
    scores = jnp.sum(kh[:, :, None] * qh[:, None], axis=-1, dtype=acc)  # [B, S, T, H]
    alpha = softmax(scores / scale, axis=2).astype(x.dtype)
    head_out = jnp.sum(alpha[..., None] * vh[:, None], axis=2, dtype=acc)  # [B, S, H, hd]
    # keep the tier's residency dtype downstream (no-op unless accum differs)
    head_out = head_out.astype(x.dtype)
    return linear(head_out.reshape(bsz, seq, dim), proj_w, proj_b)


def transformer_block(x: jax.Array, p: dict) -> jax.Array:
    """Post-norm transformer block over [B, C, S] (permutes to seq-major inside).

    x -> x + attn(x) -> LN1 -> x + linear2(relu(linear1(x))) -> LN2.
    Reference: transformer_block, transformer.c:160-234; TransformerLayer.forward,
    silero_vad.py:141-155 (dropouts are inference no-ops).
    """
    h = x.transpose(0, 2, 1)  # [B, S, C]
    h = h + attention(
        h, p["qkv_w"], p["qkv_b"], p["att_proj_w"], p["att_proj_b"]
    )
    h = layer_norm(h, p["norm1_w"], p["norm1_b"])
    ff = linear(jax.nn.relu(linear(h, p["lin1_w"], p["lin1_b"])), p["lin2_w"], p["lin2_b"])
    h = layer_norm(h + ff, p["norm2_w"], p["norm2_b"])
    return h.transpose(0, 2, 1)


def transformer_layer(x: jax.Array, p: dict, *, stride: int) -> jax.Array:
    """One encoder stage: ConvBlock -> TransformerBlock -> strided 1x1 conv ->
    BatchNorm -> ReLU.

    Reference: transformer_layer, transformer.c:237-295 (the reference's
    regrouping of the PyTorch encoder stages, silero_vad.py:157-189).
    """
    h = conv_block(
        x, p["dw_w"], p["dw_b"], p["pw_w"], p["pw_b"], p.get("proj_w"), p.get("proj_b")
    )
    h = transformer_block(h, p)
    h = pointwise_conv(h, p["conv_w"], p["conv_b"], stride=stride)
    if "bn_w" in p:  # absent when the exporter folded BN into the conv
        h = batch_norm1d(h, p["bn_mean"], p["bn_var"], p["bn_w"], p["bn_b"])
    return jax.nn.relu(h)


def lstm_cell(
    x: jax.Array,
    h: jax.Array,
    c: jax.Array,
    w: jax.Array,
    b: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One LSTM step. x,h,c: [B, H]; w: [4H, 2H] (fused ih|hh); b: [4H]
    (pre-summed ih+hh). Gate order i,f,g,o (PyTorch).

    Reference: lstm_cell, lstm.c:31-95; bias fusion utils.py:93-107.
    """
    xh = jnp.concatenate([x, h], axis=-1)
    if LSTM_VPU_GATES and _PRECISION == HIGHEST:
        # true-fp32 FMA order (see LSTM_VPU_GATES above)
        gates = jnp.sum(xh[:, None, :] * w[None, :, :], axis=-1) + b
    else:
        gates = jnp.matmul(xh, w.T, precision=_PRECISION) + b
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * _tanh(g)
    h_new = jax.nn.sigmoid(o) * _tanh(c_new)
    return h_new, c_new


def lstm(
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    w: jax.Array,
    b: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Multi-layer LSTM over a sequence, batched.

    x: [B, T, H]; h0, c0: [L, B, H]; w: [L, 4H, 2H]; b: [L, 4H].
    Returns (output [B, T, H] from the top layer, hn [L, B, H], cn [L, B, H]).

    lax.scan over time with the (h, c) stack as carry — the TPU-native shape
    of the reference's double-buffered sequential loop (lstm_seq,
    lstm.c:156-218). All layers advance within one scan step (layer loop is
    unrolled; layer count is 1 or 2 in every Silero variant).
    """
    num_layers = w.shape[0]

    def step(carry, x_t):
        hs, cs = carry
        new_h, new_c = [], []
        inp = x_t
        for layer in range(num_layers):
            h_l, c_l = lstm_cell(inp, hs[layer], cs[layer], w[layer], b[layer])
            new_h.append(h_l)
            new_c.append(c_l)
            inp = h_l
        return (jnp.stack(new_h), jnp.stack(new_c)), inp

    (hn, cn), out = lax.scan(step, (h0, c0), x.transpose(1, 0, 2))
    return out.transpose(1, 0, 2), hn, cn


def lstm_minibatched(
    x: jax.Array,
    h0: jax.Array,
    c0: jax.Array,
    w: jax.Array,
    b: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Reference 'minibatched' LSTM: chunks of ONE stream flattened to a single
    long sequence so recurrent state threads chunk-to-chunk.

    x: [N_chunks, T, H]; h0, c0: [L, 1, H]. The chunk axis is NOT an
    independent batch (reference lstm.c:228-341, silero_vad.py:231-236).
    """
    n, t, feat = x.shape
    out, hn, cn = lstm(x.reshape(1, n * t, feat), h0, c0, w, b)
    return out.reshape(n, t, feat), hn, cn


# ---------------------------------------------------------------------------
# NLC (sequence-major, [batch, length, channels]) variants.
#
# The NCL ops above mirror the reference layout so golden fixtures apply
# directly; the production forward uses these NLC twins instead, which
# eliminate every transpose in the pipeline (the STFT naturally produces
# frames-major data, attention/layernorm/LSTM all want channels-last, and
# channels-last is the TPU lane dimension). Each is numerically the same
# computation — only the layout differs.
# ---------------------------------------------------------------------------


def stft_magnitude_nlc(
    audio: jax.Array, basis: jax.Array, *, pad_left: int, pad_right: int,
    hop: int, log_sensitive: bool = True
) -> jax.Array:
    """STFT magnitude, frames-major: [B, F, cutoff].

    Frame extraction + one MXU matmul. (A gather-free hop-block matmul
    decomposition was tried and benchmarked SLOWER under XLA here — the
    64-deep contraction and shifted-slice intermediates cost more than the
    frame gather; the hop-block form only wins inside the fused Pallas
    kernel where frames would otherwise be materialized in VMEM.)"""
    n_filters, n_fft = basis.shape
    cutoff = n_fft // 2 + 1
    precision, cast_bf16 = _stft_precision(log_sensitive)
    if cast_bf16:
        # On TPU, DEFAULT-precision matmuls round their operands to bf16 on
        # the MXU anyway, so casting the audio BEFORE pad/frame is
        # numerically IDENTICAL there (measured bit-equal probabilities) and
        # halves the framing's HBM traffic: -21 us/chunk-step at batch 2048.
        # On backends whose DEFAULT matmul is full fp32 (CPU) this cast DOES
        # introduce bf16 input rounding — accepted: it keeps tier numerics
        # identical across backends (and lets CPU tests reproduce the
        # log-amplification effect _stft_precision documents). The spectrum
        # itself stays fp32 (preferred_element_type) — a bf16 spectrum
        # measured SLOWER (downstream fp32 magnitude upcasts).
        audio = audio.astype(jnp.bfloat16)
        basis = basis.astype(jnp.bfloat16)
    padded = reflect_pad_last(audio, pad_left, pad_right)
    length = padded.shape[-1]
    if n_fft % hop == 0 and length % hop == 0:
        # Gather-free framing: view the padded audio as hop-sized blocks;
        # frame f is blocks[f : f + n_fft/hop] flattened, so n_fft/hop
        # shifted slices + one concat produce all frames with no gather
        # relayout. Bit-identical to the gather; measured -18 us/chunk-step
        # at batch 2048 under sustained load (the r1 burst-timing rejection
        # of this variant was measurement noise). Every Silero family
        # satisfies the divisibility (pads are hop multiples).
        blocks = padded.reshape(padded.shape[0], length // hop, hop)
        n_frames = (length - n_fft) // hop + 1
        frames = jnp.concatenate(
            [blocks[:, i : i + n_frames] for i in range(n_fft // hop)],
            axis=-1,
        )  # [B, F, n_fft]
    else:
        frames = _frame(padded, n_fft, hop)  # [B, F, n_fft]
    if _stft_dotmag_enabled() and cast_bf16 and n_fft % 128 == 0:
        # Fused dot+magnitude Pallas kernel: the spectrum never reaches HBM
        # (removes the step's #1 intermediate, the fp32 [B, F, 2*cutoff]
        # dot output — 50 MB written + re-read at batch 2048; r4 HLO
        # accounting in docs/PERFORMANCE.md). Same math as the einsum path:
        # bf16 operands, fp32 accumulation, magnitude in fp32. Gated to the
        # single-pass-bf16 tiers (DEFAULT precision) and TPU backends;
        # STFT_DOTMAG_PALLAS=True/False forces it either way.
        from vadc_tpu.kernels.stft_dotmag import dot_magnitude, split_basis

        wr, wi = split_basis(basis)
        return dot_magnitude(frames, wr, wi)
    spec = jnp.einsum(
        "bfn,cn->bfc",
        frames,
        basis,
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    real = spec[:, :, :cutoff]
    imag = spec[:, :, cutoff:]
    mag = jnp.sqrt(real * real + imag * imag)
    # Barrier: with two downstream consumers (adaptive-norm mean + subtract)
    # XLA otherwise materializes the full [B, F, 2*cutoff] fp32 spectrum and
    # reads it twice; forcing the half-size magnitude to materialize instead
    # saves ~100 us/step at batch 2048 (see trace notes in the repo log).
    return lax.optimization_barrier(mag)


def adaptive_audio_normalization_nlc(spect: jax.Array) -> jax.Array:
    """Adaptive normalization over [B, F, C] (channels last).

    Computed in fp32 (log1p range ~[0, 18]); the RESULT is stored at the
    active tier's compute dtype — this is where the turbo tier's bf16-resident
    encoder begins."""
    spect_e = _log1p(spect * 1048576.0)
    mean = jnp.mean(spect_e, axis=-1)  # over channels -> [B, F]
    mean_padded = reflect_pad_last(mean, 3, 3)
    taps = jnp.asarray(ADAPTIVE_NORM_FILTER, dtype=spect.dtype)
    # precision= for the same reason as the NCL variant above: DEFAULT
    # would contract these fp32 values (range ~18) at bf16 on TPU
    smoothed = jnp.matmul(_frame(mean_padded, 7, 1), taps, precision=_PRECISION)
    mean_mean = jnp.mean(smoothed, axis=-1)[:, None, None]
    return (spect_e - mean_mean).astype(_COMPUTE_DTYPE)


def depthwise_conv5_nlc(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Depthwise k5 pad2 conv over [B, L, C]; w [C, 5]."""
    w = w.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
    length = x.shape[1]
    y = xp[:, 0:length, :] * w[None, None, :, 0]
    for k in range(1, 5):
        y = y + xp[:, k : k + length, :] * w[None, None, :, k]
    return y + b[None, None, :].astype(x.dtype)


def conv_block_nlc(
    x: jax.Array,
    dw_w: jax.Array,
    dw_b: jax.Array,
    pw_w: jax.Array,
    pw_b: jax.Array,
    proj_w: jax.Array | None,
    proj_b: jax.Array | None,
) -> jax.Array:
    """ConvBlock over [B, L, C]."""
    h = jax.nn.relu(depthwise_conv5_nlc(x, dw_w, dw_b))
    h = linear(h, pw_w, pw_b)
    if proj_w is not None:
        h = h + linear(x, proj_w, proj_b)
    else:
        h = h + x
    return jax.nn.relu(h)


def transformer_block_nlc(x: jax.Array, p: dict) -> jax.Array:
    """Post-norm transformer block over [B, S, C] — no permutes needed."""
    h = x + attention(x, p["qkv_w"], p["qkv_b"], p["att_proj_w"], p["att_proj_b"])
    h = layer_norm(h, p["norm1_w"], p["norm1_b"])
    ff = linear(jax.nn.relu(linear(h, p["lin1_w"], p["lin1_b"])), p["lin2_w"], p["lin2_b"])
    return layer_norm(h + ff, p["norm2_w"], p["norm2_b"])


def transformer_layer_nlc(x: jax.Array, p: dict, *, stride: int) -> jax.Array:
    """Encoder stage over [B, S, C]: ConvBlock -> TransformerBlock ->
    strided 1x1 conv -> BatchNorm -> ReLU, all channels-last."""
    h = conv_block_nlc(
        x, p["dw_w"], p["dw_b"], p["pw_w"], p["pw_b"], p.get("proj_w"), p.get("proj_b")
    )
    h = transformer_block_nlc(h, p)
    if stride != 1:
        h = h[:, ::stride, :]
    h = linear(h, p["conv_w"], p["conv_b"])
    if "bn_w" in p:  # absent when the exporter folded BN into the conv
        inv = lax.rsqrt(p["bn_var"] + BATCH_NORM_EPS)
        if h.dtype == jnp.float32:
            h = (h - p["bn_mean"]) * inv * p["bn_w"] + p["bn_b"]
        else:  # bf16-resident: pre-fold the affine in fp32, apply in bf16
            scale = (inv * p["bn_w"]).astype(h.dtype)
            shift = (p["bn_b"] - p["bn_mean"] * inv * p["bn_w"]).astype(h.dtype)
            h = h * scale + shift
    return jax.nn.relu(h)


# ---------------------------------------------------------------------------
# CSB (batch-minor, [channels, seq, batch]) encoder variants — a measured
# layout EXPERIMENT, kept runnable but NOT the production path.
#
# Rationale tested: the NLC encoder keeps channels (16-64 in every Silero
# stage) on the TPU lane dimension, so XLA pads every activation tile up to
# 128 lanes; putting the STREAM BATCH minor instead (any multiple of 128
# tiles exactly; the production batch is 2048) makes every encoder
# activation dense. Verdict on a v5e chip at batch 2048 under SUSTAINED
# load: 4% SLOWER than NLC (0.965 vs 0.928 ms/chunk-step) — XLA's
# padded-but-batch-major matmul lowering beats the dense batch-minor
# einsums; short-burst timings that favored this layout were clock-ramp
# artifacts. Applying the layout to the STFT/norm front-end or LSTM/decoder
# measured worse still. Same math, same op order as the NLC twins (einsum
# orientation only) — parity-tested in test_layout_equivalence.py.
# Full log: docs/PERFORMANCE.md.
# ---------------------------------------------------------------------------


def linear_csb(x: jax.Array, w: jax.Array, b: jax.Array | None = None) -> jax.Array:
    """Channel linear over [C, S, B]; w [O, C] -> [O, S, B]."""
    y = jnp.einsum("oc,csb->osb", w.astype(x.dtype), x, precision=_PRECISION)
    if b is not None:
        y = y + b.astype(x.dtype)[:, None, None]
    return y


def depthwise_conv5_csb(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Depthwise k5 pad2 conv over [C, S, B]; w [C, 5]."""
    w = w.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0)))
    length = x.shape[1]
    y = xp[:, 0:length, :] * w[:, 0, None, None]
    for k in range(1, 5):
        y = y + xp[:, k : k + length, :] * w[:, k, None, None]
    return y + b.astype(x.dtype)[:, None, None]


def conv_block_csb(
    x: jax.Array,
    dw_w: jax.Array,
    dw_b: jax.Array,
    pw_w: jax.Array,
    pw_b: jax.Array,
    proj_w: jax.Array | None,
    proj_b: jax.Array | None,
) -> jax.Array:
    """ConvBlock over [C, S, B] (reference conv.c:761-814)."""
    h = jax.nn.relu(depthwise_conv5_csb(x, dw_w, dw_b))
    h = linear_csb(h, pw_w, pw_b)
    if proj_w is not None:
        h = h + linear_csb(x, proj_w, proj_b)
    else:
        h = h + x
    return jax.nn.relu(h)


def layer_norm_csb(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """LayerNorm over the CHANNEL (leading) dim of [C, S, B]."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=0, keepdims=True)
    inv = lax.rsqrt(var + LAYER_NORM_EPS)
    return ((xf - mean) * inv * w[:, None, None] + b[:, None, None]).astype(x.dtype)


def attention_csb(
    x: jax.Array,
    qkv_w: jax.Array,
    qkv_b: jax.Array,
    proj_w: jax.Array,
    proj_b: jax.Array,
    *,
    n_heads: int = 2,
) -> jax.Array:
    """Silero dual-head attention over [C, S, B] (k.q^T orientation preserved,
    reference transformer.c:13-153). Row-split per-head projections as in the
    NLC fast path; scores contract the head dim with batch riding the lanes."""
    dim = x.shape[0]
    head_dim = dim // n_heads
    scale = jnp.sqrt(jnp.float32(head_dim))
    out = None
    for h in range(n_heads):
        q = linear_csb(x, qkv_w[h * head_dim : (h + 1) * head_dim],
                       qkv_b[h * head_dim : (h + 1) * head_dim])
        k = linear_csb(x, qkv_w[dim + h * head_dim : dim + (h + 1) * head_dim],
                       qkv_b[dim + h * head_dim : dim + (h + 1) * head_dim])
        v = linear_csb(x, qkv_w[2 * dim + h * head_dim : 2 * dim + (h + 1) * head_dim],
                       qkv_b[2 * dim + h * head_dim : 2 * dim + (h + 1) * head_dim])
        scores = jnp.einsum("dsb,dtb->stb", k, q, precision=_PRECISION)
        alpha = softmax(scores / scale, axis=1).astype(x.dtype)
        head_out = jnp.einsum("stb,dtb->dsb", alpha, v, precision=_PRECISION)
        proj = jnp.einsum(
            "od,dsb->osb",
            proj_w[:, h * head_dim : (h + 1) * head_dim].astype(x.dtype),
            head_out,
            precision=_PRECISION,
        )
        out = proj if out is None else out + proj
    return out + proj_b.astype(out.dtype)[:, None, None]


def transformer_block_csb(x: jax.Array, p: dict) -> jax.Array:
    """Post-norm transformer block over [C, S, B]."""
    h = x + attention_csb(x, p["qkv_w"], p["qkv_b"], p["att_proj_w"], p["att_proj_b"])
    h = layer_norm_csb(h, p["norm1_w"], p["norm1_b"])
    ff = linear_csb(jax.nn.relu(linear_csb(h, p["lin1_w"], p["lin1_b"])),
                    p["lin2_w"], p["lin2_b"])
    return layer_norm_csb(h + ff, p["norm2_w"], p["norm2_b"])


def transformer_layer_csb(x: jax.Array, p: dict, *, stride: int) -> jax.Array:
    """Encoder stage over [C, S, B]: ConvBlock -> TransformerBlock ->
    strided 1x1 conv -> BatchNorm -> ReLU (reference transformer.c:237-295)."""
    h = conv_block_csb(
        x, p["dw_w"], p["dw_b"], p["pw_w"], p["pw_b"], p.get("proj_w"), p.get("proj_b")
    )
    h = transformer_block_csb(h, p)
    if stride != 1:
        h = h[:, ::stride, :]
    h = linear_csb(h, p["conv_w"], p["conv_b"])
    if "bn_w" in p:  # affine pre-folded in fp32, applied at activation dtype
        inv = lax.rsqrt(p["bn_var"] + BATCH_NORM_EPS)
        scale = (inv * p["bn_w"]).astype(h.dtype)
        shift = (p["bn_b"] - p["bn_mean"] * inv * p["bn_w"]).astype(h.dtype)
        h = h * scale[:, None, None] + shift[:, None, None]
    return jax.nn.relu(h)


def conv1d_nlc(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """General small-kernel conv over [B, L, C]; w [O, C, K].

    Expressed as K shifted strided matmuls (K <= 5 in every Silero variant),
    keeping the contraction on the MXU without layout changes."""
    k = w.shape[-1]
    w = w.astype(x.dtype)
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    length = x.shape[1]
    out_len = (length - k) // stride + 1
    y = None
    for tap in range(k):
        xs = x[:, tap : tap + (out_len - 1) * stride + 1 : stride, :]
        term = jnp.matmul(xs, w[:, :, tap].T, precision=_PRECISION)
        y = term if y is None else y + term
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def batch_norm1d_nlc(
    x: jax.Array,
    running_mean: jax.Array,
    running_var: jax.Array,
    w: jax.Array,
    b: jax.Array,
) -> jax.Array:
    """Inference BatchNorm over the channel (last) dim of [B, L, C]."""
    inv = lax.rsqrt(running_var + BATCH_NORM_EPS)
    if x.dtype == jnp.float32:
        return (x - running_mean) * inv * w + b
    # bf16-resident: pre-fold the affine in fp32, apply at activation dtype
    scale = (inv * w).astype(x.dtype)
    shift = (b - running_mean * inv * w).astype(x.dtype)
    return x * scale + shift


def decoder_v5_nlc(out: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """v4/v5 decoder over LSTM output [B, T, H] -> probs [B].
    Sigmoid precedes the frame mean (silero_vad.py:331-341)."""
    logits = linear(jax.nn.relu(out), w, b)  # [B, T, 1]
    return jnp.mean(jax.nn.sigmoid(logits[:, :, 0]), axis=1)


def decoder_v3_nlc(out: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """v3 decoder over LSTM output [B, T, H] -> probs [B] (channel 1)."""
    logits = linear(jax.nn.relu(out), w, b)  # [B, T, 2]
    return jax.nn.sigmoid(jnp.mean(logits, axis=1))[:, 1]


def decoder_v3(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """v3 decoder: relu -> 1x1 conv (64->2) -> mean over frames -> sigmoid.

    x: [B, 64, T]; w: [2, 64]; b: [2]. Returns [B, 2, 1]; speech probability
    is channel 1. Reference: decoder_tensor, silero_v3.c:231-303; decoder
    Sequential, silero_vad.py:255-260 (AdaptiveAvgPool1d(1) == mean over T).
    """
    h = pointwise_conv(jax.nn.relu(x), w, b)
    return jax.nn.sigmoid(jnp.mean(h, axis=-1, keepdims=True))


def decoder_v5(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """v4/v5 decoder: relu -> 1x1 conv (C->1) -> sigmoid -> mean over frames.

    x: [B, C, T]; w: [1, C]; b: [1]. Returns [B, 1]. Reference: make_decoder /
    Silero_Vad_5.forward, silero_vad.py:331-341 and 421-424 (dropout is an
    inference no-op; the sigmoid precedes the frame mean).
    """
    h = jax.nn.sigmoid(pointwise_conv(jax.nn.relu(x), w, b))
    return jnp.mean(h[:, 0, :], axis=-1, keepdims=True)
