"""Property tests: the channels-last (NLC) production ops must match the
fixture-facing NCL reference ops exactly (same math, different layout)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import assert_close
from vadc_tpu.nn import functional as F


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_stft_layouts(testdata, rng):
    from vadc_tpu.io.testtensor import load_testtensor

    basis = jnp.asarray(
        load_testtensor(testdata / "silero_v31_16k.testtensor")[
            "forward_basis_buffer"
        ][:, 0, :]
    )
    audio = jnp.asarray(rng.normal(size=(3, 1536)).astype(np.float32) * 0.1)
    ncl = F.stft_magnitude(audio, basis, pad_left=128, pad_right=128, hop=64)
    nlc = F.stft_magnitude_nlc(audio, basis, pad_left=128, pad_right=128, hop=64)
    assert_close(nlc, ncl.transpose(0, 2, 1), 1e-6, "stft layouts")


def test_adaptive_norm_layouts(rng):
    spect = jnp.asarray(np.abs(rng.normal(size=(2, 129, 25))).astype(np.float32))
    ncl = F.adaptive_audio_normalization(spect)
    nlc = F.adaptive_audio_normalization_nlc(spect.transpose(0, 2, 1))
    assert_close(nlc, ncl.transpose(0, 2, 1), 1e-6, "adaptive norm layouts")


def test_conv_block_layouts(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 25)).astype(np.float32))
    dw_w = jnp.asarray(rng.normal(size=(16, 5)).astype(np.float32) * 0.2)
    dw_b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
    pw_w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32) * 0.2)
    pw_b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32) * 0.1)
    pj_w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32) * 0.2)
    pj_b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32) * 0.1)
    ncl = F.conv_block(x, dw_w, dw_b, pw_w, pw_b, pj_w, pj_b)
    nlc = F.conv_block_nlc(x.transpose(0, 2, 1), dw_w, dw_b, pw_w, pw_b, pj_w, pj_b)
    assert_close(nlc, ncl.transpose(0, 2, 1), 1e-5, "conv block layouts")


def test_conv1d_layouts(rng):
    x = jnp.asarray(rng.normal(size=(2, 129, 10)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 129, 3)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    for stride, padding in ((1, 1), (2, 1), (2, 0)):
        ncl = F.conv1d(x, w, b, stride=stride, padding=padding)
        nlc = F.conv1d_nlc(x.transpose(0, 2, 1), w, b, stride=stride, padding=padding)
        assert_close(
            nlc, ncl.transpose(0, 2, 1), 1e-5, f"conv1d s{stride} p{padding}"
        )


def test_transformer_layer_layouts(testdata, rng):
    from vadc_tpu.io.testtensor import load_testtensor
    from vadc_tpu.models.weights import transformer_layer_params

    d = load_testtensor(testdata / "transformer_first_layer.testtensor")
    p = transformer_layer_params(d)
    x = jnp.asarray(d["input"])
    ncl = F.transformer_layer(x, p, stride=2)
    nlc = F.transformer_layer_nlc(x.transpose(0, 2, 1), p, stride=2)
    assert_close(nlc, ncl.transpose(0, 2, 1), 1e-5, "transformer layer layouts")


def test_transformer_layer_csb_layout(testdata, rng):
    """Batch-minor [C, S, B] encoder stage == NLC stage (same math)."""
    from vadc_tpu.io.testtensor import load_testtensor
    from vadc_tpu.models.weights import transformer_layer_params

    d = load_testtensor(testdata / "transformer_first_layer.testtensor")
    p = transformer_layer_params(d)
    x = jnp.asarray(d["input"])  # [B, C, S]
    nlc = F.transformer_layer_nlc(x.transpose(0, 2, 1), p, stride=2)
    csb = F.transformer_layer_csb(x.transpose(1, 2, 0), p, stride=2)
    assert_close(csb.transpose(2, 1, 0), nlc, 1e-5, "csb encoder stage")


def test_encode_csb_matches_nlc(testdata, rng):
    """Full batch-minor encoder == NLC encoder on real v3.1 weights."""
    from vadc_tpu.io.testtensor import load_testtensor
    from vadc_tpu.models import silero_v31
    from vadc_tpu.models.weights import silero_v31_params

    params = silero_v31_params(
        load_testtensor(testdata / "silero_v31_16k.testtensor")
    )
    audio = jnp.asarray(rng.normal(size=(4, 1536)).astype(np.float32) * 0.1)
    nlc = silero_v31.encode_nlc(params, audio)  # [B, T, C]
    csb = silero_v31.encode_csb(params, audio)  # [C, T, B]
    # cross-FORMULATION fp32 accumulation-order bound (not a golden-fidelity
    # contract): the CSB experiment keeps einsum attention while the NLC
    # default runs the VPU broadcast-reduce chain at every tier since r3
    assert_close(csb.transpose(2, 1, 0), nlc, 2e-5, "encode csb vs nlc")


def test_precision_tiers_match_faithful(testdata, rng):
    """Every non-faithful tier's probabilities stay decision-compatible
    with the faithful tier (all tiers run the NLC production layout; the
    CSB layout above is an experiment, not a production path)."""
    from vadc_tpu.io.testtensor import load_testtensor
    from vadc_tpu.engine.runner import StreamRunner
    from vadc_tpu.models.weights import silero_v31_params

    params = silero_v31_params(
        load_testtensor(testdata / "silero_v31_16k.testtensor")
    )
    audio = jnp.asarray(rng.normal(size=(8, 3, 1536)).astype(np.float32) * 0.1)
    ref = StreamRunner("v3", params, precision="faithful")
    probs_ref, _ = ref.scan(audio, ref.init_state(8))
    for tier in ("balanced", "fast", "turbo"):
        r = StreamRunner("v3", params, precision=tier)
        probs, _ = r.scan(audio, r.init_state(8))
        dev = float(jnp.abs(probs - probs_ref).max())
        assert dev < 2e-3, f"{tier} deviates {dev}"


def test_attention_fast_path_matches_highest(rng):
    """The fused-QKV broadcast-reduce attention == the fp32 batched-head
    MATMUL formulation (same math, k.q^T orientation and head/projection
    layout preserved) at every Silero channel width — pinned explicitly via
    the VPU_ATTENTION_AT_HIGHEST toggle now that the VPU chain is the
    default at every tier (r3: 1.64x faithful-tier win, fp32 deviation
    5e-9 whole-model)."""
    for dim in (16, 32, 64):
        x = jnp.asarray(rng.normal(size=(3, 25, dim)).astype(np.float32) * 0.5)
        qkv_w = jnp.asarray(rng.normal(size=(3 * dim, dim)).astype(np.float32) * 0.3)
        qkv_b = jnp.asarray(rng.normal(size=(3 * dim,)).astype(np.float32) * 0.1)
        proj_w = jnp.asarray(rng.normal(size=(dim, dim)).astype(np.float32) * 0.3)
        proj_b = jnp.asarray(rng.normal(size=(dim,)).astype(np.float32) * 0.1)
        try:
            F.VPU_ATTENTION_AT_HIGHEST = False
            ref = F.attention(x, qkv_w, qkv_b, proj_w, proj_b)
        finally:
            F.VPU_ATTENTION_AT_HIGHEST = True
        vpu_fp32 = F.attention(x, qkv_w, qkv_b, proj_w, proj_b)
        assert_close(vpu_fp32, ref, 1e-5, f"attention vpu fp32 dim {dim}")
        with F.precision_mode("fast"):
            fast = F.attention(x, qkv_w, qkv_b, proj_w, proj_b)
        assert_close(fast, ref, 1e-3, f"attention fast path dim {dim}")


def test_block_framing_matches_numpy_stft(testdata, rng):
    """The gather-free block framing == an independent numpy STFT (stride-
    tricks framing + matmul + magnitude) on the real Fourier basis."""
    from vadc_tpu.io.testtensor import load_testtensor

    basis = np.asarray(
        load_testtensor(testdata / "silero_v31_16k.testtensor")[
            "forward_basis_buffer"
        ][:, 0, :]
    )
    audio = rng.normal(size=(2, 1536)).astype(np.float32) * 0.1
    padded = np.pad(audio, ((0, 0), (128, 128)), mode="reflect")
    n_fft, hop = 256, 64
    n_frames = (padded.shape[1] - n_fft) // hop + 1
    frames = np.stack(
        [padded[:, f * hop : f * hop + n_fft] for f in range(n_frames)], axis=1
    )
    spec = frames @ basis.T  # [B, F, 258]
    cutoff = n_fft // 2 + 1
    ref = np.sqrt(spec[:, :, :cutoff] ** 2 + spec[:, :, cutoff:] ** 2)
    out = F.stft_magnitude_nlc(
        jnp.asarray(audio), jnp.asarray(basis), pad_left=128, pad_right=128, hop=hop
    )
    assert_close(out, ref, 1e-4, "block framing vs numpy STFT")


def test_decoders_layouts(rng):
    out = jnp.asarray(rng.normal(size=(3, 7, 64)).astype(np.float32))
    w3 = jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32) * 0.2)
    b3 = jnp.asarray(rng.normal(size=(2,)).astype(np.float32) * 0.1)
    ncl = F.decoder_v3(out.transpose(0, 2, 1), w3, b3)[:, 1, 0]
    nlc = F.decoder_v3_nlc(out, w3, b3)
    assert_close(nlc, ncl, 1e-6, "decoder v3 layouts")

    w5 = jnp.asarray(rng.normal(size=(1, 64)).astype(np.float32) * 0.2)
    b5 = jnp.asarray(rng.normal(size=(1,)).astype(np.float32) * 0.1)
    ncl5 = F.decoder_v5(out.transpose(0, 2, 1), w5, b5)[:, 0]
    nlc5 = F.decoder_v5_nlc(out, w5, b5)
    assert_close(nlc5, ncl5, 1e-6, "decoder v5 layouts")
