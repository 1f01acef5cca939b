"""Pallas kernel tests: every kernel is validated against its pure-jnp
oracle in vadc_tpu.nn.functional (interpret mode on CPU, compiled on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import assert_close
from vadc_tpu.io.testtensor import load_testtensor
from vadc_tpu.nn import functional as F


@pytest.fixture(scope="module")
def lstm_weights(testdata):
    d = load_testtensor(testdata / "silero_v31_16k.testtensor")
    return jnp.asarray(d["weights"]), jnp.asarray(d["biases"])


def test_lstm_fused_matches_oracle(lstm_weights):
    from vadc_tpu.kernels.lstm import lstm_fused

    w, b = lstm_weights
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 7, 64)).astype(np.float32))
    h0 = jnp.asarray(rng.normal(size=(2, 8, 64)).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.normal(size=(2, 8, 64)).astype(np.float32) * 0.1)

    y_ref, hn_ref, cn_ref = F.lstm(x, h0, c0, w, b)
    y, hn, cn = lstm_fused(x, h0, c0, w, b, block_streams=4)
    assert_close(y, y_ref, 1e-5, "lstm_fused y")
    assert_close(hn, hn_ref, 1e-5, "lstm_fused hn")
    assert_close(cn, cn_ref, 1e-5, "lstm_fused cn")


def test_lstm_decoder_fused_matches_model(testdata):
    from vadc_tpu.kernels.lstm import lstm_decoder_fused
    from vadc_tpu.models.weights import silero_v31_params
    from vadc_tpu.models import silero_v31

    params = silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.normal(size=(4, 1536)).astype(np.float32) * 0.1)
    h, c = silero_v31.init_state(4)
    probs_ref, hn_ref, cn_ref = silero_v31.forward(params, audio, h, c)

    feats = silero_v31.encode_nlc(params, audio)
    probs, hn, cn = lstm_decoder_fused(
        feats, h, c, params["lstm_w"], params["lstm_b"],
        params["dec_w"], params["dec_b"], block_streams=2,
    )
    assert_close(probs, probs_ref, 1e-6, "lstm_decoder probs")
    assert_close(hn, hn_ref, 1e-6, "lstm_decoder hn")
    assert_close(cn, cn_ref, 1e-6, "lstm_decoder cn")


def test_fused2d_matches_model(testdata):
    """The 2-D whole-encoder kernel must reproduce the XLA forward."""
    from vadc_tpu.kernels.silero_v31_fused2d import forward_fused2d
    from vadc_tpu.models.weights import silero_v31_params
    from vadc_tpu.models import silero_v31

    params = silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))
    rng = np.random.default_rng(9)
    audio = jnp.asarray(rng.normal(size=(8, 1536)).astype(np.float32) * 0.1)
    h, c = silero_v31.init_state(8)
    probs_ref, hn_ref, cn_ref = silero_v31.forward(params, audio, h, c)
    probs, hn, cn = forward_fused2d(params, audio, h, c, block_streams=4)
    assert_close(probs, probs_ref, 1e-6, "fused2d probs")
    assert_close(hn, hn_ref, 1e-5, "fused2d hn")
    assert_close(cn, cn_ref, 1e-4, "fused2d cn")


def test_fused2d_state_carry(testdata):
    """Carried LSTM state must thread correctly through the fused kernel."""
    from vadc_tpu.kernels.silero_v31_fused2d import forward_fused2d
    from vadc_tpu.models.weights import silero_v31_params
    from vadc_tpu.models import silero_v31

    params = silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))
    rng = np.random.default_rng(10)
    h, c = silero_v31.init_state(4)
    hf, cf = h, c
    for step in range(3):
        audio = jnp.asarray(rng.normal(size=(4, 1536)).astype(np.float32) * 0.1)
        p_ref, h, c = silero_v31.forward(params, audio, h, c)
        p_f, hf, cf = forward_fused2d(params, audio, hf, cf, block_streams=4)
        assert_close(p_f, p_ref, 1e-5, f"fused2d step {step}")


def test_lstm_fused_golden(testdata):
    from vadc_tpu.kernels.lstm import lstm_fused

    d = load_testtensor(testdata / "lstm_nito_reference_randn.testtensor")
    x = jnp.asarray(d["input_x"])[None]
    h0 = jnp.asarray(d["hidden_state_previous"])[:, None, :]
    c0 = jnp.asarray(d["cell_state_previous"])[:, None, :]
    y, hn, cn = lstm_fused(
        x, h0, c0, jnp.asarray(d["weights_transposed"]), jnp.asarray(d["biases"]),
        block_streams=1,
    )
    ref = d["output"]
    assert_close(y[0], ref[:7], 1e-4, "fused lstm golden y")
    assert_close(hn[:, 0, :], ref[7:9], 1e-4, "fused lstm golden hn")


def test_fused2d_bn_folded_archive(testdata):
    """StreamRunner(use_pallas=True) must work with BN-folded archives
    (official .onnx v3 extraction omits the batch-norm tensors) — the kernel
    skips the BN affine exactly like the XLA paths (round-1 advisor)."""
    from vadc_tpu.kernels.silero_v31_fused2d import forward_fused2d
    from vadc_tpu.models.weights import silero_v31_params
    from vadc_tpu.models import silero_v31
    from vadc_tpu.nn.functional import BATCH_NORM_EPS

    params = silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))
    folded_layers = []
    for p in params["layers"]:
        p = dict(p)
        scale = np.asarray(p["bn_w"]) / np.sqrt(np.asarray(p["bn_var"]) + BATCH_NORM_EPS)
        p["conv_b"] = jnp.asarray(
            (np.asarray(p["conv_b"]) - np.asarray(p["bn_mean"])) * scale
            + np.asarray(p["bn_b"])
        )
        p["conv_w"] = jnp.asarray(np.asarray(p["conv_w"]) * scale[:, None])
        for k in ("bn_w", "bn_b", "bn_mean", "bn_var"):
            p.pop(k)
        folded_layers.append(p)
    folded = {**params, "layers": folded_layers}

    rng = np.random.default_rng(11)
    audio = jnp.asarray(rng.normal(size=(4, 1536)).astype(np.float32) * 0.1)
    h, c = silero_v31.init_state(4)
    probs_ref, _, _ = silero_v31.forward(folded, audio, h, c)
    probs, _, _ = forward_fused2d(folded, audio, h, c, block_streams=4)
    assert_close(probs, probs_ref, 1e-5, "fused2d BN-folded probs")


def test_fused2d_attn3d_matches_model(testdata):
    """The batched-attention variant (toolchains with 3-D dot support) must
    reproduce the XLA forward like the block-diagonal form does."""
    from vadc_tpu.kernels.silero_v31_fused2d import forward_fused2d
    from vadc_tpu.models.weights import silero_v31_params
    from vadc_tpu.models import silero_v31

    params = silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))
    rng = np.random.default_rng(12)
    audio = jnp.asarray(rng.normal(size=(8, 1536)).astype(np.float32) * 0.1)
    h, c = silero_v31.init_state(8)
    probs_ref, hn_ref, _ = silero_v31.forward(params, audio, h, c)
    probs, hn, _ = forward_fused2d(params, audio, h, c, block_streams=4, attn_3d=True)
    assert_close(probs, probs_ref, 1e-6, "fused2d attn3d probs")
    assert_close(hn, hn_ref, 1e-5, "fused2d attn3d hn")


def test_stft_dotmag_kernel_parity_interpret(testdata):
    """Fused spectrum-dot+magnitude kernel (kernels/stft_dotmag.py): the r4
    attack on the step's #1 HBM intermediate. On-chip it is bit-exact vs the
    einsum path but 1.8x slower at the op level (remote Mosaic dot
    throughput — see docs/PERFORMANCE.md round 4), so it ships default-OFF;
    this keeps both the kernel and its production wiring correct so the
    experiment re-runs the day the toolchain moves."""
    from unittest import mock

    import vadc_tpu.kernels.stft_dotmag as sd
    from vadc_tpu.io.testtensor import load_testtensor
    from vadc_tpu.nn import functional as F

    basis = jnp.asarray(
        np.asarray(
            load_testtensor(testdata / "silero_v31_16k.testtensor")[
                "forward_basis_buffer"
            ]
        ).reshape(258, 256)
    )
    rng = np.random.default_rng(5)
    audio = jnp.asarray((0.1 * rng.normal(size=(8, 1536))).astype(np.float32))
    # direct kernel parity, fp32 operands
    frames = F._frame(F.reflect_pad_last(audio, 128, 128), 256, 64)
    spec = jnp.einsum(
        "bfn,cn->bfc", frames, basis, preferred_element_type=jnp.float32
    )
    ref = jnp.sqrt(spec[:, :, :129] ** 2 + spec[:, :, 129:] ** 2)
    wr, wi = sd.split_basis(basis)
    out = sd.dot_magnitude(frames, wr, wi, block_rows=8 * 25, interpret=True)
    assert_close(out, ref, 1e-5, "dot_magnitude vs einsum")

    # production wiring: the turbo-tier stft_magnitude_nlc routes through
    # the kernel when STFT_DOTMAG_PALLAS is forced on
    orig_call = sd.pl.pallas_call

    def force_interpret(*args, **kwargs):
        # partial(..., interpret=True) would be overridden by the wiring's
        # explicit interpret=False keyword; force it instead
        kwargs["interpret"] = True
        return orig_call(*args, **kwargs)

    with F.precision_mode("turbo"):
        ref_nlc = F.stft_magnitude_nlc(
            audio, basis, pad_left=128, pad_right=128, hop=64
        )
        with mock.patch.object(
            sd.pl, "pallas_call", force_interpret
        ), mock.patch.object(F, "STFT_DOTMAG_PALLAS", True):
            out_nlc = F.stft_magnitude_nlc(
                audio, basis, pad_left=128, pad_right=128, hop=64
            )
    assert_close(out_nlc, ref_nlc, 2e-5, "stft_magnitude_nlc dotmag wiring")


def test_stft_mag_kernel_parity_interpret(testdata):
    """Fused STFT+magnitude kernel (kernels/stft_mag.py, a measured-rejected
    r3 experiment — see its docstring) stays correct in interpret mode so
    the experiment remains reproducible if the toolchain moves."""
    import functools
    from unittest import mock

    import vadc_tpu.kernels.stft_mag as sm
    from vadc_tpu.io.testtensor import load_testtensor
    from vadc_tpu.nn import functional as F

    basis = jnp.asarray(
        np.asarray(
            load_testtensor(testdata / "silero_v31_16k.testtensor")[
                "forward_basis_buffer"
            ]
        ).reshape(258, 256)
    )
    packed = sm.prepack_basis(basis, 64)
    rng = np.random.default_rng(3)
    audio = jnp.asarray((0.1 * rng.normal(size=(8, 1536))).astype(np.float32))
    ref = F.stft_magnitude_nlc(audio, basis, pad_left=128, pad_right=128, hop=64)
    orig = sm.pl.pallas_call
    with mock.patch.object(
        sm.pl, "pallas_call", functools.partial(orig, interpret=True)
    ):
        out = sm.stft_magnitude_pallas(
            audio, packed, pad_left=128, pad_right=128, hop=64, cutoff=129,
            block_streams=8,
        )
    assert_close(out, ref, 1e-5, "stft_mag kernel vs XLA")


def test_fused3d_matches_model(testdata):
    """The 3-D whole-encoder kernel (a documented losing experiment on this
    toolchain — 5.7 ms/chunk-step vs fused2d's 1.88; no longer selected by
    forward_pallas) must still reproduce the XLA forward, including with
    carried state."""
    from vadc_tpu.kernels.silero_v31_fused3d import forward_fused3d
    from vadc_tpu.models import silero_v31
    from vadc_tpu.models.weights import silero_v31_params

    params = silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))
    rng = np.random.default_rng(13)
    h, c = silero_v31.init_state(8)
    hf, cf = h, c
    for step in range(3):
        audio = jnp.asarray(rng.normal(size=(8, 1536)).astype(np.float32) * 0.1)
        p_ref, h, c = silero_v31.forward(params, audio, h, c)
        p_f, hf, cf = forward_fused3d(params, audio, hf, cf, block_streams=4)
        assert_close(p_f, p_ref, 1e-5, f"fused3d probs step {step}")
        assert_close(hf, h, 1e-4, f"fused3d hn step {step}")
        assert_close(cf, c, 1e-4, f"fused3d cn step {step}")


def test_forward_pallas_matches_xla(testdata):
    """forward_pallas (the fused2d kernel since round 5 re-pinned the 3-D
    kernel as a methodology artifact; see models/silero_v31.forward_pallas)
    must agree with the XLA forward at block-divisible AND ragged batches."""
    from vadc_tpu.models import silero_v31
    from vadc_tpu.models.weights import silero_v31_params

    params = silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))
    rng = np.random.default_rng(14)
    for batch in (8, 5):
        audio = jnp.asarray(rng.normal(size=(batch, 1536)).astype(np.float32) * 0.1)
        h, c = silero_v31.init_state(batch)
        p_ref, *_ = silero_v31.forward(params, audio, h, c)
        p_f, *_ = silero_v31.forward_pallas(params, audio, h, c)
        assert_close(p_f, p_ref, 1e-5, f"forward_pallas batch {batch}")
