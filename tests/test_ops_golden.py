"""Per-op golden tests against the reference's tracked .testtensor fixtures.

Mirrors the reference test pyramid's primitive tier (test.c:2218-2255):
every op is compared by max-abs-error against PyTorch-produced reference
outputs at the reference's own tolerances (test.c: 1e-4 for ops, 1e-10 for
the decoder)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import assert_close
from vadc_tpu.io.testtensor import load_testtensor
from vadc_tpu.nn import functional as F


def test_softmax(testdata):
    """The fixture exercises the PRODUCTION softmax — the same F.softmax
    that F.attention applies to its score tensors (both formulations)."""
    d = load_testtensor(testdata / "softmax_test.testtensor")
    out = F.softmax(jnp.asarray(d["input"]), axis=-1)
    assert_close(out, d["output"], 1e-4, "softmax")


def test_softmax_through_attention_path(testdata):
    """Assert the fixture values also flow through F.attention itself: an
    identity-shaped attention whose scores ARE the fixture rows must emit
    the fixture's softmax as its mixing weights. Construction: 1 head,
    Q = I via qkv_w, K rows chosen so k.q^T/sqrt(d) reproduces the fixture,
    V = I, proj = I — then attention(x) == softmax(fixture) @ x."""
    d = load_testtensor(testdata / "softmax_test.testtensor")
    rows = np.asarray(d["input"], dtype=np.float32)  # [N, D] score rows
    n, dim = rows.shape
    assert n == dim, "fixture rows must be square to pose as a score matrix"
    # x = I so q_t = e_t and k_s = W_k[:, s] (PyTorch linear: W @ x_s);
    # scores[s, t] = k_s . q_t = W_k[t, s] — so set W_k = rows.T * sqrt(d)
    eye = np.eye(dim, dtype=np.float32)
    qkv_w = np.concatenate(
        [eye, rows.T * np.sqrt(np.float32(dim)), eye], axis=0
    )  # [3D, D] blocks: q, k, v
    qkv_b = np.zeros((3 * dim,), np.float32)
    out = F.attention(
        jnp.asarray(eye)[None],  # [1, S=D, D]
        jnp.asarray(qkv_w),
        jnp.asarray(qkv_b),
        jnp.asarray(eye),
        jnp.asarray(np.zeros((dim,), np.float32)),
        n_heads=1,
    )
    # with V = x = I, attention output IS alpha (the softmaxed fixture)
    assert_close(out[0], d["output"], 1e-4, "softmax via attention")


def test_layer_norm(testdata):
    d = load_testtensor(testdata / "layernorm_test.testtensor")
    out = F.layer_norm(jnp.asarray(d["input"]), jnp.asarray(d["weight"]), jnp.asarray(d["bias"]))
    assert_close(out, d["result"], 1e-4, "layer_norm")


def test_batch_norm(testdata):
    d = load_testtensor(testdata / "batchnorm_test.testtensor")
    out = F.batch_norm1d(
        jnp.asarray(d["input"]),
        jnp.asarray(d["running_mean"]),
        jnp.asarray(d["running_var"]),
        jnp.asarray(d["weight"]),
        jnp.asarray(d["bias"]),
    )
    assert_close(out, d["result"], 1e-4, "batch_norm1d")


def test_decoder(testdata):
    d = load_testtensor(testdata / "decoder_test.testtensor")
    out = F.decoder_v3(
        jnp.asarray(d["input"]),
        jnp.asarray(d["weight"][:, :, 0]),
        jnp.asarray(d["bias"]),
    )
    # Reference uses atol 1e-10 (test.c:198) for its scalar-loop C decoder;
    # XLA's fp32 reduction order differs, so the achievable bound is ~1e-7.
    assert_close(out, d["output"], 1e-7, "decoder_v3")


def test_depthwise_conv5(testdata):
    d = load_testtensor(testdata / "dw_conv_129.testtensor")
    out = F.depthwise_conv5(
        jnp.asarray(d["input"])[None],
        jnp.asarray(d["weight"]),
        jnp.asarray(d["bias"]),
    )
    assert_close(out[0], d["output"], 1e-4, "depthwise_conv5")


def test_pointwise_conv(testdata):
    d = load_testtensor(testdata / "pw_conv_129_16.testtensor")
    out = F.pointwise_conv(
        jnp.asarray(d["input"])[None],
        jnp.asarray(d["weight"][:, :, 0]),
        jnp.asarray(d["bias"]),
    )
    assert_close(out[0], d["output"], 1e-4, "pointwise_conv")


def test_conv_block(testdata):
    d = load_testtensor(testdata / "first_layer_conv_block.testtensor")
    out = F.conv_block(
        jnp.asarray(d["input"])[None],
        jnp.asarray(d["dw_conv.0.weight"]),
        jnp.asarray(d["dw_conv.0.bias"]),
        jnp.asarray(d["pw_conv.0.weight"][:, :, 0]),
        jnp.asarray(d["pw_conv.0.bias"]),
        jnp.asarray(d["proj.weight"][:, :, 0]),
        jnp.asarray(d["proj.bias"]),
    )
    assert_close(out[0], d["output"], 1e-4, "conv_block")


def test_dual_head_attention(testdata):
    d = load_testtensor(testdata / "dual_head_attention_test.testtensor")
    out = F.attention(
        jnp.asarray(d["input"])[None],  # [1, 25, 16] seq-major
        jnp.asarray(d["weights"]),
        jnp.asarray(d["biases"]),
        jnp.asarray(d["proj_weights"]),
        jnp.asarray(d["proj_biases"]),
    )
    assert_close(out[0], d["result"], 1e-4, "attention")


def test_transformer_block(testdata):
    d = load_testtensor(testdata / "transformer_block_test_16_16_48.testtensor")
    p = {
        "qkv_w": jnp.asarray(d["attention.QKV.weight"]),
        "qkv_b": jnp.asarray(d["attention.QKV.bias"]),
        "att_proj_w": jnp.asarray(d["attention.out_proj.weight"]),
        "att_proj_b": jnp.asarray(d["attention.out_proj.bias"]),
        "norm1_w": jnp.asarray(d["norm1.weight"]),
        "norm1_b": jnp.asarray(d["norm1.bias"]),
        "norm2_w": jnp.asarray(d["norm2.weight"]),
        "norm2_b": jnp.asarray(d["norm2.bias"]),
        "lin1_w": jnp.asarray(d["linear1.weight"]),
        "lin1_b": jnp.asarray(d["linear1.bias"]),
        "lin2_w": jnp.asarray(d["linear2.weight"]),
        "lin2_b": jnp.asarray(d["linear2.bias"]),
    }
    out = F.transformer_block(jnp.asarray(d["input"])[None], p)  # [1, 16, 25] NCL
    assert_close(out[0], d["result"], 1e-4, "transformer_block")


def test_adaptive_audio_normalization(testdata):
    d = load_testtensor(testdata / "adaptive_audio_normalization_test.testtensor")
    out = F.adaptive_audio_normalization(jnp.asarray(d["input"]))
    assert_close(out, d["output"], 1e-4, "adaptive_audio_normalization")


def test_lstm(testdata):
    d = load_testtensor(testdata / "lstm_nito_reference_randn.testtensor")
    x = jnp.asarray(d["input_x"])[None]  # [1, 7, 64]
    h0 = jnp.asarray(d["hidden_state_previous"])[:, None, :]  # [2, 1, 64]
    c0 = jnp.asarray(d["cell_state_previous"])[:, None, :]
    out, hn, cn = F.lstm(
        x, h0, c0, jnp.asarray(d["weights_transposed"]), jnp.asarray(d["biases"])
    )
    # Fixture output layout: 7 per-step h rows, then hn (2 layers), cn (2 layers)
    # (reference lstm_seq output contract, lstm.c:156-218).
    ref = d["output"]
    assert_close(out[0], ref[:7], 1e-4, "lstm output")
    assert_close(hn[:, 0, :], ref[7:9], 1e-4, "lstm hn")
    assert_close(cn[:, 0, :], ref[9:11], 1e-4, "lstm cn")


def test_lstm_minibatched_equals_flattened(testdata):
    """Minibatched semantics: chunks flatten to one sequence (lstm.c:275-277)."""
    d = load_testtensor(testdata / "lstm_nito_reference_randn.testtensor")
    w = jnp.asarray(d["weights_transposed"])
    b = jnp.asarray(d["biases"])
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 7, 64)).astype(np.float32))
    h0 = jnp.zeros((2, 1, 64))
    c0 = jnp.zeros((2, 1, 64))
    out_mb, hn_mb, cn_mb = F.lstm_minibatched(x, h0, c0, w, b)
    out_flat, hn_flat, cn_flat = F.lstm(x.reshape(1, 28, 64), h0, c0, w, b)
    np.testing.assert_array_equal(np.asarray(out_mb).reshape(1, 28, 64), np.asarray(out_flat))
    np.testing.assert_array_equal(np.asarray(hn_mb), np.asarray(hn_flat))
    np.testing.assert_array_equal(np.asarray(cn_mb), np.asarray(cn_flat))


def test_stft_vs_torch(testdata):
    """No tracked STFT fixture exists (testdata/untracked), so cross-check the
    STFT against torch.conv1d with the real v3.1 Fourier basis, replicating
    STFT_conv semantics (silero_vad.py:29-46)."""
    torch = pytest.importorskip("torch")
    weights = load_testtensor(testdata / "silero_v31_16k.testtensor")
    basis = weights["forward_basis_buffer"]  # [258, 1, 256]
    rng = np.random.default_rng(2)
    audio = rng.normal(size=(3, 1536)).astype(np.float32) * 0.1

    out = F.stft_magnitude(
        jnp.asarray(audio), jnp.asarray(basis[:, 0, :]), pad_left=128, pad_right=128, hop=64
    )

    with torch.no_grad():
        t_audio = torch.nn.functional.pad(
            torch.from_numpy(audio), (128, 128), mode="reflect"
        )
        spec = torch.nn.functional.conv1d(
            t_audio.unsqueeze(1), torch.from_numpy(basis), stride=64
        )
        real, imag = spec[:, :129, :], spec[:, 129:, :]
        ref = torch.sqrt(real**2 + imag**2).numpy()

    assert out.shape == (3, 129, 25)
    assert_close(out, ref, 1e-4, "stft_magnitude")
