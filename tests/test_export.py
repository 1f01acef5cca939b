"""Export-path tests: torch checkpoint -> archive must reproduce the golden
weight archive bit-for-bit."""

import numpy as np
import pytest

from vadc_tpu.io.testtensor import load_testtensor


def test_v31_export_bit_identical(testdata, tmp_path):
    torch = pytest.importorskip("torch")
    from vadc_tpu.export.torch_export import export_v31

    ckpt = "/root/reference/silero_vad_v3_16k.pt"
    out = tmp_path / "v31.testtensor"
    export_v31(ckpt, out)

    mine = load_testtensor(out)
    golden = load_testtensor(testdata / "silero_v31_16k.testtensor")
    assert list(mine) == list(golden), "tensor order must match"
    for name in golden:
        np.testing.assert_array_equal(mine[name], golden[name], err_msg=name)


def test_v5_export_from_synthetic_jit_dict():
    """Map the upstream v5 jit state-dict layout (silero_vad.py:380-392)
    into the runtime archive, then verify the loaded model matches the torch
    oracle with the very same weights."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from tests.torch_oracle import silero_v5_forward
    from vadc_tpu.export.torch_export import v5_archive_from_state_dict
    from vadc_tpu.io.testtensor import load_testtensor_bytes, save_testtensor_bytes
    from vadc_tpu.models import silero_v5
    from vadc_tpu.models.weights import load_params_from_tensors

    rng = np.random.default_rng(17)

    def r(*shape, scale=0.2):
        return rng.normal(size=shape).astype(np.float32) * scale

    shapes = [(128, 129, 3), (64, 128, 3), (64, 64, 3), (128, 64, 3)]
    sd = {"_model.stft.forward_basis_buffer": r(258, 1, 256, scale=0.1)}
    for i, s in enumerate(shapes):
        sd[f"_model.encoder.{i}.reparam_conv.weight"] = r(*s)
        sd[f"_model.encoder.{i}.reparam_conv.bias"] = r(s[0], scale=0.05)
    sd["_model.decoder.rnn.weight_ih_l0"] = r(512, 128, scale=0.1)
    sd["_model.decoder.rnn.weight_hh_l0"] = r(512, 128, scale=0.1)
    sd["_model.decoder.rnn.bias_ih_l0"] = r(512, scale=0.05)
    sd["_model.decoder.rnn.bias_hh_l0"] = r(512, scale=0.05)
    sd["_model.decoder.decoder.2.weight"] = r(1, 128, 1)
    sd["_model.decoder.decoder.2.bias"] = r(1, scale=0.05)

    archive = v5_archive_from_state_dict(sd)
    archive = load_testtensor_bytes(save_testtensor_bytes(archive))  # format RT
    family, params = load_params_from_tensors(archive)
    assert family == "v5"
    assert params["lstm_w"].shape == (1, 512, 256)

    audio = rng.normal(size=(2, 576)).astype(np.float32) * 0.1
    h, c = silero_v5.init_state(2)
    probs, _, _ = silero_v5.forward(params, jnp.asarray(audio), h, c)
    ref_probs, _, _ = silero_v5_forward(
        params, audio, np.zeros((1, 2, 128), np.float32), np.zeros((1, 2, 128), np.float32)
    )
    np.testing.assert_allclose(np.asarray(probs), ref_probs, atol=1e-4)


def test_fuse_lstm():
    from vadc_tpu.export.torch_export import fuse_lstm

    rng = np.random.default_rng(0)
    sd = {}
    for layer in range(2):
        sd[f"lstm.weight_ih_l{layer}"] = rng.normal(size=(256, 64)).astype(np.float32)
        sd[f"lstm.weight_hh_l{layer}"] = rng.normal(size=(256, 64)).astype(np.float32)
        sd[f"lstm.bias_ih_l{layer}"] = rng.normal(size=(256,)).astype(np.float32)
        sd[f"lstm.bias_hh_l{layer}"] = rng.normal(size=(256,)).astype(np.float32)
    fused = fuse_lstm(sd, "lstm.", 2)
    assert fused["weights"].shape == (2, 256, 128)
    assert fused["biases"].shape == (2, 256)
    np.testing.assert_array_equal(
        fused["weights"][1, :, :64], sd["lstm.weight_ih_l1"]
    )
    np.testing.assert_array_equal(
        fused["weights"][1, :, 64:], sd["lstm.weight_hh_l1"]
    )
    np.testing.assert_array_equal(
        fused["biases"][0], sd["lstm.bias_ih_l0"] + sd["lstm.bias_hh_l0"]
    )
