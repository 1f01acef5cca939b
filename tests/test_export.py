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
