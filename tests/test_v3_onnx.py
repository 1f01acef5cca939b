"""v3 ONNX extraction: every recoverable tensor must be bit-identical to the
golden archive, and the BN-folded model must reproduce its probabilities."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import assert_close
from vadc_tpu.io.testtensor import load_testtensor
from vadc_tpu.models import silero_v31
from vadc_tpu.models.weights import load_params_from_tensors, silero_v31_params

V3_ONNX = Path("/root/reference/silero_vad_v3.onnx")


@pytest.fixture(scope="module")
def extracted():
    if not V3_ONNX.exists():
        pytest.skip("v3 onnx not available")
    from vadc_tpu.export.silero_v3_from_onnx import extract_silero_v3

    return extract_silero_v3(V3_ONNX)


def test_bit_identical_where_unfolded(extracted, testdata):
    golden = load_testtensor(testdata / "silero_v31_16k.testtensor")
    folded = {f"transformer_l{i}.conv_{kind}" for i in (1, 2, 3, 4)
              for kind in ("weights", "biases")}
    for name, arr in extracted.items():
        if name in golden and name not in folded:
            np.testing.assert_array_equal(arr, golden[name], err_msg=name)
    # BN tensors are absent by construction (folded into the stage convs)
    assert not any("batch_norm" in k for k in extracted)


def test_load_params_accepts_onnx_directly():
    """--model file.onnx parity with the reference's ORT backend."""
    if not V3_ONNX.exists():
        pytest.skip("v3 onnx not available")
    from vadc_tpu.models.weights import load_params

    family, params = load_params(V3_ONNX)
    assert family == "v3"
    v4 = V3_ONNX.parent / "silero_vad_v4.onnx"
    if v4.exists():
        family4, _ = load_params(v4)
        assert family4 == "v4"


def test_probabilities_match_golden_model(extracted, testdata):
    family, p_onnx = load_params_from_tensors(extracted)
    assert family == "v3"
    p_gold = silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.normal(size=(3, 1536)).astype(np.float32) * 0.1)
    h, c = silero_v31.init_state(3)
    po, hn_o, _ = silero_v31.forward(p_onnx, audio, h, c)
    pg, hn_g, _ = silero_v31.forward(p_gold, audio, h, c)
    assert_close(po, pg, 1e-6, "onnx-vs-golden probs")
    assert_close(hn_o, hn_g, 1e-5, "onnx-vs-golden hn")
