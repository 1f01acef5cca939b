"""Round-trip and compatibility tests for the .testtensor format."""

import numpy as np
import pytest

from vadc_tpu.io.testtensor import (
    TestTensorError,
    load_testtensor,
    load_testtensor_bytes,
    save_testtensor_bytes,
)


def test_roundtrip():
    tensors = {
        "a": np.arange(12, dtype=np.float32).reshape(3, 4),
        "b": np.float32(np.random.default_rng(0).normal(size=(2, 5, 7))),
        "empty_name_ok": np.zeros((1,), np.float32),
    }
    blob = save_testtensor_bytes(tensors)
    back = load_testtensor_bytes(blob)
    assert list(back) == list(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])


def test_rejects_bad_version():
    blob = bytearray(save_testtensor_bytes({"x": np.ones((2,), np.float32)}))
    blob[0] = 9
    with pytest.raises(TestTensorError):
        load_testtensor_bytes(bytes(blob))


def test_rejects_zero_dim():
    with pytest.raises(TestTensorError):
        save_testtensor_bytes({"s": np.float32(1.0)})


def test_reads_reference_fixture(testdata):
    """The format must parse the reference's own golden files bit-for-bit."""
    d = load_testtensor(testdata / "silero_v31_16k.testtensor")
    assert len(d) == 99  # reference silero.h:30-33 asserts 1+94+2+2 tensors
    assert d["forward_basis_buffer"].shape == (258, 1, 256)
    assert d["weights"].shape == (2, 256, 128)
    assert d["decoder_weights"].shape == (2, 64, 1)


def test_roundtrip_reference_fixture(testdata):
    raw = (testdata / "decoder_test.testtensor").read_bytes()
    tensors = load_testtensor_bytes(raw)
    assert save_testtensor_bytes(tensors) == raw
