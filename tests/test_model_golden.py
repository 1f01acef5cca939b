"""Full-model fidelity tests for Silero v3.1 against the torch oracle, with
LSTM state carried across successive batches (the streaming contract,
mirroring the reference's silero_test, test.c:1748-1916).

Tolerance is 1e-3, same as the reference's full-model test (test.c:1899):
log1p(2**20 * spect) amplifies absolute error unboundedly for near-zero
spectrogram bins, so fp32 implementations legitimately diverge at ~1e-4
downstream of the adaptive normalization regardless of op fidelity."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import assert_close
from vadc_tpu.io.testtensor import load_testtensor
from vadc_tpu.models import silero_v31
from vadc_tpu.models.weights import silero_v31_params, detect_model_family


@pytest.fixture(scope="module")
def v31_params(testdata):
    return silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))


def test_detect_family(testdata):
    tensors = load_testtensor(testdata / "silero_v31_16k.testtensor")
    assert detect_model_family(tensors) == "v3"


def test_forward_shapes(v31_params):
    audio = jnp.zeros((3, 1536), jnp.float32)
    h, c = silero_v31.init_state(3)
    probs, hn, cn = silero_v31.forward(v31_params, audio, h, c)
    assert probs.shape == (3,)
    assert hn.shape == (2, 3, 64) and cn.shape == (2, 3, 64)
    # silence should be classified as non-speech
    assert float(probs.max()) < 0.5


def test_full_model_vs_torch_oracle(v31_params):
    torch_oracle = pytest.importorskip("tests.torch_oracle")
    rng = np.random.default_rng(7)
    h, c = silero_v31.init_state(4)
    oh, oc = np.asarray(h), np.asarray(c)
    for step in range(3):
        audio = (rng.normal(size=(4, 1536)) * 0.1).astype(np.float32)
        probs, h, c = silero_v31.forward(v31_params, jnp.asarray(audio), h, c)
        ref_probs, oh, oc = torch_oracle.silero_v31_forward(v31_params, audio, oh, oc)
        assert_close(probs, ref_probs, 1e-3, f"probs step {step}")
        assert_close(h, oh, 1e-3, f"h step {step}")
        assert_close(c, oc, 1e-3, f"c step {step}")


def test_minibatched_vs_torch_oracle(v31_params):
    """Reference-driver semantics: batch rows are chunks of ONE stream."""
    torch_oracle = pytest.importorskip("tests.torch_oracle")
    rng = np.random.default_rng(11)
    audio = (rng.normal(size=(6, 1536)) * 0.05).astype(np.float32)
    h = jnp.zeros((2, 1, 64))
    c = jnp.zeros((2, 1, 64))
    probs, hn, cn = silero_v31.forward_minibatched(v31_params, jnp.asarray(audio), h, c)
    ref_probs, ohn, ocn = torch_oracle.silero_v31_forward(
        v31_params, audio, np.zeros((2, 1, 64), np.float32), np.zeros((2, 1, 64), np.float32),
        minibatched=True,
    )
    assert probs.shape == (6,)
    assert_close(probs, ref_probs, 1e-3, "minibatched probs")
    assert_close(hn, ohn, 1e-3, "minibatched hn")
    assert_close(cn, ocn, 1e-3, "minibatched cn")


def test_independent_streams_are_independent(v31_params):
    """Stream i's output must not depend on other streams in the batch — the
    property the reference explicitly lacks (onnx_helpers.c:146-151)."""
    rng = np.random.default_rng(3)
    audio = (rng.normal(size=(3, 1536)) * 0.1).astype(np.float32)
    h, c = silero_v31.init_state(3)
    probs_all, _, _ = silero_v31.forward(v31_params, jnp.asarray(audio), h, c)
    h1, c1 = silero_v31.init_state(1)
    probs_solo, _, _ = silero_v31.forward(v31_params, jnp.asarray(audio[1:2]), h1, c1)
    np.testing.assert_allclose(
        np.asarray(probs_all[1]), np.asarray(probs_solo[0]), atol=1e-6
    )
