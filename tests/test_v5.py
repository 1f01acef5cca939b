"""Silero v5 architecture tests.

No official v5 weights exist in this environment (the reference exports them
offline from the upstream jit model, silero_vad.py:380-392), so the v5
forward is validated against an independent torch oracle with random weights,
and the 64-sample context-carry semantics are tested against the reference's
chunking contract (utils.py:277-283, vadc.c:105-162)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.conftest import assert_close
from vadc_tpu.models import silero_v5
from vadc_tpu.models.synthetic import random_v5_archive
from vadc_tpu.models.weights import detect_model_family
from vadc_tpu.io.testtensor import load_testtensor_bytes, save_testtensor_bytes




@pytest.fixture(scope="module")
def v5_params():
    return silero_v5.silero_v5_params(random_v5_archive())


def test_family_detection():
    archive = random_v5_archive()
    assert detect_model_family(archive) == "v5"
    # round-trips through the testtensor format
    back = load_testtensor_bytes(save_testtensor_bytes(archive))
    assert detect_model_family(back) == "v5"


def test_forward_shapes(v5_params):
    audio = jnp.zeros((3, 576), jnp.float32)  # 64 context + 512 window
    h, c = silero_v5.init_state(3)
    probs, hn, cn = silero_v5.forward(v5_params, audio, h, c)
    assert probs.shape == (3,)
    assert hn.shape == (1, 3, 128) and cn.shape == (1, 3, 128)


def test_encoder_frame_count(v5_params):
    # 576 samples -> pad 64 -> 640 -> (640-256)/128+1 = 4 STFT frames
    # -> strides 1,2,2,1 -> 4,2,1,1 frames; channels-last layout
    feats = silero_v5.encode(v5_params, jnp.zeros((1, 576), jnp.float32))
    assert feats.shape == (1, 1, 128)


def test_vs_torch_oracle(v5_params):
    torch_oracle = pytest.importorskip("tests.torch_oracle")
    rng = np.random.default_rng(31)
    h, c = silero_v5.init_state(2)
    oh, oc = np.asarray(h), np.asarray(c)
    for step in range(3):
        audio = (rng.normal(size=(2, 576)) * 0.1).astype(np.float32)
        probs, h, c = silero_v5.forward(v5_params, jnp.asarray(audio), h, c)
        ref_probs, oh, oc = torch_oracle.silero_v5_forward(v5_params, audio, oh, oc)
        assert_close(probs, ref_probs, 1e-3, f"v5 probs step {step}")
        assert_close(c, oc, 1e-3, f"v5 c step {step}")


def test_attach_context():
    chunks = jnp.arange(2 * 512, dtype=jnp.float32).reshape(2, 512)
    ctx = jnp.full((2, 64), -1.0)
    inp, new_ctx = silero_v5.attach_context(chunks, ctx)
    assert inp.shape == (2, 576)
    np.testing.assert_array_equal(np.asarray(inp[:, :64]), np.asarray(ctx))
    np.testing.assert_array_equal(np.asarray(inp[:, 64:]), np.asarray(chunks))
    np.testing.assert_array_equal(np.asarray(new_ctx), np.asarray(chunks[:, -64:]))


def test_minibatch_context_chaining(v5_params):
    """The windowed v5 driver must prefix chunk i with chunk i-1's tail —
    equivalent to unfolding the padded continuous stream (utils.py:277-283)."""
    from vadc_tpu.engine.runner import MinibatchRunner

    rng = np.random.default_rng(5)
    stream = (rng.normal(size=6 * 512) * 0.1).astype(np.float32)
    runner = MinibatchRunner("v5", v5_params, batch_size=3, chunk_samples=512)
    probs = runner.process_window(stream[: 3 * 512]) + runner.process_window(
        stream[3 * 512 :]
    )

    # reference semantics: pad 64 zeros at the front, unfold into 576-sample
    # windows with hop 512, run as one minibatched sequence
    padded = np.concatenate([np.zeros(64, np.float32), stream])
    windows = np.stack([padded[i * 512 : i * 512 + 576] for i in range(6)])
    h = jnp.zeros((1, 1, 128))
    c = jnp.zeros((1, 1, 128))
    ref_probs, _, _ = silero_v5.forward_minibatched(
        v5_params, jnp.asarray(windows), h, c
    )
    assert_close(np.asarray(probs), np.asarray(ref_probs), 1e-5, "v5 windows")


def test_scan_context_matches_steps(v5_params):
    """StreamRunner's scan must carry the v5 audio context identically to
    explicit per-step attach_context calls."""
    from vadc_tpu.engine.runner import StreamRunner

    rng = np.random.default_rng(6)
    chunks = jnp.asarray((rng.normal(size=(2, 4, 512)) * 0.1).astype(np.float32))
    runner = StreamRunner("v5", v5_params)
    probs_scan, state_scan = runner.scan(chunks, runner.init_state(2))

    state = runner.init_state(2)
    outs = []
    for t in range(4):
        p, state = runner.step(chunks[:, t], state)
        outs.append(p)
    probs_loop = jnp.stack(outs, axis=1)
    assert_close(probs_scan, probs_loop, 1e-6, "v5 scan vs steps")
    assert_close(state_scan.context, state.context, 0, "v5 context")
