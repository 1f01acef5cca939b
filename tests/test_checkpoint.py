"""Checkpoint/resume tests: serialized engine state must resume streams with
bit-identical continuation."""

import numpy as np
import jax.numpy as jnp
import pytest

from vadc_tpu.io.testtensor import load_testtensor
from vadc_tpu.models.weights import silero_v31_params
from vadc_tpu.engine.runner import StreamRunner
from vadc_tpu.engine.checkpoint import EngineCheckpoint
from vadc_tpu.engine.vectorized_segmenter import init_fsm_state


@pytest.fixture(scope="module")
def v31_params(testdata):
    return silero_v31_params(load_testtensor(testdata / "silero_v31_16k.testtensor"))


def test_roundtrip_v3(v31_params):
    runner = StreamRunner("v3", v31_params)
    rng = np.random.default_rng(0)
    chunks = jnp.asarray(rng.normal(size=(3, 2, 1536)).astype(np.float32) * 0.1)
    _, state = runner.scan(chunks, runner.init_state(3))

    ckpt = EngineCheckpoint("v3", state, init_fsm_state(3), chunk_index=2)
    back = EngineCheckpoint.from_bytes(ckpt.to_bytes())
    assert back.family == "v3"
    assert back.chunk_index == 2
    np.testing.assert_array_equal(np.asarray(back.model_state.h), np.asarray(state.h))
    np.testing.assert_array_equal(np.asarray(back.model_state.c), np.asarray(state.c))
    assert back.model_state.context is None


def test_resume_continues_identically(v31_params, tmp_path):
    runner = StreamRunner("v3", v31_params)
    rng = np.random.default_rng(1)
    chunks = jnp.asarray(rng.normal(size=(2, 4, 1536)).astype(np.float32) * 0.1)

    # run all 4 chunks straight
    probs_full, _ = runner.scan(chunks, runner.init_state(2))

    # run 2, checkpoint to disk, reload, run remaining 2
    _, mid_state = runner.scan(chunks[:, :2], runner.init_state(2))
    path = tmp_path / "state.ckpt"
    EngineCheckpoint("v3", mid_state, chunk_index=2).save(path)
    resumed = EngineCheckpoint.load(path)
    probs_rest, _ = runner.scan(chunks[:, 2:], resumed.model_state)

    np.testing.assert_array_equal(
        np.asarray(probs_full[:, 2:]), np.asarray(probs_rest)
    )


def test_v5_context_roundtrip():
    from tests.test_v5 import random_v5_archive
    from vadc_tpu.models.silero_v5 import silero_v5_params

    params = silero_v5_params(random_v5_archive())
    runner = StreamRunner("v5", params)
    rng = np.random.default_rng(2)
    chunks = jnp.asarray(rng.normal(size=(2, 3, 512)).astype(np.float32) * 0.1)
    _, state = runner.scan(chunks, runner.init_state(2))

    back = EngineCheckpoint.from_bytes(
        EngineCheckpoint("v5", state, chunk_index=3).to_bytes()
    )
    np.testing.assert_array_equal(
        np.asarray(back.model_state.context), np.asarray(state.context)
    )


def test_batch_segmenter_slabbed_matches_oneshot():
    from vadc_tpu.engine.vectorized_segmenter import BatchSegmenter, collect_segments
    from vadc_tpu.cli.segmenter import SegmenterConfig

    cfg = SegmenterConfig()
    rng = np.random.default_rng(3)
    probs = rng.uniform(0, 1, size=(5, 120)).astype(np.float32)

    one = collect_segments(jnp.asarray(probs), cfg)

    seg = BatchSegmenter(cfg, 5)
    for off in range(0, 120, 17):  # uneven slabs
        seg.feed(jnp.asarray(probs[:, off : off + 17]))
    slabbed = seg.finish()
    assert slabbed == one


def test_batch_segmenter_valid_clamp():
    from vadc_tpu.engine.vectorized_segmenter import BatchSegmenter
    from vadc_tpu.cli.segmenter import SegmenterConfig, segment_probabilities

    cfg = SegmenterConfig(speech_pad_s=0.0)
    # stream 0: speech chunks 2..7 then zero padding; valid = 8
    probs = np.zeros((1, 20), np.float32)
    probs[0, 2:8] = 0.9
    seg = BatchSegmenter(cfg, 1)
    seg.feed(jnp.asarray(probs))
    got = seg.finish(valid_chunks=[8])
    # host reference on the unpadded stream
    ref = segment_probabilities(probs[0, :8], cfg)
    assert got[0] == ref
