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
    from vadc_tpu.models.synthetic import random_v5_archive
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


def _speech_probs():
    """Probability script producing TWO raw segments whose padded ranges
    merge: chunks 2-7 speech, 8-11 silence (closes seg 1 -> held pending),
    12-17 speech, silence to the end (closes seg 2, which merges with the
    held one at pad/merge time)."""
    probs = np.zeros(30, np.float32)
    probs[2:8] = 0.9
    probs[12:18] = 0.9
    return probs


def test_segmenter_resume_between_close_and_merge():
    """Stopping AFTER a segment closes (held as the pending merge candidate)
    and BEFORE the next segment arrives must neither drop nor double-emit
    the held segment (SURVEY §5.4: the buffered pending segment is part of
    resumable state; reference vadc.c:831)."""
    from vadc_tpu.cli.segmenter import Segmenter, SegmenterConfig

    cfg = SegmenterConfig(speech_pad_s=0.3)  # wide pad: the two segments merge
    probs = _speech_probs()

    ref = Segmenter(cfg)
    expected = []
    for p in probs:
        expected.extend(ref.feed(float(p)))
    expected.extend(ref.finish())
    assert len(expected) == 1  # the two raw segments merged into one

    # stop at chunk 11: segment 1 closed at chunk 10 and is now pending
    first = Segmenter(cfg)
    got = []
    for p in probs[:11]:
        got.extend(first.feed(float(p)))
    state = first.state_dict()
    assert state["pending"] is not None, "test must stop with a held segment"

    second = Segmenter(cfg)
    second.load_state_dict(state)
    for p in probs[11:]:
        got.extend(second.feed(float(p)))
    got.extend(second.finish())
    assert got == expected


def test_segmenter_state_dict_roundtrip_fields():
    from vadc_tpu.cli.segmenter import Segmenter, SegmenterConfig

    seg = Segmenter(SegmenterConfig())
    for p in [0.9, 0.9, 0.9, 0.9, 0.1, 0.1]:
        list(seg.feed(p))
    d = seg.state_dict()
    other = Segmenter(SegmenterConfig())
    other.load_state_dict(d)
    assert other.state == seg.state
    assert other.chunk_index == seg.chunk_index
    assert other._pending == seg._pending


@pytest.mark.parametrize("backend", ["device", "native"])
def test_batch_segmenter_checkpoint_mid_stream(backend):
    """BatchSegmenter: accumulated raw segments and FSM state survive a
    save/restore; resumed output equals the uninterrupted run, including a
    segment closed before the stop that merges with one closed after."""
    from vadc_tpu import native
    from vadc_tpu.cli.segmenter import SegmenterConfig
    from vadc_tpu.engine.vectorized_segmenter import BatchSegmenter
    from vadc_tpu.engine.checkpoint import EngineCheckpoint
    from vadc_tpu.engine.runner import init_stream_state

    if backend == "native" and not native.available():
        pytest.skip("native library not built")

    cfg = SegmenterConfig(speech_pad_s=0.3)
    probs = np.stack([_speech_probs(), _speech_probs()[::-1].copy()])

    ref = BatchSegmenter(cfg, 2, backend=backend)
    ref.feed(probs)
    expected = ref.finish()

    first = BatchSegmenter(cfg, 2, backend=backend)
    first.feed(probs[:, :11])
    assert any(first._raw), "test must stop with an accumulated raw segment"
    ckpt = EngineCheckpoint.capture("v3", init_stream_state("v3", 2), first)
    restored = EngineCheckpoint.from_bytes(ckpt.to_bytes())

    second = BatchSegmenter(cfg, 2, backend=backend)
    restored.restore_segmenter(second)
    second.feed(probs[:, 11:])
    assert second.finish() == expected


def test_sharded_checkpoint_resume_on_mesh(v31_params, tmp_path):
    """Sharded engine checkpointing (VERDICT r3 item 4): save/restore a
    MultiHostStreamEngine's globally-sharded state by per-process
    addressable shards on the 8-virtual-device mesh; the resumed
    continuation is bit-identical, and the segmenter state rides along."""
    from vadc_tpu.cli.segmenter import SegmenterConfig
    from vadc_tpu.engine import checkpoint as ckpt_mod
    from vadc_tpu.engine.distributed import MultiHostStreamEngine
    from vadc_tpu.engine.vectorized_segmenter import BatchSegmenter

    engine = MultiHostStreamEngine("v3", v31_params)
    n = 16
    rng = np.random.default_rng(4)
    head = (rng.normal(size=(n, 2, 1536)) * 0.1).astype(np.float32)
    tail = (rng.normal(size=(n, 2, 1536)) * 0.1).astype(np.float32)

    state = engine.init_state(n)
    probs, state = engine.scan(head, state)
    seg = BatchSegmenter(SegmenterConfig(), n)
    seg.feed(probs)

    prefix = tmp_path / "ckpt"
    path = ckpt_mod.save_sharded(engine, state, prefix, segmenter=seg)
    assert path.name == "ckpt.proc0of1.testtensor"
    live, _ = engine.scan(tail, state)  # donates state

    restored_state, ckpt = ckpt_mod.load_sharded(engine, prefix)
    assert ckpt.family == "v3"
    seg2 = BatchSegmenter(SegmenterConfig(), n)
    ckpt.restore_segmenter(seg2)
    assert seg2._raw == seg._raw
    resumed, _ = engine.scan(tail, restored_state)
    np.testing.assert_array_equal(resumed, live)

    # layout mismatch is a one-line diagnosis, not a silent misassignment
    class _OtherLayout:
        process_id, n_processes = 0, 4
    with pytest.raises(FileNotFoundError, match="saved layout differs"):
        ckpt_mod.load_sharded(_OtherLayout(), prefix)


def test_checkpoint_refuses_nonaddressable_state(v31_params):
    """A globally-sharded state that reaches EngineCheckpoint directly (not
    via local_state) must raise the pointed diagnosis, not XLA's opaque
    error. Simulated: a stand-in array reporting is_fully_addressable=False
    (single-process CPU cannot create a truly non-addressable array)."""
    from vadc_tpu.engine.checkpoint import EngineCheckpoint
    from vadc_tpu.engine.runner import init_stream_state

    class _Global:
        is_fully_addressable = False

    state = init_stream_state("v3", 2)
    state.h = _Global()
    with pytest.raises(ValueError, match="save_sharded"):
        EngineCheckpoint("v3", state).to_bytes()


def test_pending_segments_roundtrip():
    from vadc_tpu.engine.checkpoint import EngineCheckpoint
    from vadc_tpu.engine.runner import init_stream_state

    ckpt = EngineCheckpoint(
        "v3",
        init_stream_state("v3", 3),
        pending=[None, (5, 9), (0, 2)],
        chunk_indices=np.asarray([7, 9, 11], np.int32),
    )
    back = EngineCheckpoint.from_bytes(ckpt.to_bytes())
    assert back.pending == [None, (5, 9), (0, 2)]
    np.testing.assert_array_equal(back.chunk_indices, [7, 9, 11])


def test_sendbuf_roundtrip():
    """Rendered-but-unsent serving output bytes (per-slot outbox under
    client backpressure) survive the checkpoint container, including empty
    slots and a partial-line suffix."""
    from vadc_tpu.engine.checkpoint import EngineCheckpoint
    from vadc_tpu.engine.runner import init_stream_state

    bufs = [b"", b"1.99,5.12\n6.98,10.21\n", b",5.12\n"]  # [2]: head suffix
    ckpt = EngineCheckpoint("v3", init_stream_state("v3", 3), sendbuf=bufs)
    back = EngineCheckpoint.from_bytes(ckpt.to_bytes())
    assert back.sendbuf == bufs
    # absent field stays absent (older checkpoints load unchanged)
    plain = EngineCheckpoint("v3", init_stream_state("v3", 3))
    assert EngineCheckpoint.from_bytes(plain.to_bytes()).sendbuf is None


def test_checkpoint_refuses_counters_beyond_float32_exact(v31_params):
    """The .testtensor container stores integer state as float32, exact only
    below 2^24 (~18.6 days of 96 ms chunks). Saving past that bound must
    raise loudly instead of silently rounding a counter and corrupting the
    resumed stream's timeline."""
    runner = StreamRunner("v3", v31_params)
    state = runner.init_state(1)
    EngineCheckpoint("v3", state, chunk_index=2**24 - 1).to_bytes()  # ok
    with pytest.raises(ValueError, match="2\\^24"):
        EngineCheckpoint("v3", state, chunk_index=2**24).to_bytes()
