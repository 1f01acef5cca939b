"""Native runtime kernel tests: C++ kernels (or their numpy fallbacks) must
match the Python/host implementations exactly."""

import numpy as np
import pytest

from vadc_tpu import native
from vadc_tpu.io.pcm import s16le_to_f32 as py_s16le_to_f32
from vadc_tpu.cli.segmenter import SegmenterConfig


def test_s16le_conversion_matches_python():
    rng = np.random.default_rng(0)
    samples = rng.integers(-32768, 32768, size=100_001).astype(np.int16)
    got = native.s16le_to_f32(samples)
    want = py_s16le_to_f32(samples.tobytes())
    np.testing.assert_array_equal(got, want)


def test_frame_s16le():
    samples = np.arange(-2000, 2000, dtype=np.int16)
    frames = native.frame_s16le(samples, 1536)
    assert frames.shape == (3, 1536)
    np.testing.assert_array_equal(
        frames[0], samples[:1536].astype(np.float32) / 32768.0
    )
    # tail zero padding
    tail_valid = 4000 - 2 * 1536
    assert np.all(frames[2, tail_valid:] == 0.0)


def test_fsm_matches_host_segmenter():
    cfg = SegmenterConfig()
    rng = np.random.default_rng(7)
    probs = rng.uniform(0, 1, size=(6, 300)).astype(np.float32)

    fsm = native.NativeFsm(
        6,
        threshold=cfg.threshold,
        neg_threshold=cfg.neg_threshold,
        min_silence_chunks=cfg.min_silence_chunks,
        min_speech_chunks=cfg.min_speech_chunks,
    )
    events = fsm.feed(probs[:, :130])
    events += fsm.feed(probs[:, 130:])
    by_stream = {i: [] for i in range(6)}
    for s, a, b in events:
        by_stream[s].append((a, b))

    from vadc_tpu.cli.segmenter import FeedState

    for i in range(6):
        # scalar raw-event replay (the FSM without pad/merge)
        st = FeedState()
        raw = []
        for idx, p in enumerate(probs[i]):
            p = float(p)
            if p >= cfg.threshold and st.temp_end > 0:
                st.temp_end = 0
            if not st.triggered:
                if p >= cfg.threshold:
                    st.triggered = True
                    st.current_speech_start = idx
            elif p < cfg.neg_threshold:
                if st.temp_end == 0:
                    st.temp_end = idx
                if idx - st.temp_end >= cfg.min_silence_chunks:
                    if st.temp_end - st.current_speech_start >= cfg.min_speech_chunks:
                        raw.append((st.current_speech_start, st.temp_end))
                    st = FeedState()
        assert by_stream[i] == raw, f"stream {i}"


def test_stream_pool_pipes():
    """Feed 3 pipe streams with different amounts of PCM, including split
    writes and a partial tail chunk; the pool must deliver every chunk in
    order with the tail zero-padded."""
    import os
    import time

    if not native.available():
        pytest.skip("native library unavailable")

    chunk = 256
    rng = np.random.default_rng(0)
    audio = [
        rng.integers(-30000, 30000, size=n).astype(np.int16)
        for n in (3 * chunk, 2 * chunk + 100, 0)
    ]
    pool = native.StreamPool(3, chunk, ring_chunks=8)
    pipes = [os.pipe() for _ in range(3)]
    for i, (r, _w) in enumerate(pipes):
        pool.add_fd(i, r)
    pool.start()
    try:
        # write in awkward pieces (odd byte boundaries) from this thread
        for i, data in enumerate(audio):
            b = data.tobytes()
            w = pipes[i][1]
            for off in range(0, len(b), 701):  # odd size -> split samples
                os.write(w, b[off : off + 701])
            os.close(w)

        got = {0: [], 1: [], 2: []}
        deadline = time.time() + 5.0
        while time.time() < deadline:
            out, ready, count, _ = pool.gather()
            for i in range(3):
                if ready[i]:
                    got[i].append(out[i].copy())
            if all(pool.stream_done(i) for i in range(3)):
                break
            time.sleep(0.005)

        for i, data in enumerate(audio):
            expect = np.zeros(-(-len(data) // chunk) * chunk if len(data) else 0,
                              np.int16)
            expect[: len(data)] = data  # gather returns RAW s16 since r5
            got_flat = np.concatenate(got[i]) if got[i] else np.zeros(0, np.int16)
            np.testing.assert_array_equal(got_flat, expect, err_msg=f"stream {i}")
    finally:
        pool.close()
        for r, _ in pipes:
            os.close(r)


def test_stream_pool_multiple_reader_threads():
    """Streams sharded over several reader threads deliver every stream's
    bytes intact and in order (index-sharded pollers must not cross wires)."""
    import os
    import time

    if not native.available():
        pytest.skip("native library unavailable")

    chunk = 128
    n = 5
    rng = np.random.default_rng(3)
    audio = [
        rng.integers(-30000, 30000, size=(7 + i) * chunk + 13 * i).astype(np.int16)
        for i in range(n)
    ]
    pool = native.StreamPool(n, chunk, ring_chunks=4, reader_threads=3)
    pipes = [os.pipe() for _ in range(n)]
    for i, (r, _w) in enumerate(pipes):
        pool.add_fd(i, r)
    pool.start()
    try:
        for i, data in enumerate(audio):
            os.write(pipes[i][1], data.tobytes())
            os.close(pipes[i][1])
        got = {i: [] for i in range(n)}
        deadline = time.time() + 5.0
        while time.time() < deadline:
            out, ready, _, _ = pool.gather()
            for i in range(n):
                if ready[i]:
                    got[i].append(out[i].copy())
            if all(pool.stream_done(i) for i in range(n)):
                break
            time.sleep(0.002)
        for i, data in enumerate(audio):
            expect = np.zeros(-(-len(data) // chunk) * chunk, np.int16)
            expect[: len(data)] = data
            np.testing.assert_array_equal(
                np.concatenate(got[i]), expect, err_msg=f"stream {i}"
            )
    finally:
        pool.close()
        for r, _ in pipes:
            os.close(r)


def test_stream_pool_ring_overflow_eof():
    """EOF arriving while the tiny ring is full: the pool caps each read to
    free ring space (backpressure, no staging buffer since the r4 direct-
    to-ring rewrite), so the remaining bytes must keep draining in whole
    chunks AFTER EOF until only the zero-padded tail is left (regression:
    the old staging-buffer drain overflowed the gather row here)."""
    import os
    import time

    if not native.available():
        pytest.skip("native library unavailable")

    chunk = 256
    data = np.arange(10 * chunk + 100, dtype=np.int16)
    pool = native.StreamPool(1, chunk, ring_chunks=2)  # tiny ring
    r, w = os.pipe()
    pool.add_fd(0, r)
    pool.start()
    try:
        os.write(w, data.tobytes())
        os.close(w)
        got = []
        deadline = time.time() + 5
        while time.time() < deadline:
            out, ready, _, _ = pool.gather()
            if ready[0]:
                got.append(out[0].copy())
            if pool.stream_done(0):
                break
            time.sleep(0.002)
        flat = np.concatenate(got)
        expect = np.zeros(11 * chunk, np.int16)
        expect[: len(data)] = data
        np.testing.assert_array_equal(flat, expect)
    finally:
        pool.close()
        os.close(r)


def test_fsm_active_mask():
    """Streams masked inactive must not advance state or chunk counters."""
    fsm = native.NativeFsm(
        2, threshold=0.5, neg_threshold=0.35, min_silence_chunks=2, min_speech_chunks=3
    )
    speech = np.array([[0.9], [0.9]], np.float32)
    silence = np.zeros((2, 1), np.float32)
    for _ in range(6):
        fsm.feed(speech, active=np.array([1, 0], np.uint8))
    events = []
    for _ in range(4):
        events += fsm.feed(silence, active=np.array([1, 0], np.uint8))
    assert events == [(0, 0, 6)]
    np.testing.assert_array_equal(fsm.chunk_index, [10, 0])


def test_fsm_state_carries_across_slabs():
    cfg = SegmenterConfig(speech_pad_s=0.0)
    probs = np.zeros((1, 20), np.float32)
    probs[0, 3:9] = 0.9  # speech 3..8, closes at 9+min_silence
    fsm = native.NativeFsm(
        1,
        threshold=cfg.threshold,
        neg_threshold=cfg.neg_threshold,
        min_silence_chunks=cfg.min_silence_chunks,
        min_speech_chunks=cfg.min_speech_chunks,
    )
    # split right inside the speech run
    ev = fsm.feed(probs[:, :5])
    assert ev == []
    ev = fsm.feed(probs[:, 5:])
    assert ev == [(0, 3, 9)]


def test_full_ring_does_not_busy_spin():
    """A backpressured stream (ring full, fd still readable) must not spin
    a reader thread at 100% CPU: the poll set skips full-ring streams and
    re-checks on the 10 ms poll cadence."""
    import os
    import time

    if not native.available():
        pytest.skip("native library unavailable")
    chunk = 256
    pool = native.StreamPool(1, chunk, ring_chunks=2)
    r, w = os.pipe()
    pool.add_fd(0, r)
    pool.start()
    try:
        # fill the ring and leave plenty buffered in the pipe (level-
        # triggered POLLIN stays set the whole time)
        os.write(w, np.zeros(10 * chunk, np.int16).tobytes())
        time.sleep(0.2)
        t0 = time.process_time()
        time.sleep(1.0)
        cpu = time.process_time() - t0
        # a spinning reader burns ~1.0 s of CPU here; the fixed pool's
        # wakeups cost a few ms
        assert cpu < 0.5, f"reader busy-spin: {cpu:.2f}s CPU in 1s wall"
    finally:
        pool.close()
        os.close(w)
        os.close(r)


def test_gather_backlog_counts_queued_streams():
    """gather()'s backlog = streams that still hold a completed chunk AFTER
    the drain — the engine's catch-up-tick trigger. A stream with 3 queued
    chunks reports backlog through two drains and none on the third; a
    stream that is merely on cadence (one chunk at a time) never does."""
    import os
    import time

    if not native.available():
        pytest.skip("native library unavailable")
    chunk = 256
    pool = native.StreamPool(2, chunk, ring_chunks=8)
    pipes = [os.pipe() for _ in range(2)]
    for i, (r, _w) in enumerate(pipes):
        pool.add_fd(i, r)
    pool.start()
    try:
        rng = np.random.default_rng(7)
        # stream 0: 3 chunks at once (a backlogged / faster-than-realtime
        # client); stream 1: exactly one chunk (on cadence)
        os.write(pipes[0][1], rng.integers(-100, 100, 3 * chunk)
                 .astype(np.int16).tobytes())
        os.write(pipes[1][1], rng.integers(-100, 100, chunk)
                 .astype(np.int16).tobytes())
        deadline = time.time() + 5.0
        while time.time() < deadline:
            # wait for the readers to frame everything before judging
            _, _, count, backlog = pool.gather()
            if count == 2:
                break
            time.sleep(0.005)
        assert count == 2
        assert backlog == 1, "only stream 0 still has chunks queued"
        _, _, count, backlog = pool.gather()
        assert count == 1 and backlog == 1  # stream 0: 1 drained, 1 left
        _, _, count, backlog = pool.gather()
        assert count == 1 and backlog == 0  # last queued chunk, none behind
        _, _, count, backlog = pool.gather()
        assert count == 0 and backlog == 0
    finally:
        pool.close()
        for r, w in pipes:
            os.close(r)
            os.close(w)
