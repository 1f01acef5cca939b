"""Segmentation state-machine tests: hysteresis, min durations, pad/merge,
EOF snap — the contract of reference vadc.c:165-299 and 1005-1027."""

import numpy as np
import pytest

from vadc_tpu.cli.segmenter import (
    SegmenterConfig,
    duration_ms_to_chunks,
    format_segment_centiseconds,
    format_segment_seconds,
    segment_probabilities,
)


def default_config(**kw):
    base = dict(
        threshold=0.5,
        neg_threshold=0.35,
        min_silence_chunks=2,
        min_speech_chunks=3,
        speech_pad_s=0.030,
        seconds_per_chunk=0.096,
    )
    base.update(kw)
    return SegmenterConfig(**base)


def test_duration_rounding():
    # reference defaults: 1536-sample chunks = 96 ms; 250 ms -> 3 chunks,
    # 200 ms -> 2 chunks (vadc.c:756-768 rounding with min 1)
    assert duration_ms_to_chunks(250.0, 96.0) == 3
    assert duration_ms_to_chunks(200.0, 96.0) == 2
    assert duration_ms_to_chunks(1.0, 96.0) == 1


def test_simple_segment():
    cfg = default_config(speech_pad_s=0.0)
    probs = [0.1] * 3 + [0.9] * 6 + [0.1] * 5
    segs = segment_probabilities(probs, cfg)
    # speech chunks 3..8, tentative end at 9, closes at 11 (2 silence chunks)
    assert segs == [(3 * 0.096, 9 * 0.096)]


def test_short_speech_discarded():
    cfg = default_config(speech_pad_s=0.0)
    probs = [0.1] * 3 + [0.9] * 2 + [0.1] * 8  # 2 chunks < min_speech 3
    assert segment_probabilities(probs, cfg) == []


def test_hysteresis_reentry_cancels_tentative_end():
    cfg = default_config(speech_pad_s=0.0)
    # dip below neg_threshold for 1 chunk (< min_silence 2), then back up
    probs = [0.9] * 4 + [0.1] + [0.9] * 4 + [0.1] * 5
    segs = segment_probabilities(probs, cfg)
    assert len(segs) == 1
    start, end = segs[0]
    assert start == 0.0
    assert end == pytest.approx(9 * 0.096)


def test_mid_band_keeps_speech_open():
    """Probabilities between neg_threshold and threshold neither trigger nor
    end a segment."""
    cfg = default_config(speech_pad_s=0.0)
    probs = [0.4] * 10  # above neg (0.35) but below threshold (0.5)
    assert segment_probabilities(probs, cfg) == []
    probs = [0.9] * 4 + [0.4] * 6 + [0.1] * 5
    segs = segment_probabilities(probs, cfg)
    assert segs[0][1] == pytest.approx(10 * 0.096)


def test_pad_and_merge():
    cfg = default_config(speech_pad_s=0.2)  # large pad forces merging
    probs = [0.9] * 5 + [0.1] * 3 + [0.9] * 5 + [0.1] * 5
    segs = segment_probabilities(probs, cfg)
    assert len(segs) == 1  # padded segments overlap -> merged
    assert segs[0][0] == 0.0


def test_eof_snap():
    cfg = default_config(speech_pad_s=0.0)
    probs = [0.1] * 2 + [0.9] * 8  # speech still open at EOF
    segs = segment_probabilities(probs, cfg)
    # snapped to last chunk index (9), reference vadc.c:1005-1027
    assert segs == [(2 * 0.096, 9 * 0.096)]


def test_eof_snap_too_short_discarded():
    cfg = default_config(speech_pad_s=0.0, min_speech_chunks=8)
    probs = [0.1] * 5 + [0.9] * 5
    assert segment_probabilities(probs, cfg) == []


def test_start_clamped_to_zero():
    cfg = default_config(speech_pad_s=1.0)
    probs = [0.9] * 5 + [0.1] * 5
    segs = segment_probabilities(probs, cfg)
    assert segs[0][0] == 0.0


def test_output_formats():
    assert format_segment_seconds(1.2345, 6.789) == "1.23,6.79"
    assert format_segment_centiseconds(1.2345, 6.789) == "123,679"


def test_vectorized_matches_host():
    """Device FSM (jnp.where over the batch) must reproduce the host FSM."""
    import jax.numpy as jnp
    from vadc_tpu.engine.vectorized_segmenter import collect_segments

    cfg = default_config()
    rng = np.random.default_rng(5)
    probs = rng.uniform(0.0, 1.0, size=(7, 200)).astype(np.float32)

    vec = collect_segments(jnp.asarray(probs), cfg)
    host = [segment_probabilities(probs[i], cfg) for i in range(probs.shape[0])]
    for i, (v, h) in enumerate(zip(vec, host)):
        assert len(v) == len(h), f"stream {i}: {v} vs {h}"
        for (vs, ve), (hs, he) in zip(v, h):
            assert vs == pytest.approx(hs, abs=1e-6)
            assert ve == pytest.approx(he, abs=1e-6)
