"""Cross-implementation segmentation fuzz: all three FSM backends must agree.

The hysteresis FSM is the CLI's user-facing contract (reference
vadc.c:165-299) and exists three times: the scalar host Segmenter, the
on-device vectorized lax.scan, and the native C++ kernel. The targeted
tests pin each transition once; this file fuzzes the space where
branch-order mistakes actually live — random configs crossed with
boundary-heavy probability streams whose values sit ON and within 1e-6 of
the thresholds, in runs long enough to cross the min_silence / min_speech
counters.

Thresholds are snapped to float32-representable values so equality cases
order identically in the host's f64 comparisons, the device's f32, and the
C++ kernel's float.
"""

from __future__ import annotations

import numpy as np
import pytest

from vadc_tpu import native
from vadc_tpu.cli.segmenter import (
    Segmenter,
    SegmenterConfig,
    segment_probabilities,
)
from vadc_tpu.engine.vectorized_segmenter import BatchSegmenter

N_CONFIGS = 12
N_STREAMS = 6
T = 400


def random_config(rng) -> SegmenterConfig:
    thr = float(np.float32(rng.uniform(0.25, 0.75)))
    rel = float(np.float32(rng.uniform(0.05, 0.2)))
    return SegmenterConfig(
        threshold=thr,
        neg_threshold=float(np.float32(thr - rel)),
        min_silence_chunks=int(rng.integers(1, 6)),
        min_speech_chunks=int(rng.integers(1, 7)),
        speech_pad_s=float(rng.choice([0.0, 0.01, 0.03, 0.2])),
        seconds_per_chunk=float(rng.choice([0.032, 0.096])),
    )


def boundary_probs(rng, cfg: SegmenterConfig, n_streams: int, t: int) -> np.ndarray:
    eps = np.float32(1e-6)
    thr = np.float32(cfg.threshold)
    neg = np.float32(cfg.neg_threshold)
    palette = np.array(
        [0.0, neg - eps, neg, neg + eps, (neg + thr) / 2, thr - eps, thr, thr + eps, 1.0],
        np.float32,
    )
    out = np.empty((n_streams, t), np.float32)
    for i in range(n_streams):
        pos = 0
        while pos < t:
            v = palette[rng.integers(len(palette))]
            run = int(rng.geometric(0.35))
            out[i, pos : pos + run] = v
            pos += run
    return out


def _host_segments(probs: np.ndarray, cfg: SegmenterConfig):
    return [segment_probabilities(probs[i], cfg) for i in range(probs.shape[0])]


def _assert_same(a, b, label: str):
    assert len(a) == len(b), f"{label}: {len(a)} vs {len(b)} streams"
    for i, (sa, sb) in enumerate(zip(a, b)):
        assert len(sa) == len(sb), f"{label} stream {i}: {sa} vs {sb}"
        for (s1, e1), (s2, e2) in zip(sa, sb):
            assert s1 == pytest.approx(s2, abs=1e-6), f"{label} stream {i}"
            assert e1 == pytest.approx(e2, abs=1e-6), f"{label} stream {i}"


@pytest.mark.parametrize("backend", ["device", "native"])
def test_backends_match_host_random_configs(backend):
    if backend == "native" and not native.available():
        pytest.skip("native kernel unavailable")
    rng = np.random.default_rng(2024)
    for trial in range(N_CONFIGS):
        cfg = random_config(rng)
        probs = boundary_probs(rng, cfg, N_STREAMS, T)
        host = _host_segments(probs, cfg)

        seg = BatchSegmenter(cfg, N_STREAMS, backend=backend)
        # random slab partition: the incremental path must be split-invariant
        cuts = np.sort(rng.choice(np.arange(1, T), size=3, replace=False))
        pos = 0
        for cut in [*cuts, T]:
            if cut > pos:
                seg.feed(probs[:, pos:cut])
            pos = cut
        got = seg.finish()
        _assert_same(got, host, f"{backend} trial {trial} cfg={cfg}")


def test_checkpoint_resume_equivalence_fuzz():
    """Stop/save/load/resume at a random chunk — including between a
    segment close and its pad/merge emission — must emit exactly what an
    uninterrupted run would (SURVEY §5.4)."""
    rng = np.random.default_rng(77)
    for trial in range(N_CONFIGS):
        cfg = random_config(rng)
        probs = boundary_probs(rng, cfg, 1, T)[0]
        straight = segment_probabilities(probs, cfg)

        cut = int(rng.integers(1, T))
        first = Segmenter(cfg)
        out = []
        for p in probs[:cut]:
            out.extend(first.feed(float(p)))
        snapshot = first.state_dict()

        second = Segmenter(cfg)
        second.load_state_dict(snapshot)
        for p in probs[cut:]:
            out.extend(second.feed(float(p)))
        out.extend(second.finish())
        assert out == straight, f"trial {trial} cut={cut} cfg={cfg}"


@pytest.mark.parametrize("backend", ["device", "native"])
def test_padded_grid_matches_scalar_on_valid_prefix(backend):
    """Zero-padded batch grids: finish(valid_chunks) must reproduce the
    scalar segmenter fed ONLY each stream's real prefix. Regression: a
    close confirmed by padding chunks used the mid-stream close rules
    (end=temp_end, >= length test) instead of the reference's EOF snap
    (end=last_chunk, strict >), emitting spurious or shortened segments."""
    if backend == "native" and not native.available():
        pytest.skip("native kernel unavailable")
    rng = np.random.default_rng(77)
    for trial in range(N_CONFIGS):
        cfg = random_config(rng)
        t_grid = 120
        probs = boundary_probs(rng, cfg, N_STREAMS, t_grid)
        valid = rng.integers(1, t_grid + 1, size=N_STREAMS)
        padded = probs.copy()
        for i in range(N_STREAMS):
            # ADVERSARIAL padding (not the benign near-zero model output on
            # zero audio): the masking must make pad chunks invisible to
            # the FSM no matter their value
            padded[i, valid[i]:] = rng.uniform(0, 1, t_grid - valid[i])
        host = [
            segment_probabilities(probs[i, : valid[i]], cfg)
            for i in range(N_STREAMS)
        ]
        seg = BatchSegmenter(cfg, N_STREAMS, backend=backend, valid_chunks=valid)
        seg.feed(padded)
        got = seg.finish(valid_chunks=valid)
        _assert_same(got, host, f"{backend} padded trial {trial} cfg={cfg}")
