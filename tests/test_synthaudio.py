"""Synthetic ground-truth audio + the front-end conditioning it exposed.

The synthaudio generator exists to give detection-accuracy evaluation an
exact ground truth (the role the reference's RED.s16le fixtures play for
test.c:1970-2196, plus labels). Building it surfaced a real numerical
hazard: Silero's adaptive normalization applies log1p(2^20 * mag) to the
STFT magnitude (reference misc.c:44), whose slope at near-zero bins
amplifies ANY rounding-floor difference into O(1) feature changes. These
tests pin both the generator's contract and that conditioning behavior
(see functional._stft_precision for the tier policy it motivated).
"""

import sys
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vadc_tpu.io.synthaudio import silence, utterance_track, voiced

REPO = Path(__file__).resolve().parent.parent


def test_utterance_track_ground_truth():
    audio, truth = utterance_track(5, seed=3)
    assert audio.dtype == np.float32
    total_s = len(audio) / 16000.0
    assert len(truth) == 5
    prev_end = 0.0
    for start, end in truth:
        assert prev_end < start < end <= total_s
        prev_end = end
    # voiced intervals carry the signal energy; gaps are near-silent
    def rms(a, b):
        seg = audio[int(a * 16000) : int(b * 16000)]
        return float(np.sqrt(np.mean(seg**2)))

    gaps = [(0.0, truth[0][0])] + [
        (truth[i][1], truth[i + 1][0]) for i in range(len(truth) - 1)
    ]
    voiced_rms = min(rms(a, b) for a, b in truth)
    gap_rms = max(rms(a, b) for a, b in gaps)
    assert voiced_rms > 20 * gap_rms


def test_voiced_breath_floor():
    """Default material carries a broadband aspiration floor; breath=0 is
    the pure-harmonic stress case. Same phase_seed -> identical harmonic
    part, so the difference IS the aspiration noise."""
    pure = voiced(0.5, 200.0, breath=0.0, amplitude=0.3)
    breathy = voiced(0.5, 200.0, amplitude=0.3)
    diff = breathy - pure
    rms = float(np.sqrt(np.mean(diff**2)))
    # envelope-shaped white noise at breath * amplitude: rms ~= level *
    # rms(env) with rms(0.5*(1+sin)) = sqrt(3/8) ~= 0.61
    assert 0.3 * 2e-3 * 0.3 < rms < 0.3 * 2e-3
    # envelope-shaped: the floor vanishes toward the piece start (clean
    # silence boundary) and follows the syllabic envelope elsewhere
    assert np.abs(diff[:40]).max() < 0.3 * 2e-3 * 0.05


def _front_end_features(params, audio, tier):
    from vadc_tpu.nn import functional as F

    with F.precision_mode(tier):
        def f(a):
            mag = F.stft_magnitude_nlc(
                a, params["stft_basis"], pad_left=128, pad_right=128, hop=64
            )
            return F.adaptive_audio_normalization_nlc(mag)

        return np.asarray(jax.jit(f)(audio), np.float64)


def test_stft_log_conditioning(testdata):
    """The mechanism behind _stft_precision, pinned at the feature level.

    * pure harmonics: inter-harmonic bins cancel to the rounding floor and
      log1p(2^20*x) turns any floor difference into O(1) feature error —
      even fp32 summation-order changes do this (the material is
      ill-conditioned; probabilities are not comparable across tiers or
      implementations on it);
    * with the aspiration floor, the fast tier's HIGH-precision STFT holds
      features tight while turbo's single-pass bf16 operand casts still
      sit above the -54 dB acoustic floor.
    """
    from vadc_tpu.io.testtensor import load_testtensor
    from vadc_tpu.models.weights import silero_v31_params

    params = silero_v31_params(
        load_testtensor(testdata / "silero_v31_16k.testtensor")
    )
    pure = jnp.asarray(voiced(1536 / 16000.0, 180.0, breath=0.0)[None, :])
    breathy = jnp.asarray(voiced(1536 / 16000.0, 180.0)[None, :])

    ref_pure = _front_end_features(params, pure, "faithful")
    ref_breathy = _front_end_features(params, breathy, "faithful")

    dev = {
        (mat, tier): np.abs(
            _front_end_features(params, aud, tier) - ref
        ).max()
        for mat, aud, ref in (
            ("pure", pure, ref_pure),
            ("breathy", breathy, ref_breathy),
        )
        for tier in ("fast", "turbo")
    }
    # pure harmonics: pathological for any bf16 floor (documented hazard)
    assert dev[("pure", "turbo")] > 1.0
    assert dev[("pure", "fast")] < dev[("pure", "turbo")]
    # realistic material: fast's HIGH STFT keeps features tight
    assert dev[("breathy", "fast")] < 0.5
    assert dev[("breathy", "fast")] < dev[("breathy", "turbo")]


def test_accuracy_eval_scoring():
    """Pure-python scorer unit checks (frame collar + segment IoU)."""
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import accuracy_eval as ae
    finally:
        sys.path.pop(0)

    truth = [(1.0, 2.0), (4.0, 5.0)]
    # exact detection scores perfectly
    r = ae.score_frames(truth, truth, 6.0, collar_s=0.2)
    assert r["frame_f1"] == 1.0
    assert r["frames_excluded_collar"] == 4 * 0.4 / 0.01
    # an edge error INSIDE the collar is forgiven...
    shifted = [(1.1, 2.1), (4.0, 5.0)]
    assert ae.score_frames(truth, shifted, 6.0, 0.2)["frame_f1"] == 1.0
    # ...but a miss beyond it is not
    late = [(1.5, 2.0), (4.0, 5.0)]
    assert ae.score_frames(truth, late, 6.0, 0.2)["frame_recall"] < 1.0

    seg = ae.score_segments(truth, [(1.05, 2.0), (3.0, 3.4), (4.0, 5.0)])
    assert seg["segments_matched"] == 2
    assert seg["segment_recall"] == 1.0
    assert seg["segment_precision"] == pytest.approx(2 / 3, abs=1e-3)
    # IoU below 0.5 does not match
    seg = ae.score_segments([(1.0, 2.0)], [(1.8, 2.8)])
    assert seg["segments_matched"] == 0
