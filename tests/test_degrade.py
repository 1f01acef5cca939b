"""Degradation/confuser transforms (io/degrade.py) and the robustness
matrix they feed (tools/accuracy_eval.py --degradation_matrix).

Each transform is pinned on its signal-level contract (label safety,
calibration, codec fidelity against independent oracles), then a small
end-to-end matrix asserts the detector holds up on mildly degraded
channels — the claim the clean-material tests alone cannot make."""

import sys
from pathlib import Path

import numpy as np
import pytest

from vadc_tpu.io import degrade
from vadc_tpu.io.synthaudio import utterance_track, voiced

REPO = Path(__file__).resolve().parent.parent


def test_g711_roundtrip_matches_audioop_oracle():
    """Cross-check against the classic companding encoder (audioop, the
    independent stdlib oracle). audioop quantizes by segment arithmetic
    (truncating), ours by nearest decoded value — so the contract is:
    our decoded value is never FARTHER from the input than audioop's, and
    the two agree on the vast majority of samples."""
    audioop = pytest.importorskip("audioop")
    rng = np.random.default_rng(0)
    x = np.clip(rng.normal(size=4000) * 0.3, -1, 1).astype(np.float32)
    lin = (np.round(x * 32768).clip(-32768, 32767)).astype("<i2").tobytes()
    for law, enc in (("mu", audioop.lin2ulaw), ("a", audioop.lin2alaw)):
        ours = degrade.g711_roundtrip(x, law=law)
        ref_codes = np.frombuffer(enc(lin, 2), np.uint8)
        from vadc_tpu.io.wav import _ALAW_F32, _ULAW_F32

        table = _ULAW_F32 if law == "mu" else _ALAW_F32
        ref = table[ref_codes]
        ours_err = np.abs(ours - x)
        ref_err = np.abs(ref - x)
        assert (ours_err <= ref_err + 2e-5).all(), law  # nearest-code optimality
        assert np.mean(ours == ref) > 0.9, (law, float(np.mean(ours == ref)))


def test_g711_roundtrip_snr():
    """Companding SNR on speech-level material is ~35+ dB — audible but
    label-safe."""
    x = voiced(1.0, 150.0)
    for law in ("mu", "a"):
        y = degrade.g711_roundtrip(x, law=law)
        snr = 10 * np.log10(np.mean(x**2) / np.mean((y - x) ** 2))
        assert snr > 30.0, (law, snr)


def test_adpcm_roundtrip_snr():
    """IMA ADPCM is the harshest codec in the matrix; on speech-like
    material the 4-bit recurrence still tracks within ~20 dB."""
    x = voiced(1.0, 150.0)
    y = degrade.adpcm_roundtrip(x)
    assert y.shape == x.shape
    snr = 10 * np.log10(np.mean(x**2) / np.mean((y - x) ** 2))
    assert snr > 15.0, snr


def test_adpcm_roundtrip_decoded_by_production_recurrence():
    """The decode side IS io/wav's vectorized _ima_expand — encode a ramp,
    assert the decoded staircase is monotonic and close."""
    x = np.linspace(-0.5, 0.5, 2000).astype(np.float32)
    y = degrade.adpcm_roundtrip(x)
    assert float(np.abs(y - x).max()) < 0.05
    assert (np.diff(y[100:-100]) >= -0.02).all()


def test_bandlimit_kills_out_of_band_energy():
    sr = 16000
    t = np.arange(sr) / sr
    x = (np.sin(2 * np.pi * 100 * t) + np.sin(2 * np.pi * 1000 * t)
         + np.sin(2 * np.pi * 6000 * t)).astype(np.float32)
    y = degrade.bandlimit(x, sr, 300.0, 3400.0)
    spec = np.abs(np.fft.rfft(y))
    f = np.fft.rfftfreq(len(y), 1 / sr)

    def band_power(lo, hi):
        return float(np.sum(spec[(f >= lo) & (f < hi)] ** 2))

    in_band = band_power(900, 1100)
    assert band_power(0, 200) < 1e-6 * in_band
    assert band_power(5000, 7000) < 1e-6 * in_band
    assert in_band > 0


def test_clip_preserves_peak_and_distorts():
    x = voiced(0.5, 150.0)
    y = degrade.clip(x, 0.25)
    assert abs(float(np.abs(y).max()) - float(np.abs(x).max())) < 1e-6
    # flat tops: many samples pinned at the new peak
    pinned = np.mean(np.abs(y) > 0.999 * np.abs(y).max())
    assert pinned > 0.05


def test_reverb_label_safety_and_tail():
    """Same length (labels aligned), energy appears after the dry signal
    stops (the decay tail), no clipping."""
    sr = 16000
    x = np.zeros(sr, np.float32)
    x[: sr // 4] = voiced(0.25, 150.0)
    y = degrade.reverb(x, sr, 0.4, seed=1)
    assert y.shape == x.shape
    assert float(np.abs(y).max()) <= 1.0
    tail = y[sr // 4 + sr // 10 :]
    assert float(np.mean(tail**2)) > 1e-6  # reverberant energy persists


def test_mix_background_snr_calibration():
    audio, truth = utterance_track(3, seed=7)
    bg = degrade.babble(5.0, seed=3)
    mixed = degrade.mix_background(audio, truth, bg, 10.0, 16000)
    mask = np.zeros(len(audio), bool)
    for s, e in truth:
        mask[int(s * 16000) : int(e * 16000)] = True
    p_sig = np.mean(audio[mask] ** 2)
    p_bg = np.mean((mixed - audio) ** 2)
    assert abs(10 * np.log10(p_sig / p_bg) - 10.0) < 0.2


def test_mix_background_empty_truth_is_finite():
    # no labeled speech -> calibrate against whole-track power instead of
    # NaN-poisoning the mix (np.mean of an empty slice is NaN)
    rng = np.random.default_rng(11)
    audio = (rng.standard_normal(16000) * 0.05).astype(np.float32)
    bg = degrade.babble(1.0, seed=2)
    mixed = degrade.mix_background(audio, [], bg, 10.0, 16000)
    assert np.isfinite(mixed).all()
    p_sig = np.mean(audio**2)
    p_bg = np.mean((mixed - audio) ** 2)
    assert abs(10 * np.log10(p_sig / p_bg) - 10.0) < 0.2


def test_confusers_are_normalized_and_sized():
    for gen in (degrade.babble, degrade.music):
        x = gen(2.0, 16000, seed=5)
        assert x.shape == (32000,)
        assert 0.99 < float(np.abs(x).max()) <= 1.0


def test_degradation_matrix_end_to_end():
    """Small matrix through the full pipeline (faithful tier): every mild
    channel degradation must keep segment-level detection essentially
    intact, and confuser BACKGROUNDS must not destroy precision. This is
    the decision-compatibility evidence on non-clean material."""
    sys.path.insert(0, str(REPO / "tools"))
    try:
        import accuracy_eval as ae
    finally:
        sys.path.pop(0)

    r = ae.degradation_matrix(n_utterances=3, seed=7)
    by_name = {row["degradation"]: row for row in r["rows"]}
    assert by_name["clean"]["frame_f1"] == 1.0
    for mild in ("g711_mu", "g711_a", "ima_adpcm", "clip_12dB",
                 "bandlimit_100_7000", "reverb_rt60_0.4s",
                 "reverb_rt60_0.8s", "babble_10dB", "music_10dB"):
        row = by_name[mild]
        assert row["segment_recall"] == 1.0, (mild, row)
        assert row["segment_precision"] == 1.0, (mild, row)
        assert row["frame_f1"] >= 0.95, (mild, row)
    # the telephone band removes the generator's 140-210 Hz fundamental
    # and v3.1 stops detecting the stationary synthetic without it
    # (documented in accuracy_eval._degradations) — what must still hold
    # is zero FALSE alarms
    assert by_name["bandlimit_300_3400"]["frame_precision"] == 1.0


def test_reverb_short_rt60_is_valid():
    # early-reflection indices are clamped to the RIR length: very short
    # rt60 values must neither index past the RIR nor hit lo >= hi
    rng = np.random.default_rng(4)
    audio = (rng.standard_normal(8000) * 0.1).astype(np.float32)
    for rt60 in (0.004, 0.02, 0.04):
        out = degrade.reverb(audio, 16000, rt60_s=rt60)
        assert out.shape == audio.shape and np.isfinite(out).all(), rt60
