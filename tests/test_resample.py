"""Polyphase resampler: quality, alignment, and streaming invariants.

The reference has no resampler — it shells out to ffmpeg (`-ar 16k`,
reference vadc.c:531-608). These tests hold the native replacement to the
quality the pipeline needs: >60 dB SNR on in-band tones at every rate pair
the wav ingest path meets, exact time alignment (group-delay compensated),
exact DC, duration preservation, and block-size independence (streaming in
arbitrary chunks is bit-identical to one-shot)."""

import numpy as np
import pytest

from vadc_tpu.io.resample import PolyphaseResampler

RATE_PAIRS = [
    (48000, 16000),
    (44100, 16000),
    (32000, 16000),
    (24000, 16000),
    (22050, 16000),
    (11025, 16000),
    (8000, 16000),
    (16000, 8000),  # the 8 kHz model families
    (48000, 8000),
]


def _resample_all(rs: PolyphaseResampler, x: np.ndarray) -> np.ndarray:
    return np.concatenate([rs.process(x), rs.flush()])


@pytest.mark.parametrize("sr_in,sr_out", RATE_PAIRS)
def test_tone_snr_and_length(sr_in, sr_out):
    x = np.sin(2 * np.pi * 1000 * np.arange(int(sr_in * 2)) / sr_in)
    rs = PolyphaseResampler(sr_in, sr_out)
    y = _resample_all(rs, x.astype(np.float32))
    # duration contract: ceil(n * L / M)
    assert len(y) == -(-len(x) * rs.L // rs.M)
    ref = np.sin(2 * np.pi * 1000 * np.arange(len(y)) / sr_out)
    cut = 2000
    r, o = ref[cut:-cut], y[cut:-cut]
    e = o - r
    snr = 10 * np.log10(np.dot(r, r) / max(np.dot(e, e), 1e-30))
    assert snr > 60.0, f"{sr_in}->{sr_out}: SNR {snr:.1f} dB"


@pytest.mark.parametrize("sr_in,sr_out", [(44100, 16000), (48000, 16000), (8000, 16000)])
def test_streaming_equals_oneshot(sr_in, sr_out):
    rng = np.random.default_rng(0)
    x = rng.normal(size=sr_in).astype(np.float32)
    one = _resample_all(PolyphaseResampler(sr_in, sr_out), x)
    rs = PolyphaseResampler(sr_in, sr_out)
    parts, i = [], 0
    while i < len(x):
        n = int(rng.integers(1, 700))
        parts.append(rs.process(x[i : i + n]))
        i += n
    parts.append(rs.flush())
    two = np.concatenate(parts)
    assert len(one) == len(two)
    assert np.array_equal(one, two)


def test_impulse_alignment():
    # group delay must be fully compensated: an impulse at input sample n
    # peaks at output round(n * L / M)
    x = np.zeros(48000, np.float32)
    x[24000] = 1.0
    y = _resample_all(PolyphaseResampler(48000, 16000), x)
    assert np.argmax(np.abs(y)) == 8000


def test_dc_exact():
    # per-phase normalization makes a constant input map to the same
    # constant exactly (no phase-periodic ripple)
    y = _resample_all(
        PolyphaseResampler(44100, 16000), np.ones(44100, np.float32)
    )
    assert np.abs(y[200:-200] - 1.0).max() == 0.0


def test_stopband_rejection():
    # a tone above the output Nyquist must not alias through 48k->16k
    x = np.sin(2 * np.pi * 9000 * np.arange(96000) / 48000).astype(np.float32)
    y = _resample_all(PolyphaseResampler(48000, 16000), x)
    rms = float(np.sqrt(np.mean(y[2000:-2000] ** 2)))
    assert rms < 1e-3, f"alias residual rms {rms}"


def test_passthrough_identity():
    rs = PolyphaseResampler(16000, 16000)
    x = np.random.default_rng(1).normal(size=1000).astype(np.float32)
    assert np.array_equal(rs.process(x), x)
    assert rs.flush().size == 0


def test_empty_and_flush_once():
    rs = PolyphaseResampler(48000, 16000)
    assert rs.process(np.empty(0, np.float32)).size == 0
    rs.process(np.ones(100, np.float32))
    rs.flush()
    assert rs.flush().size == 0
    with pytest.raises(RuntimeError):
        rs.process(np.ones(10, np.float32))


def test_agrees_with_scipy_oracle_in_band():
    """Independent-oracle cross-check: on in-band multitone content the
    polyphase resampler matches scipy.signal.resample_poly to ~1e-3
    relative rms (designs differ only in the transition band)."""
    ss = pytest.importorskip("scipy.signal")

    t = np.arange(44100 * 2) / 44100
    x = sum(
        np.sin(2 * np.pi * f * t + i)
        for i, f in enumerate([300, 800, 1700, 3100, 5400])
    ).astype(np.float32)
    rs = PolyphaseResampler(44100, 16000)
    mine = _resample_all(rs, x)
    ref = ss.resample_poly(x.astype(np.float64), rs.L, rs.M)
    n = min(len(mine), len(ref))
    cut = 3000
    d = mine[cut : n - cut] - ref[cut : n - cut]
    rel = np.sqrt(np.mean(d**2) / np.mean(ref[cut : n - cut] ** 2))
    assert rel < 5e-3, rel


@pytest.mark.parametrize("sr_in,sr_out", [(11025, 48000), (48000, 44100), (7000, 16000)])
def test_uncommon_ratios(sr_in, sr_out):
    x = np.sin(2 * np.pi * 800 * np.arange(int(sr_in * 1.5)) / sr_in)
    rs = PolyphaseResampler(sr_in, sr_out)
    y = _resample_all(rs, x.astype(np.float32))
    assert len(y) == -(-len(x) * rs.L // rs.M)
    ref = np.sin(2 * np.pi * 800 * np.arange(len(y)) / sr_out)
    cut = 1000
    e = y[cut:-cut] - ref[cut:-cut]
    snr = 10 * np.log10(
        np.dot(ref[cut:-cut], ref[cut:-cut]) / max(np.dot(e, e), 1e-30)
    )
    assert snr > 80.0, f"{sr_in}->{sr_out}: {snr:.1f} dB"
