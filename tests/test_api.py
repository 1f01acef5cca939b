"""Public API + pack-tool tests."""

import sys

import numpy as np
import pytest

from vadc_tpu import api


def _speechlike(duration_s, f0=120.0, sr=16000):
    t = np.arange(int(duration_s * sr)) / sr
    sig = np.zeros_like(t)
    for k in range(1, 25):
        f = k * f0
        w = np.exp(-(((f - 500) / 400) ** 2)) + 0.7 * np.exp(-(((f - 1500) / 500) ** 2))
        sig += w * np.sin(2 * np.pi * f * t + k)
    sig *= 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t - np.pi / 2))
    return (0.3 * sig / np.abs(sig).max()).astype(np.float32)


def test_speech_probabilities_and_segments(testdata):
    model = str(testdata / "silero_v31_16k.testtensor")
    sil = (np.random.default_rng(0).normal(size=16000) * 0.001).astype(np.float32)
    audio = np.concatenate([sil, _speechlike(2.0), sil])
    # s16 round-trip: mathematically-clean float synthetics are out of
    # distribution for the model (the log front-end amplifies the missing
    # inter-harmonic noise floor); quantization dither restores realism.
    from vadc_tpu.io.pcm import f32_to_s16le, s16le_to_f32

    audio = s16le_to_f32(f32_to_s16le(audio))

    probs = api.speech_probabilities(audio, model=model)
    assert probs.shape[0] == -(-len(audio) // 1536)
    assert probs[:8].max() < 0.3 and probs[12:28].max() > 0.8

    segs = api.detect_speech_samples(audio, model=model)
    assert len(segs) == 1
    start, end = segs[0]
    assert 0.5 < start < 1.6 and 2.6 < end < 3.6, segs


def test_empty_audio(testdata):
    model = str(testdata / "silero_v31_16k.testtensor")
    assert api.speech_probabilities(np.zeros(0, np.float32), model=model).size == 0
    assert api.detect_speech_samples(np.zeros(0, np.float32), model=model) == []


def test_stream_segments_generator(testdata):
    """The generator API must yield the same segments as detect_speech."""
    import io

    from vadc_tpu.io.pcm import f32_to_s16le, s16le_to_f32

    model = str(testdata / "silero_v31_16k.testtensor")
    sil = (np.random.default_rng(0).normal(size=16000) * 0.001).astype(np.float32)
    pcm = f32_to_s16le(np.concatenate([sil, _speechlike(2.0), sil]))
    segs = list(api.stream_segments(io.BytesIO(pcm), model=model))
    want = api.detect_speech_samples(s16le_to_f32(pcm), model=model)
    assert len(segs) == len(want) == 1
    assert segs[0] == pytest.approx(want[0], abs=1e-6)


def test_testtensor_fuzz():
    """The parser must reject, not crash on, malformed archives."""
    from vadc_tpu.io.testtensor import TestTensorError, load_testtensor_bytes, save_testtensor_bytes

    good = save_testtensor_bytes({"a": np.ones((2, 3), np.float32)})
    rng = np.random.default_rng(0)
    for _ in range(200):
        blob = bytearray(good)
        for _ in range(rng.integers(1, 6)):
            blob[rng.integers(0, len(blob))] = rng.integers(0, 256)
        try:
            load_testtensor_bytes(bytes(blob))
        except (TestTensorError, UnicodeDecodeError, ValueError, struct_error):
            pass


try:
    from struct import error as struct_error
except ImportError:  # pragma: no cover
    struct_error = ValueError


def test_pack_roundtrip(testdata, tmp_path):
    from vadc_tpu.export.pack import pack

    out = tmp_path / "embedded.py"
    pack(testdata / "silero_v31_16k.testtensor", out)
    sys.path.insert(0, str(tmp_path))
    try:
        import embedded  # noqa: F401

        family, params = embedded.load()
        assert family == "v3"
        assert params["lstm_w"].shape == (2, 256, 128)
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("embedded", None)


def test_fast_math_bounded_deviation(testdata):
    import jax.numpy as jnp
    from vadc_tpu.engine.runner import StreamRunner
    from vadc_tpu.models.weights import load_params

    family, params = load_params(testdata / "silero_v31_16k.testtensor")
    rng = np.random.default_rng(1)
    chunks = jnp.asarray(rng.normal(size=(4, 3, 1536)).astype(np.float32) * 0.1)

    faithful = StreamRunner(family, params)
    fast = StreamRunner(family, params, fast_math=True)
    p1, _ = faithful.scan(chunks, faithful.init_state(4))
    p2, _ = fast.scan(chunks, fast.init_state(4))
    dev = float(np.abs(np.asarray(p1) - np.asarray(p2)).max())
    # bf16 matmuls shift probabilities but must stay decision-compatible
    assert dev < 0.05, dev


def test_detect_speech_wav_file(testdata, tmp_path):
    """detect_speech on a .wav path uses the native decoder (no ffmpeg
    in this environment — this path working at all proves it)."""
    import wave

    from vadc_tpu.io.pcm import f32_to_s16le

    sil = (np.random.default_rng(0).normal(size=16000) * 0.001).astype(np.float32)
    audio = np.concatenate([sil, _speechlike(2.0), sil])
    path = tmp_path / "speech.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(f32_to_s16le(audio))

    segs = api.detect_speech(
        path, model=str(testdata / "silero_v31_16k.testtensor")
    )
    assert len(segs) == 1
    start, end = segs[0]
    assert 0.5 < start < 1.6 and 2.6 < end < 3.6, segs


def test_cut_speech_samples(testdata):
    from vadc_tpu.io.pcm import f32_to_s16le, s16le_to_f32

    sil = (np.random.default_rng(0).normal(size=16000) * 0.001).astype(np.float32)
    audio = s16le_to_f32(f32_to_s16le(
        np.concatenate([sil, _speechlike(2.0), sil])
    ))
    kept = api.cut_speech_samples(
        audio, model=str(testdata / "silero_v31_16k.testtensor")
    )
    assert 1.8 * 16000 < len(kept) < 2.7 * 16000
    assert api.cut_speech_samples(
        np.zeros(32000, np.float32),
        model=str(testdata / "silero_v31_16k.testtensor"),
    ).size == 0


def test_cut_speech_samples_slices_at_model_rate():
    """8 kHz families: segment times are true seconds, so the slicer must
    use the MODEL's sample rate (8000), not a 16 kHz default — the wrong
    rate doubles every index and cuts the wrong ranges."""
    from pathlib import Path

    model = Path("vadc_tpu/data/silero_v4_8k.testtensor")
    sil = (np.random.default_rng(0).normal(size=8000) * 0.001).astype(np.float32)
    audio = np.concatenate([sil, _speechlike(2.0, sr=8000), sil])
    kept = api.cut_speech_samples(audio, model=str(model))
    assert 1.7 * 8000 < len(kept) < 2.9 * 8000, len(kept)


def test_stream_segments_8k_time_base():
    """8 kHz families: the generator's segment clock must run on the
    model's sample rate (regression: SegmenterConfig was built without
    sample_rate, halving every timestamp and doubling the ms->chunk
    thresholds). The generator must agree with detect_speech_samples,
    which always had the correct rate."""
    import io
    from pathlib import Path

    from vadc_tpu.io.pcm import f32_to_s16le, s16le_to_f32

    model = str(Path("vadc_tpu/data/silero_v4_8k.testtensor"))
    sil = (np.random.default_rng(0).normal(size=8000) * 0.001).astype(np.float32)
    pcm = f32_to_s16le(np.concatenate([sil, _speechlike(2.0, sr=8000), sil]))
    segs = list(api.stream_segments(io.BytesIO(pcm), model=model))
    want = api.detect_speech_samples(s16le_to_f32(pcm), model=model)
    assert len(segs) == len(want) == 1
    assert segs[0] == pytest.approx(want[0], abs=1e-6)
    start, end = segs[0]
    assert 0.5 < start < 1.6 and 2.4 < end < 3.7, segs
