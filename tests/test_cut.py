"""Native silence-cutting tool (cli/cut.py) — the one-step replacement of
the reference's vadc -> filter_script -> ffmpeg pipeline for PCM input."""

import numpy as np
import pytest

from vadc_tpu.io.pcm import f32_to_s16le
from vadc_tpu.io.wav import WavSource, write_wav


def _speechlike(duration_s, f0=120.0, sr=16000):
    t = np.arange(int(duration_s * sr)) / sr
    sig = np.zeros_like(t)
    for k in range(1, 25):
        f = k * f0
        w = np.exp(-(((f - 500) / 400) ** 2)) + 0.7 * np.exp(
            -(((f - 1500) / 500) ** 2)
        )
        sig += w * np.sin(2 * np.pi * f * t + k)
    sig *= 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t - np.pi / 2))
    return (0.3 * sig / np.abs(sig).max()).astype(np.float32)


def _sil(d, sr=16000):
    return (
        np.random.default_rng(1).normal(size=int(d * sr)) * 0.001
    ).astype(np.float32)


@pytest.fixture(scope="module")
def material():
    return np.concatenate([_sil(1), _speechlike(2), _sil(1)])


def test_cut_wav_to_wav(tmp_path, capsys, material, testdata):
    from vadc_tpu.cli import cut

    src = tmp_path / "in.wav"
    write_wav(src, (material * 32767).astype("<i2"))
    out = tmp_path / "out.wav"
    rc = cut.main(
        [str(src), str(out), "--stats",
         "--model", str(testdata / "silero_v31_16k.testtensor")]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "kept" in err and "1 segment(s)" in err
    with WavSource(str(out)) as s:
        kept = np.frombuffer(s.read(-1), "<i2")
    # speech spans [1, 3] s; FSM pads +-30 ms and quantizes to 96 ms
    # chunks, so the kept span is ~2 s with up to 2 chunks of slack/side
    assert 1.8 * 16000 < len(kept) < 2.7 * 16000
    # the kept audio is the loud part: mean |amplitude| far above the
    # silence floor (~26 for the 0.001-scale noise)
    assert np.abs(kept.astype(np.float32)).mean() > 200


def test_cut_raw_to_raw(tmp_path, material, testdata):
    from vadc_tpu.cli import cut

    src = tmp_path / "in.s16le"
    src.write_bytes(f32_to_s16le(material))
    out = tmp_path / "out.s16le"
    rc = cut.main(
        [str(src), str(out),
         "--model", str(testdata / "silero_v31_16k.testtensor")]
    )
    assert rc == 0
    kept = np.frombuffer(out.read_bytes(), "<i2")
    assert 1.8 * 16000 < len(kept) < 2.7 * 16000


def test_cut_silence_only_produces_empty_output(tmp_path, capsys, testdata):
    from vadc_tpu.cli import cut

    src = tmp_path / "sil.wav"
    write_wav(src, (_sil(3) * 32767).astype("<i2"))
    out = tmp_path / "out.wav"
    rc = cut.main(
        [str(src), str(out), "--stats",
         "--model", str(testdata / "silero_v31_16k.testtensor")]
    )
    assert rc == 0
    assert "0 segment(s)" in capsys.readouterr().err
    with WavSource(str(out)) as s:
        assert s.read(-1) == b""


def test_cut_missing_input_one_line_error(tmp_path, capsys, testdata):
    from vadc_tpu.cli import cut

    rc = cut.main(
        [str(tmp_path / "nope.wav"), str(tmp_path / "out.wav"),
         "--model", str(testdata / "silero_v31_16k.testtensor")]
    )
    assert rc == 1
    assert "BS_Error_CantOpenFile" in capsys.readouterr().err


def test_write_wav_roundtrip(tmp_path):
    samples = np.arange(-100, 100, dtype="<i2")
    path = tmp_path / "rt.wav"
    write_wav(path, samples, sample_rate=8000)
    with WavSource(str(path), target_rate=8000) as s:
        assert s.format.sample_rate == 8000
        assert np.array_equal(np.frombuffer(s.read(-1), "<i2"), samples)


def test_cut_malformed_wav_one_line_error(tmp_path, capsys, testdata):
    from vadc_tpu.cli import cut

    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"RIFF\x10\x00\x00\x00WAVEjunk")
    rc = cut.main(
        [str(bad), str(tmp_path / "out.wav"),
         "--model", str(testdata / "silero_v31_16k.testtensor")]
    )
    assert rc == 1
    assert "BS_Error_CantOpenFile" in capsys.readouterr().err


def test_cut_unwritable_output_fails_fast(tmp_path, capsys, testdata):
    from vadc_tpu.cli import cut

    src = tmp_path / "in.wav"
    write_wav(src, np.zeros(1600, "<i2"))
    rc = cut.main(
        [str(src), str(tmp_path / "no" / "dir" / "out.wav"),
         "--model", str(testdata / "silero_v31_16k.testtensor")]
    )
    assert rc == 1
    assert "cannot write output" in capsys.readouterr().err
