"""Offline corpus CLI test: multiple variable-length files through the
sharded engine on the 8-virtual-device mesh."""

import numpy as np
import pytest

from vadc_tpu.io.pcm import f32_to_s16le


def _speechlike(duration_s, f0=120.0, sr=16000):
    t = np.arange(int(duration_s * sr)) / sr
    sig = np.zeros_like(t)
    for k in range(1, 25):
        f = k * f0
        w = np.exp(-(((f - 500) / 400) ** 2)) + 0.7 * np.exp(-(((f - 1500) / 500) ** 2))
        sig += w * np.sin(2 * np.pi * f * t + k)
    sig *= 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t - np.pi / 2))
    return (0.3 * sig / np.abs(sig).max()).astype(np.float32)


def test_batch_cli_end_to_end(tmp_path, capsys, testdata):
    from vadc_tpu.cli import batch

    sil = lambda d: (np.random.default_rng(1).normal(size=int(d * 16000)) * 0.001).astype(np.float32)
    # file A: sil 1s, speech 2s, sil 1s;  file B: speech 1.5s only;  C: silence
    a = np.concatenate([sil(1), _speechlike(2), sil(1)])
    b = _speechlike(1.5)
    c = sil(2.5)
    paths = []
    for name, audio in [("a", a), ("b", b), ("c", c)]:
        p = tmp_path / f"{name}.s16le"
        p.write_bytes(f32_to_s16le(audio))
        paths.append(str(p))

    rc = batch.main(paths + ["--model", str(testdata / "silero_v31_16k.testtensor")])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    by_file = {}
    for line in out:
        path, seg = line.split("\t")
        by_file.setdefault(path, []).append(seg)

    # file A: one segment covering roughly 1..3 s
    assert len(by_file[paths[0]]) == 1
    start, end = map(float, by_file[paths[0]][0].split(","))
    assert 0.7 < start < 1.3 and 2.7 < end < 3.4, (start, end)
    # file B: speech (the syllabic envelope rises from zero, so onset is
    # ~0.2-0.4 s) snapped to EOF at ~1.4 s
    assert len(by_file[paths[1]]) == 1
    start, end = map(float, by_file[paths[1]][0].split(","))
    assert start < 0.5 and end > 1.0, (start, end)
    # file C: no segments
    assert paths[2] not in by_file


def test_batch_cli_accepts_wav_files(tmp_path, capsys, testdata):
    """The corpus CLI takes .wav files interchangeably with raw s16le —
    here the same material once raw and once as a 44.1 kHz wav (native
    resample) must segment identically to within one chunk."""
    import struct

    from vadc_tpu.cli import batch

    sil = lambda d, sr: (
        np.random.default_rng(1).normal(size=int(d * sr)) * 0.001
    ).astype(np.float32)
    raw = np.concatenate([sil(1, 16000), _speechlike(2), sil(1, 16000)])
    p_raw = tmp_path / "x.s16le"
    p_raw.write_bytes(f32_to_s16le(raw))

    hi = np.concatenate(
        [sil(1, 44100), _speechlike(2, sr=44100), sil(1, 44100)]
    )
    pcm = np.clip(hi * 32768, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 2, 2, 16)
    p_wav = tmp_path / "x.wav"
    p_wav.write_bytes(
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )

    rc = batch.main(
        [str(p_raw), str(p_wav),
         "--model", str(testdata / "silero_v31_16k.testtensor")]
    )
    assert rc == 0
    by_file = {}
    for line in capsys.readouterr().out.strip().splitlines():
        path, seg = line.split("\t")
        by_file.setdefault(path, []).append(
            tuple(map(float, seg.split(",")))
        )
    assert len(by_file[str(p_raw)]) == len(by_file[str(p_wav)]) == 1
    (rs, re), (ws, we) = by_file[str(p_raw)][0], by_file[str(p_wav)][0]
    assert abs(rs - ws) <= 0.097 and abs(re - we) <= 0.097


def test_batch_cut_dir(tmp_path, capsys, testdata):
    """--cut_dir writes one speech-only file per input in the same pass:
    wav inputs come back as spec-valid wav, raw as raw; kept duration
    matches the emitted segments; silence-only files come back empty."""
    import struct
    import wave

    from vadc_tpu.cli import batch

    sil = lambda d: (
        np.random.default_rng(1).normal(size=int(d * 16000)) * 0.001
    ).astype(np.float32)
    a = np.concatenate([sil(1), _speechlike(2), sil(1)])
    c = sil(2.5)
    p_raw = tmp_path / "a.s16le"
    p_raw.write_bytes(f32_to_s16le(a))
    pcm = f32_to_s16le(a)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    p_wav = tmp_path / "b.wav"
    p_wav.write_bytes(
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    p_sil = tmp_path / "c.s16le"
    p_sil.write_bytes(f32_to_s16le(c))

    out_dir = tmp_path / "cut"
    rc = batch.main(
        [str(p_raw), str(p_wav), str(p_sil), "--cut_dir", str(out_dir),
         "--model", str(testdata / "silero_v31_16k.testtensor")]
    )
    assert rc == 0
    segs_by_file = {}
    for line in capsys.readouterr().out.strip().splitlines():
        path, seg = line.split("\t")
        a_, b_ = map(float, seg.split(","))
        segs_by_file.setdefault(path, []).append(b_ - a_)

    kept_raw = np.frombuffer((out_dir / "a.s16le").read_bytes(), "<i2")
    expect = sum(segs_by_file[str(p_raw)])
    assert abs(len(kept_raw) / 16000 - expect) < 0.011  # stdout prints %.2f
    with wave.open(str(out_dir / "b.wav"), "rb") as w:
        assert w.getframerate() == 16000
        n = w.getnframes()
    assert abs(n / 16000 - sum(segs_by_file[str(p_wav)])) < 0.011
    assert (out_dir / "c.s16le").read_bytes() == b""
