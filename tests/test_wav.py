"""Native WAV ingestion: header parsing, codec decode, downmix, resample,
and the CLI file path that uses it.

The reference has no container parsing at all — `vadc <file>` spawns
ffmpeg (vadc.c:531-608). io/wav.py absorbs the wav slice of that role
natively; these tests pin the format corners (bit depths, float,
extensible, chunk skipping, malformed files) against hand-built fixtures.
"""

import io
import struct
import wave
from pathlib import Path

import numpy as np
import pytest

from vadc_tpu.io.wav import (
    WavFormatError,
    WavSource,
    _decode_frames,
    is_riff_wave,
    read_wav_header,
)


def _wav_bytes(
    pcm: bytes,
    *,
    tag: int = 1,
    channels: int = 1,
    sr: int = 16000,
    bits: int = 16,
    pre_data_chunks: bytes = b"",
    data_size: int | None = None,
    extensible: bool = False,
) -> bytes:
    if extensible:
        sub = struct.pack("<H", tag) + b"\x00\x00" + bytes(12)
        fmt_body = (
            struct.pack(
                "<HHIIHH", 0xFFFE, channels, sr,
                sr * channels * bits // 8, channels * bits // 8, bits,
            )
            + struct.pack("<HHI", 22, bits, 0x3)
            + sub
        )
    else:
        fmt_body = struct.pack(
            "<HHIIHH", tag, channels, sr,
            sr * channels * bits // 8, channels * bits // 8, bits,
        )
    body = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + pre_data_chunks
        + b"data"
        + struct.pack("<I", len(pcm) if data_size is None else data_size)
        + pcm
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _write(tmp_path, name, blob):
    p = tmp_path / name
    p.write_bytes(blob)
    return str(p)


def test_magic_sniff():
    assert is_riff_wave(b"RIFF\x00\x00\x00\x00WAVE")
    assert not is_riff_wave(b"RIFF\x00\x00\x00\x00AVI ")
    assert not is_riff_wave(b"\x00\x01" * 6)
    assert not is_riff_wave(b"RIFF")  # short


def test_header_parse_and_chunk_skip():
    pcm = b"\x01\x00" * 10
    lst = b"LIST" + struct.pack("<I", 9) + b"INFOhello"  # odd size: pad byte
    blob = _wav_bytes(pcm, pre_data_chunks=lst + b"\x00")
    fmt = read_wav_header(io.BytesIO(blob))
    assert (fmt.format_tag, fmt.channels, fmt.sample_rate, fmt.bits_per_sample) == (1, 1, 16000, 16)
    assert fmt.data_bytes == len(pcm)


def test_extensible_unwrap():
    blob = _wav_bytes(b"\x01\x00" * 4, tag=1, extensible=True)
    fmt = read_wav_header(io.BytesIO(blob))
    assert fmt.format_tag == 1
    assert fmt.bits_per_sample == 16


def test_streamed_data_size_reads_to_eof(tmp_path):
    pcm = np.arange(-50, 50, dtype="<i2").tobytes()
    blob = _wav_bytes(pcm, data_size=0xFFFFFFFF)
    path = _write(tmp_path, "streamed.wav", blob)
    with WavSource(path) as s:
        assert s.read(-1) == pcm


@pytest.mark.parametrize(
    "blob,msg",
    [
        (b"RIFX" + bytes(20), "not a RIFF"),
        (b"RIFF\x10\x00\x00\x00WAVEjunk", "no 'fmt ' chunk"),
        (
            b"RIFF\x20\x00\x00\x00WAVE"
            + b"data" + struct.pack("<I", 4) + bytes(4),
            "'data' chunk before 'fmt '",
        ),
        (_wav_bytes(b"", tag=2), "unsupported wav codec"),  # ADPCM
        (_wav_bytes(b"", channels=0), "zero channels"),
    ],
)
def test_malformed_files_one_line_diagnosis(blob, msg):
    with pytest.raises(WavFormatError, match=msg):
        read_wav_header(io.BytesIO(blob))


def test_passthrough_bit_exact(tmp_path):
    rng = np.random.default_rng(3)
    pcm = (rng.integers(-32768, 32768, 16000)).astype("<i2").tobytes()
    path = _write(tmp_path, "t16.wav", _wav_bytes(pcm))
    with WavSource(path) as s:
        assert s.format.sample_rate == 16000
        assert s.read(-1) == pcm


def test_read_block_sizes_equal_read_all(tmp_path):
    rng = np.random.default_rng(4)
    x = (0.3 * rng.normal(size=44100)).astype("<f4")
    blob = _wav_bytes(x.tobytes(), tag=3, sr=44100, bits=32)
    path = _write(tmp_path, "f441.wav", blob)
    with WavSource(path) as s:
        one = s.read(-1)
    with WavSource(path) as s:
        parts = []
        while True:
            b = s.read(int(rng.integers(1, 5000)))
            if not b:
                break
            parts.append(b)
        two = b"".join(parts)
    assert one == two
    # duration contract: 44100 in -> 16000 out (1 second each)
    assert len(one) == 2 * 16000


def test_stereo_downmix_is_channel_mean():
    left = np.array([0.5, -0.5, 0.25], np.float32)
    right = np.array([0.1, 0.3, -0.25], np.float32)
    inter = np.stack([left, right], 1).astype("<f4").tobytes()
    from vadc_tpu.io.wav import WavFormat

    fmt = WavFormat(3, 2, 16000, 32, len(inter))
    mono = _decode_frames(inter, fmt)
    np.testing.assert_allclose(mono, (left + right) / 2, rtol=1e-6)


def test_bit_depth_decodes():
    from vadc_tpu.io.wav import WavFormat

    # 24-bit: value 0x400000 = +0.5, 0xC00000 (sign ext) = -0.5
    raw24 = bytes([0x00, 0x00, 0x40, 0x00, 0x00, 0xC0])
    out = _decode_frames(raw24, WavFormat(1, 1, 16000, 24, 6))
    np.testing.assert_allclose(out, [0.5, -0.5])
    # 8-bit unsigned: 128 = 0, 255 ~ +1, 0 = -1
    out = _decode_frames(bytes([128, 255, 0]), WavFormat(1, 1, 16000, 8, 3))
    np.testing.assert_allclose(out, [0.0, 127 / 128, -1.0])
    # 32-bit int
    raw32 = np.array([2**30, -(2**31)], "<i4").tobytes()
    out = _decode_frames(raw32, WavFormat(1, 1, 16000, 32, 8))
    np.testing.assert_allclose(out, [0.5, -1.0])
    # float64
    raw64 = np.array([0.125, -0.75], "<f8").tobytes()
    out = _decode_frames(raw64, WavFormat(3, 1, 16000, 64, 16))
    np.testing.assert_allclose(out, [0.125, -0.75])


def test_start_seconds_skips_input_frames(tmp_path):
    pcm = np.arange(32000, dtype="<i2").tobytes()  # 2 s ramp at 16 kHz
    path = _write(tmp_path, "seek.wav", _wav_bytes(pcm))
    with WavSource(path, start_seconds=1.0) as s:
        out = s.read(-1)
    assert out == pcm[32000:]  # skipped exactly 16000 frames


def _synthetic_speech(sr: int) -> np.ndarray:
    """Same speech-shaped signal as test_cli_e2e, at an arbitrary rate."""
    def _voiced(dur, f0):
        t = np.arange(int(dur * sr)) / sr
        sig = np.zeros_like(t)
        for k in range(1, 25):
            f = k * f0
            w = (
                np.exp(-(((f - 500) / 400) ** 2))
                + 0.7 * np.exp(-(((f - 1500) / 500) ** 2))
                + 0.3 * np.exp(-(((f - 2500) / 700) ** 2))
            )
            sig += w * np.sin(2 * np.pi * f * t + k)
        sig *= 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t - np.pi / 2))
        return 0.3 * sig / np.abs(sig).max()

    def _sil(dur):
        return 0.001 * np.random.default_rng(1).normal(size=int(dur * sr))

    return np.concatenate(
        [_sil(2), _voiced(3, 120), _sil(2), _voiced(3, 180), _sil(2)]
    ).astype(np.float32)


@pytest.mark.slow
def test_cli_wav_segments_match_stdin(monkeypatch, capsys, tmp_path):
    """The full CLI on a 48 kHz stereo float wav finds the same speech
    segments as raw 16 kHz s16le of the same material on stdin — the
    capability the reference only has through ffmpeg."""
    from vadc_tpu.cli import main as cli_main

    audio48 = _synthetic_speech(48000)
    stereo = np.stack([audio48, 0.5 * audio48], 1).astype("<f4")
    wav_path = _write(
        tmp_path, "speech48.wav",
        _wav_bytes(stereo.tobytes(), tag=3, channels=2, sr=48000, bits=32),
    )
    rc = cli_main.main([wav_path])
    assert rc == 0
    wav_out = capsys.readouterr().out.strip().splitlines()

    audio16 = _synthetic_speech(16000)
    pcm = np.clip(audio16 * 32768, -32768, 32767).astype("<i2").tobytes()

    class _Stdin:
        def __init__(self, b):
            self.buffer = io.BytesIO(b)

    monkeypatch.setattr(cli_main.sys, "stdin", _Stdin(pcm))
    rc = cli_main.main([])
    assert rc == 0
    ref_out = capsys.readouterr().out.strip().splitlines()

    assert len(wav_out) == len(ref_out) == 2
    for got, ref in zip(wav_out, ref_out):
        g = tuple(map(float, got.split(",")))
        r = tuple(map(float, ref.split(",")))
        # material was independently sampled at each rate; allow one
        # 96 ms chunk of slack per boundary
        assert abs(g[0] - r[0]) <= 0.097 and abs(g[1] - r[1]) <= 0.097


def test_wave_stdlib_roundtrip(tmp_path):
    """Files written by Python's own wave module parse and decode."""
    path = tmp_path / "std.wav"
    x = (np.sin(2 * np.pi * 440 * np.arange(8000) / 8000) * 20000).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(x.tobytes())
    with WavSource(str(path)) as s:
        assert s.format.sample_rate == 8000
        out = np.frombuffer(s.read(-1), "<i2")
    assert len(out) == 16000  # 8k -> 16k doubles the sample count


def test_prepend_stream_serves_head_first():
    from vadc_tpu.io.wav import PrependStream

    s = PrependStream(b"abcd", io.BytesIO(b"efgh"))
    assert s.read(2) == b"ab"
    assert s.read(3) == b"cde"
    assert s.read(-1) == b"fgh"
    assert s.read(4) == b""
    assert not s.seekable()


class _TrickleStream:
    """A pipe that returns at most `chunk` bytes per read — exercises the
    partial-frame carry (a multi-channel frame split across reads)."""

    def __init__(self, data: bytes, chunk: int):
        self._b = io.BytesIO(data)
        self._chunk = chunk

    def read(self, n=-1):
        if n is None or n < 0:
            n = self._chunk
        return self._b.read(min(n, self._chunk))

    def seekable(self):
        return False


def test_wav_source_on_nonseekable_trickle_stream(tmp_path):
    """Stream decode over 3-byte pipe reads (splitting every stereo f32
    frame) is byte-identical to the seekable file decode."""
    rng = np.random.default_rng(7)
    stereo = (0.2 * rng.normal(size=(4410, 2))).astype("<f4")
    lst = b"LIST" + struct.pack("<I", 4) + b"INFO"
    blob = _wav_bytes(
        stereo.tobytes(), tag=3, channels=2, sr=44100, bits=32,
        pre_data_chunks=lst,
    )
    path = _write(tmp_path, "trickle.wav", blob)
    with WavSource(path) as s:
        from_file = s.read(-1)
    with WavSource(_TrickleStream(blob, 3)) as s:
        from_pipe = s.read(-1)
    assert from_file == from_pipe
    assert len(from_file) == 2 * 1600  # 0.1 s at 16 kHz


def test_wav_stream_start_seconds_discards_without_seek():
    pcm = np.arange(16000, dtype="<i2").tobytes()
    blob = _wav_bytes(pcm)
    with WavSource(_TrickleStream(blob, 64), start_seconds=0.5) as s:
        assert s.read(-1) == pcm[16000:]


@pytest.mark.slow
def test_cli_wav_on_stdin(monkeypatch, capsys, tmp_path):
    """`vadc < file.wav` sniffs the RIFF magic on stdin and decodes
    natively; segments match the same audio fed raw."""
    from vadc_tpu.cli import main as cli_main

    audio = _synthetic_speech(16000)
    pcm = np.clip(audio * 32768, -32768, 32767).astype("<i2").tobytes()
    blob = _wav_bytes(pcm)

    class _Stdin:
        def __init__(self, b):
            self.buffer = io.BytesIO(b)

    monkeypatch.setattr(cli_main.sys, "stdin", _Stdin(blob))
    assert cli_main.main([]) == 0
    captured = capsys.readouterr()
    wav_out = captured.out.strip().splitlines()
    assert "wav input on stdin" in captured.err

    monkeypatch.setattr(cli_main.sys, "stdin", _Stdin(pcm))
    assert cli_main.main([]) == 0
    ref_out = capsys.readouterr().out.strip().splitlines()
    # 16 kHz mono s16 wav payload is a bit-exact passthrough
    assert wav_out == ref_out


def test_wav_source_accepts_pathlib_path(tmp_path):
    from pathlib import Path

    pcm = np.arange(100, dtype="<i2").tobytes()
    p = tmp_path / "p.wav"
    p.write_bytes(_wav_bytes(pcm))
    with WavSource(Path(p)) as s:  # PathLike, not str
        assert s.read(-1) == pcm


def test_write_wav_spec_compliant_riff_size(tmp_path):
    """The RIFF size field must cover the full file minus 8 bytes —
    strict readers (stdlib wave) bound the data chunk by it, so an
    understated size silently truncates the tail."""
    from vadc_tpu.io.wav import write_wav

    samples = np.arange(1000, dtype="<i2")
    path = tmp_path / "sz.wav"
    write_wav(path, samples)
    blob = path.read_bytes()
    (riff_size,) = struct.unpack("<I", blob[4:8])
    assert riff_size == len(blob) - 8
    with wave.open(str(path), "rb") as w:
        assert w.getnframes() == 1000
        assert np.array_equal(
            np.frombuffer(w.readframes(1000), "<i2"), samples
        )


def test_header_fuzz_never_raises_foreign_exceptions():
    """The parser handles UNTRUSTED bytes (the serving daemon sniffs
    client streams): any mutation must either parse or raise
    WavFormatError — never ZeroDivisionError/struct.error/etc."""
    rng = np.random.default_rng(11)
    base = bytearray(_wav_bytes(b"\x00\x00" * 8))
    for trial in range(300):
        blob = bytearray(base)
        for _ in range(rng.integers(1, 6)):
            blob[rng.integers(0, len(blob))] = rng.integers(0, 256)
        try:
            fmt = read_wav_header(io.BytesIO(bytes(blob)))
            # parsed headers must be internally usable downstream
            assert fmt.sample_rate >= 1 and fmt.channels >= 1
            assert fmt.bytes_per_frame >= 1
        except WavFormatError:
            pass
    # targeted: zero sample rate must be a WavFormatError, not a
    # ValueError from the resampler constructor later
    blob = _wav_bytes(b"", sr=0)
    with pytest.raises(WavFormatError, match="zero sample rate"):
        read_wav_header(io.BytesIO(blob))


@pytest.mark.slow
def test_cli_wav_resamples_to_8k_family_rate(monkeypatch, capsys, tmp_path):
    """A 16 kHz wav fed to the v4 8 kHz family must be resampled to the
    MODEL's rate (8 kHz), and timestamps timed at that rate."""
    import io as _io

    from vadc_tpu.cli import main as cli_main

    audio = _synthetic_speech(16000)
    pcm = np.clip(audio * 32768, -32768, 32767).astype("<i2").tobytes()
    wav_path = _write(tmp_path, "s16k.wav", _wav_bytes(pcm))
    model = str(
        Path(cli_main.__file__).resolve().parent.parent
        / "data" / "silero_v4_8k.testtensor"
    )
    rc = cli_main.main([wav_path, "--model", model])
    assert rc == 0
    captured = capsys.readouterr()
    assert "-> 8000 Hz mono" in captured.err
    segs = [
        tuple(map(float, line.split(",")))
        for line in captured.out.strip().splitlines()
    ]
    # voiced regions are [2,5] and [7,10] seconds; if the rate were
    # mishandled the timestamps would land at half/double these
    assert len(segs) == 2, captured.out
    assert abs(segs[0][0] - 2.0) < 0.35 and abs(segs[0][1] - 5.1) < 0.35
    assert abs(segs[1][0] - 7.0) < 0.35 and abs(segs[1][1] - 10.2) < 0.35


# --- G.711 mu-law / A-law (telephony wav) ---------------------------------

def test_g711_tables_match_stdlib_oracle():
    audioop = pytest.importorskip("audioop")  # removed in Python 3.13
    from vadc_tpu.io.wav import _ALAW_F32, _ULAW_F32

    codes = bytes(range(256))
    for table, decode in ((_ULAW_F32, audioop.ulaw2lin),
                          (_ALAW_F32, audioop.alaw2lin)):
        ref = np.frombuffer(decode(codes, 2), "<i2").astype(np.float32)
        np.testing.assert_array_equal(table * 32768.0, ref)


@pytest.mark.parametrize("tag", [6, 7])  # A-law, mu-law
def test_g711_wav_decodes_through_wav_source(tmp_path, tag):
    audioop = pytest.importorskip("audioop")
    # full-scale-ish 1 kHz sine at the telephony rate
    t = np.arange(8000, dtype=np.float32) / 8000.0
    lin = (0.5 * np.sin(2 * np.pi * 1000.0 * t) * 32767).astype("<i2")
    enc = audioop.lin2alaw if tag == 6 else audioop.lin2ulaw
    payload = enc(lin.tobytes(), 2)
    path = _write(
        tmp_path, f"g711_{tag}.wav",
        _wav_bytes(payload, tag=tag, sr=8000, bits=8),
    )
    with WavSource(path, target_rate=8000) as s:
        out = np.frombuffer(s.read(-1), "<i2").astype(np.float32)
    assert out.shape == lin.shape
    err = out - lin.astype(np.float32)
    snr = 10 * np.log10(np.mean(lin.astype(np.float64) ** 2)
                        / max(np.mean(err.astype(np.float64) ** 2), 1e-12))
    # G.711 companding SNR on a half-scale sine is ~37 dB; require most of it
    assert snr > 30.0, snr


def test_g711_extensible_unwrap_and_resample(tmp_path):
    audioop = pytest.importorskip("audioop")
    lin = (np.sin(np.linspace(0, 40 * np.pi, 8000)) * 16000).astype("<i2")
    payload = audioop.lin2ulaw(lin.tobytes(), 2)
    blob = _wav_bytes(payload, tag=7, sr=8000, bits=8, extensible=True)
    fmt = read_wav_header(io.BytesIO(blob))
    assert fmt.format_tag == 7 and fmt.bits_per_sample == 8
    # telephony 8 kHz in, model-rate 16 kHz out via the polyphase path
    with WavSource(io.BytesIO(blob), target_rate=16000) as s:
        out = np.frombuffer(s.read(-1), "<i2")
    assert abs(len(out) - 16000) <= 64  # resampler edge tolerance


# --- IMA/DVI ADPCM (4-bit block codec) -------------------------------------

def _ima_encode_channel(x, index=0, group_nibbles=None):
    """Independent scalar IMA ADPCM encoder for one channel's block
    (written from the spec prose — the module's vectorized decoder must
    invert it). Returns (header, packed_nibbles, end_index)."""
    from vadc_tpu.io.wav import _IMA_INDEX_ADJ, _IMA_STEPS

    pred = int(x[0])
    hdr = struct.pack("<hBB", pred, index, 0)
    nibbles = []
    for s in x[1:]:
        step = int(_IMA_STEPS[index])
        diff = int(s) - pred
        nib = 0
        if diff < 0:
            nib = 8
            diff = -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        d = step >> 3
        if nib & 4:
            d += step
        if nib & 2:
            d += step >> 1
        if nib & 1:
            d += step >> 2
        pred = max(-32768, min(32767, pred - d if nib & 8 else pred + d))
        index = max(0, min(88, index + int(_IMA_INDEX_ADJ[nib & 7])))
        nibbles.append(nib)
    while len(nibbles) % (group_nibbles or 8):
        nibbles.append(0)
    packed = bytes(
        nibbles[j] | (nibbles[j + 1] << 4) for j in range(0, len(nibbles), 2)
    )
    return hdr, packed, index


def _ima_wav_bytes(x, *, sr=8000, block_align=256, channels=1):
    """Pack per-channel int sample arrays into a spec-shaped IMA wav."""
    chs = x if channels > 1 else [x]
    n = len(chs[0])
    spb = (block_align - 4 * channels) * 2 // channels + 1
    blocks = bytearray()
    idx = [0] * channels
    for pos in range(0, n, spb):
        hdrs, datas = [], []
        for c in range(channels):
            hdr, packed, idx[c] = _ima_encode_channel(
                chs[c][pos:pos + spb], idx[c],
                group_nibbles=(block_align - 4 * channels) * 2 // channels,
            )
            hdrs.append(hdr)
            datas.append(packed)
        blocks += b"".join(hdrs)
        for j in range(0, len(datas[0]), 4):  # channel-interleaved groups
            for c in range(channels):
                blocks += datas[c][j:j + 4]
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, sr, sr * block_align // spb,
        block_align, 4, 2, spb,
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(blocks)) + bytes(blocks)
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _adpcm_test_signal(n=16000, sr=8000):
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 440 * t) * 0.6 + 0.2 * np.sin(2 * np.pi * 97 * t)
    return np.clip(x * 32767, -32768, 32767).astype(np.int64)


def test_ima_core_matches_stdlib_oracle():
    audioop = pytest.importorskip("audioop")  # removed in Python 3.13
    from vadc_tpu.io.wav import _ima_expand

    rng = np.random.default_rng(0)
    nib = rng.integers(0, 16, 512).astype(np.int32)
    # audioop packs the FIRST sample in the HIGH nibble (Intel/DVI raw);
    # the recurrence itself is the same one the wav block layout uses
    frag = bytes(
        (int(nib[i]) << 4) | int(nib[i + 1]) for i in range(0, len(nib), 2)
    )
    ref = np.frombuffer(audioop.adpcm2lin(frag, 2, (0, 0))[0], "<i2")
    ours = _ima_expand(
        nib[None, :], np.zeros(1, np.int32), np.zeros(1, np.int32)
    )[0]
    np.testing.assert_array_equal(ours, ref.astype(np.int32))


def test_ima_adpcm_wav_decodes(tmp_path):
    x = _adpcm_test_signal()
    blob = _ima_wav_bytes(x)
    fmt = read_wav_header(io.BytesIO(blob))
    assert fmt.codec_name == "ima-adpcm"
    assert fmt.samples_per_block == 505 and fmt.total_frames == len(x)
    with WavSource(io.BytesIO(blob), target_rate=8000) as s:
        out = np.frombuffer(s.read(-1), "<i2").astype(np.float64)
    assert len(out) == len(x)  # 'fact' trims the padded final block
    err = out - x
    snr = 10 * np.log10(np.mean(x.astype(np.float64) ** 2) / np.mean(err**2))
    assert snr > 25.0, snr


def test_ima_adpcm_seek_trickle_truncation(tmp_path):
    x = _adpcm_test_signal()
    blob = _ima_wav_bytes(x)
    with WavSource(io.BytesIO(blob), target_rate=8000) as s:
        full = np.frombuffer(s.read(-1), "<i2")
    # sub-block start_seconds == slicing the full decode
    skip = int(0.1234 * 8000)
    with WavSource(
        io.BytesIO(blob), target_rate=8000, start_seconds=0.1234
    ) as s:
        seek = np.frombuffer(s.read(-1), "<i2")
    np.testing.assert_array_equal(seek, full[skip:])
    # non-seekable 7-byte-read pipe gives identical output
    with WavSource(_TrickleStream(blob, 7), target_rate=8000) as s:
        trickled = np.frombuffer(s.read(-1), "<i2")
    np.testing.assert_array_equal(trickled, full)
    # a file cut mid-block still decodes an exact prefix
    with WavSource(io.BytesIO(blob[:-777]), target_rate=8000) as s:
        cut = np.frombuffer(s.read(-1), "<i2")
    assert 0 < len(cut) < len(full)
    np.testing.assert_array_equal(cut, full[: len(cut)])


def test_ima_adpcm_stereo_downmix_and_resample():
    x = _adpcm_test_signal()
    blob = _ima_wav_bytes([x, -x // 2], channels=2)
    with WavSource(io.BytesIO(blob), target_rate=8000) as s:
        out = np.frombuffer(s.read(-1), "<i2").astype(np.float64)
    ideal = (x + (-x // 2)) / 2
    assert len(out) == len(x)
    err = out - ideal
    snr = 10 * np.log10(np.mean(ideal**2) / np.mean(err**2))
    assert snr > 20.0, snr
    # telephony-rate ADPCM up through the polyphase path to 16 kHz
    with WavSource(io.BytesIO(blob), target_rate=16000) as s:
        up = np.frombuffer(s.read(-1), "<i2")
    assert abs(len(up) - 2 * len(x)) <= 64


def test_oversized_fmt_chunk_refused_without_buffering():
    """A declared fmt/fact size near 4 GB is attacker-controlled garbage
    (the serving daemon decodes client wav streams); the parser must refuse
    it immediately instead of buffering gigabytes of client bytes."""
    head = (
        b"RIFF" + struct.pack("<I", 0xFFFFFFF0) + b"WAVE"
        + b"fmt " + struct.pack("<I", 0xFFFFFF00)
    )

    class HeaderThenZeros(io.RawIOBase):
        def __init__(self, head):
            self.head = head
            self.extra_served = 0

        def readable(self):
            return True

        def readinto(self, b):
            if self.head:
                n = min(len(b), len(self.head))
                b[:n] = self.head[:n]
                self.head = self.head[n:]
                return n
            n = len(b)
            self.extra_served += n
            for i in range(n):
                b[i] = 0
            return n

    raw = HeaderThenZeros(head)
    with pytest.raises(WavFormatError, match="oversized 'fmt '"):
        read_wav_header(io.BufferedReader(raw))
    assert raw.extra_served < 1 << 20  # refused up front, nothing buffered


def test_oversized_fact_chunk_refused():
    blob = _wav_bytes(
        b"\x01\x00" * 4,
        pre_data_chunks=b"fact" + struct.pack("<I", 0x7FFFFFFF),
    )
    with pytest.raises(WavFormatError, match="oversized 'fact'"):
        read_wav_header(io.BytesIO(blob))


def test_odd_sized_fmt_chunk_consumes_pad_byte():
    """RIFF word alignment: an odd-sized fmt chunk (cbSize variants real
    encoders emit) carries a pad byte; failing to consume it misaligns
    every later chunk header."""
    fmt_body = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16) + b"\x00"
    assert len(fmt_body) % 2 == 1
    pcm = b"\x01\x00" * 10
    body = (
        b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body + b"\x00"  # pad
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    fmt = read_wav_header(io.BytesIO(blob))
    assert fmt.sample_rate == 16000
    assert fmt.data_bytes == len(pcm)


def test_cli_url_input_reaches_ffmpeg_not_stat(monkeypatch, capsys):
    """A protocol input (https://, pipe:, ...) cannot be os.stat'ed but
    ffmpeg speaks it — the magic-sniff gate must hand it to ffmpeg
    untouched instead of failing with a stat-based CantOpenFile."""
    from vadc_tpu.cli import main as cli_main
    from vadc_tpu.io import ffmpeg as ffmpeg_mod

    seen = {}

    def fake_popen(cmd, **kwargs):
        seen["cmd"] = cmd
        raise FileNotFoundError("ffmpeg")

    monkeypatch.setattr(ffmpeg_mod.subprocess, "Popen", fake_popen)
    rc = cli_main.main(["https://example.invalid/talk.mp3"])
    assert rc == 1
    err = capsys.readouterr().err
    assert "ffmpeg not found" in err  # routed to ffmpeg, not the stat gate
    assert "https://example.invalid/talk.mp3" in seen["cmd"]


def test_cli_missing_local_file_still_one_line_error(capsys, tmp_path):
    from vadc_tpu.cli import main as cli_main

    rc = cli_main.main([str(tmp_path / "does_not_exist.mp3")])
    assert rc == 1
    err = capsys.readouterr().err
    assert "BS_Error_CantOpenFile" in err
    assert "ffmpeg" not in err  # diagnosed at the stat gate, no spawn


def test_cli_wav_stdin_honors_start_seconds(monkeypatch, capsys, tmp_path):
    """`vadc --start_seconds 1 < file.wav` must skip exactly like the file
    path does (regression: the stdin wav branch dropped the flag, so the
    two invocation styles produced different timestamps silently)."""
    from vadc_tpu.cli import main as cli_main

    audio = _synthetic_speech(16000)[: 32 * 512]
    pcm = np.clip(audio * 32768, -32768, 32767).astype("<i2").tobytes()
    blob = _wav_bytes(pcm)
    f = tmp_path / "seek.wav"
    f.write_bytes(blob)
    argv = ["--raw_probabilities", "--sequence_count", "512",
            "--start_seconds", "0.5"]
    assert cli_main.main(argv + [str(f)]) == 0
    file_out = capsys.readouterr().out.strip().splitlines()

    class _Stdin:
        def __init__(self, b):
            self.buffer = io.BytesIO(b)

    monkeypatch.setattr(cli_main.sys, "stdin", _Stdin(blob))
    assert cli_main.main(argv) == 0
    stdin_out = capsys.readouterr().out.strip().splitlines()
    assert stdin_out == file_out

    # and the seek really skipped material vs. not seeking
    monkeypatch.setattr(cli_main.sys, "stdin", _Stdin(blob))
    assert cli_main.main(argv[:-2]) == 0
    noseek_out = capsys.readouterr().out.strip().splitlines()
    assert len(noseek_out) > len(stdin_out)
