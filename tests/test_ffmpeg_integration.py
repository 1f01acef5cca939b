"""Real-subprocess ffmpeg integration: a fake `ffmpeg` executable on PATH
drives FFmpegSource through actual spawn, pipe drain, partial windows,
clean EOF, `-ss` seeking, and nonzero-exit surfacing — the paths the unit
tests only reach through mocks (reference spawn: vadc.c:531-608).

The fake honors the exact argument surface `ffmpeg_command` emits
(`-ss`, `-i`, `-ar`, `-f s16le`, `-` output), treats the input file as
pre-decoded s16le, and fails like the real tool: missing input exits 1
with a stderr line; an input whose name contains "die-midstream" writes
half its bytes then exits 1 (decoder crash mid-file)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from vadc_tpu.io.ffmpeg import FFmpegSource, ffmpeg_command
from vadc_tpu.io.pcm import BSError, BufferedStream, BYTES_PER_SAMPLE

FAKE_FFMPEG = textwrap.dedent(
    """\
    import os, sys

    def main():
        args = sys.argv[1:]
        src = None
        start = 0.0
        rate = 16000
        i = 0
        while i < len(args):
            a = args[i]
            if a == "-i":
                src = args[i + 1]; i += 2
            elif a == "-ss":
                start = float(args[i + 1]); i += 2
            elif a == "-ar":
                v = args[i + 1]
                rate = int(v[:-1]) * 1000 if v.endswith("k") else int(v)
                i += 2
            elif a in ("-map", "-ac", "-f", "-loglevel"):
                i += 2
            else:
                i += 1
        if src is None or not os.path.exists(src):
            print(f"{src}: No such file or directory", file=sys.stderr)
            return 1
        with open(src, "rb") as f:
            data = f.read()
        skip = int(start * rate) * 2  # s16le bytes
        data = data[skip:]
        out = sys.stdout.buffer
        if "die-midstream" in src:
            out.write(data[: len(data) // 2])
            out.flush()
            return 1
        # dribble in unaligned pieces so the reader's full-window loop
        # (pcm.read_full) sees genuine partial pipe reads
        for off in range(0, len(data), 777):
            out.write(data[off : off + 777])
            out.flush()
        return 0

    sys.exit(main())
    """
)


@pytest.fixture
def fake_ffmpeg(tmp_path, monkeypatch):
    script = tmp_path / "fake_ffmpeg_impl.py"
    script.write_text(FAKE_FFMPEG)
    exe = tmp_path / "bin" / "ffmpeg"
    exe.parent.mkdir()
    exe.write_text(f'#!/bin/sh\nexec "{sys.executable}" "{script}" "$@"\n')
    exe.chmod(0o755)
    monkeypatch.setenv("PATH", f"{exe.parent}{os.pathsep}{os.environ['PATH']}")
    return exe


def _pcm(n_samples: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(-3000, 3000, n_samples, dtype=np.int16).tobytes()


def test_fake_ffmpeg_is_spawnable(fake_ffmpeg, tmp_path):
    """Sanity: the fake runs as a real subprocess with vadc's exact argv."""
    media = tmp_path / "a.mp3"
    media.write_bytes(_pcm(100))
    out = subprocess.run(
        ffmpeg_command(str(media)), capture_output=True, check=True
    )
    assert out.stdout == media.read_bytes()


def test_spawn_drain_clean_eof(fake_ffmpeg, tmp_path):
    """Spawn -> pipe drain across many partial reads -> clean EOF: all
    bytes arrive in order and eof_error_kind refines to None (rc 0)."""
    media = tmp_path / "a.mp3"
    payload = _pcm(40000)  # ~51 windows of 777-byte dribbles
    media.write_bytes(payload)
    src = FFmpegSource(str(media))
    with src as stream:
        got = stream.read()
    assert got == payload
    assert src.eof_error_kind() is None


def test_partial_windows_through_buffered_stream(fake_ffmpeg, tmp_path):
    """BufferedStream over the live pipe: full windows, the partial tail
    window, then the EndOfFile latch + zero drain (vadc.c:439-457)."""
    media = tmp_path / "a.mp3"
    n = 1000  # 2000 bytes: 3 full 600-byte windows + 200-byte tail
    payload = _pcm(n, seed=1)
    media.write_bytes(payload)
    src = FFmpegSource(str(media))
    with src as stream:
        bs = BufferedStream(
            stream, window_bytes=600, eof_error_check=src.eof_error_kind
        )
        windows = [bs.refill() for _ in range(6)]
    for i in range(3):
        assert windows[i] == (payload[i * 600 : (i + 1) * 600], BSError.NoError)
    assert windows[3] == (payload[1800:], BSError.NoError)  # partial tail
    assert windows[4] == (b"\x00" * 600, BSError.EndOfFile)  # latch
    assert windows[5] == (b"\x00" * 600, BSError.EndOfFile)  # zero drain


def test_start_seconds_reaches_decoder(fake_ffmpeg, tmp_path):
    """`--start_seconds` is seek-based resume delegated to the decoder
    (reference vadc.c:537-538): 0.25 s at 16 kHz drops 4000 samples."""
    media = tmp_path / "a.mp3"
    payload = _pcm(8000, seed=2)
    media.write_bytes(payload)
    with FFmpegSource(str(media), start_seconds=0.25) as stream:
        got = stream.read()
    assert got == payload[4000 * BYTES_PER_SAMPLE :]


def test_nonzero_exit_latches_error(fake_ffmpeg, tmp_path):
    """A decoder that dies mid-file: the delivered prefix is processed,
    then EOF is refined to BS_Error_Error by the exit code — the
    distinction the reference cannot make (SURVEY §5.3)."""
    media = tmp_path / "die-midstream.mp3"
    payload = _pcm(600, seed=3)  # fake writes 600 of 1200 bytes, exits 1
    media.write_bytes(payload)
    src = FFmpegSource(str(media))
    with src as stream:
        bs = BufferedStream(
            stream, window_bytes=600, eof_error_check=src.eof_error_kind
        )
        w0 = bs.refill()
        w1 = bs.refill()
    assert w0 == (payload[:600], BSError.NoError)
    assert w1[1] == BSError.Error  # rc=1 refines clean-looking EOF
    assert w1[0] == b"\x00" * 600


def test_missing_input_file_exits_nonzero(fake_ffmpeg, tmp_path):
    """Unreadable input: decoder exits 1 immediately, zero bytes arrive,
    the very first refill latches Error."""
    src = FFmpegSource(str(tmp_path / "missing.mp3"))
    with src as stream:
        bs = BufferedStream(
            stream, window_bytes=64, eof_error_check=src.eof_error_kind
        )
        got, err = bs.refill()
    assert err == BSError.Error
    assert got == b"\x00" * 64


def test_cli_end_to_end_through_real_subprocess(
    fake_ffmpeg, tmp_path, testdata, capsys
):
    """Full CLI pass over a non-wav file: magic sniff routes to ffmpeg,
    the spawned fake decodes, probabilities come out on stdout, and the
    clean-EOF drain reports on stderr (vadc.c:911-947)."""
    from vadc_tpu.cli import main as cli_main

    media = tmp_path / "speech.mp3"
    media.write_bytes(_pcm(512 * 96, seed=4))
    rc = cli_main.main(
        [
            "--raw_probabilities",
            "--sequence_count", "512",
            "--model", str(testdata / "silero_v31_16k.testtensor"),
            str(media),
        ]
    )
    out, err = capsys.readouterr()
    assert rc == 0
    assert len(out.strip().splitlines()) == 96
    assert "Error: BS_Error_EndOfFile" in err


def test_cli_reports_decoder_crash(fake_ffmpeg, tmp_path, testdata, capsys):
    """CLI over a mid-file decoder crash: the delivered prefix is still
    processed — the fake writes exactly half of 96 chunks, so 48 complete
    chunks emit (valid-bytes accounting, reference vadc.c:902-909) — and
    the latched kind on stderr is Error, not EndOfFile."""
    from vadc_tpu.cli import main as cli_main

    media = tmp_path / "die-midstream.mp3"
    media.write_bytes(_pcm(512 * 96, seed=5))
    rc = cli_main.main(
        [
            "--raw_probabilities",
            "--sequence_count", "512",
            "--model", str(testdata / "silero_v31_16k.testtensor"),
            str(media),
        ]
    )
    out, err = capsys.readouterr()
    assert rc == 1  # latched mid-stream failure exits nonzero
    assert len(out.strip().splitlines()) == 48  # the delivered prefix
    assert "Error: BS_Error_Error" in err


def test_cli_unsupported_wav_codec_falls_back_to_ffmpeg(
    fake_ffmpeg, tmp_path, testdata, capsys
):
    """A RIFF/WAVE file with a codec outside the native decode set (MS
    ADPCM, tag 2) must not hard-fail: the reference decodes EVERY container
    through ffmpeg (vadc.c:531-608), so the file path retries via the
    spawned decoder after the header rejection."""
    import struct

    from vadc_tpu.cli import main as cli_main

    pcm = _pcm(512 * 32, seed=6)
    fmt_body = struct.pack("<HHIIHH", 2, 1, 16000, 32000, 2, 16)
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt_body) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    media = tmp_path / "msadpcm.wav"
    media.write_bytes(blob)
    rc = cli_main.main(
        [
            "--raw_probabilities",
            "--sequence_count", "512",
            "--model", str(testdata / "silero_v31_16k.testtensor"),
            str(media),
        ]
    )
    out, err = capsys.readouterr()
    assert rc == 0
    assert "falling back to ffmpeg" in err
    assert "Error: BS_Error_EndOfFile" in err
    assert len(out.strip().splitlines()) > 0


def test_cli_exit_nonzero_on_latched_stream_error(
    fake_ffmpeg, tmp_path, testdata, capsys
):
    """A mid-stream decoder failure must exit nonzero like the open-time
    failures do — a shell pipeline checking $? must see the decode fail."""
    from vadc_tpu.cli import main as cli_main

    media = tmp_path / "die-midstream.mp3"
    media.write_bytes(_pcm(512 * 8, seed=7))
    rc = cli_main.main(
        [
            "--raw_probabilities",
            "--sequence_count", "512",
            "--model", str(testdata / "silero_v31_16k.testtensor"),
            str(media),
        ]
    )
    _out, err = capsys.readouterr()
    assert rc == 1
    assert "Error: BS_Error_Error" in err
