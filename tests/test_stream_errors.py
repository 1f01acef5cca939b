"""Stream error model: latched BS_Error kinds, deterministic zero drain,
ffmpeg exit surfacing, and the 256-multiple sequence-count contract
(reference Buffered_Stream vadc.c:401-529, error report vadc.c:911-947,
chunk-size contract vadc.h:85-94)."""

import io

import numpy as np
import pytest

from vadc_tpu.io.pcm import BSError, BufferedStream, BYTES_PER_SAMPLE


class _DyingStream(io.RawIOBase):
    """Returns `good` bytes, then raises OSError on the next read —
    a pipe whose writer died mid-file."""

    def __init__(self, good: bytes):
        self._buf = good
        self._pos = 0

    def readable(self):
        return True

    def read(self, n=-1):
        if self._pos >= len(self._buf):
            raise OSError("broken pipe")
        out = self._buf[self._pos : self._pos + n]
        self._pos += len(out)
        return out


def test_clean_eof_latches_endoffile():
    data = b"\x01\x02" * 100
    bs = BufferedStream(io.BytesIO(data), window_bytes=80)
    got, err = bs.refill()
    assert (got, err) == (data[:80], BSError.NoError)
    got, err = bs.refill()
    assert (got, err) == (data[80:160], BSError.NoError)
    got, err = bs.refill()  # partial window: returned healthy
    assert (got, err) == (data[160:], BSError.NoError)
    got, err = bs.refill()  # nothing left: latch
    assert err == BSError.EndOfFile
    assert got == b"\x00" * 80
    # latched: every further refill is the deterministic zero drain
    for _ in range(3):
        got, err = bs.refill()
        assert err == BSError.EndOfFile
        assert got == b"\x00" * 80


def test_midstream_death_latches_error():
    bs = BufferedStream(_DyingStream(b"\x01\x02" * 40), window_bytes=80)
    got, err = bs.refill()
    assert err == BSError.NoError and len(got) == 80
    got, err = bs.refill()
    assert err == BSError.Error
    assert got == b"\x00" * 80
    got, err = bs.refill()  # stays latched, does not re-touch the stream
    assert err == BSError.Error


def test_partial_window_then_death():
    """Data that runs short mid-window is still delivered (reference
    partial-read path, vadc.c:470-475); the error latches on the NEXT pull."""
    bs = BufferedStream(_DyingStream(b"\x07" * 50), window_bytes=80)
    got, err = bs.refill()
    assert err == BSError.Error  # read_full hits the OSError inside a window
    assert got == b"\x00" * 80


def test_eof_error_check_refines_kind():
    """An ffmpeg that exited nonzero turns clean-looking EOF into Error."""
    bs = BufferedStream(
        io.BytesIO(b""), window_bytes=16, eof_error_check=lambda: BSError.Error
    )
    got, err = bs.refill()
    assert err == BSError.Error


def test_ffmpeg_eof_error_kind():
    from vadc_tpu.io.ffmpeg import FFmpegSource

    class _Proc:
        def __init__(self, rc):
            self.returncode = rc

        def poll(self):
            return self.returncode

    src = FFmpegSource("whatever.mp3")
    src._proc = _Proc(1)
    assert src.eof_error_kind() == BSError.Error
    src._proc = _Proc(0)
    assert src.eof_error_kind() is None


@pytest.mark.parametrize(
    "family,requested,expected",
    [
        ("v3", 1536, 1536),
        ("v3", 1000, 1024),  # rounded to the 256-multiple contract
        ("v3", 600, 512),
        ("v3", 700, 768),
        ("v3", 100, 512),  # clamped up
        ("v3", 5000, 1536),  # clamped down
        ("v4", 1000, 1024),
        ("v4_8k", 300, 256),  # half-rate slices (128)
        ("v4_8k", 1000, 768),
        ("v5", 1000, 512),  # fixed
        ("v5_8k", 1000, 256),  # fixed
    ],
)
def test_sequence_count_contract(family, requested, expected):
    from vadc_tpu.cli.main import clamp_sequence_count

    assert clamp_sequence_count(family, requested) == expected


def test_cli_reports_latched_error_kind(testdata, monkeypatch, capsys):
    """End-to-end: a stdin pipe that dies mid-stream must surface
    `Error: BS_Error_Error` on stderr (vadc.c:911-947); clean EOF surfaces
    `Error: BS_Error_EndOfFile` — both after the read data was processed."""
    from vadc_tpu.cli import main as cli_main

    window_bytes = 96 * 512 * BYTES_PER_SAMPLE

    class _Stdin:
        def __init__(self, stream):
            self.buffer = stream

    argv = [
        "--raw_probabilities",
        "--sequence_count", "512",
        "--model", str(testdata / "silero_v31_16k.testtensor"),
    ]

    monkeypatch.setattr(
        cli_main.sys, "stdin", _Stdin(_DyingStream(b"\x00" * window_bytes))
    )
    # a latched genuine failure exits nonzero (clean EOF below stays 0)
    assert cli_main.main(argv) == 1
    out, err = capsys.readouterr()
    assert len(out.strip().splitlines()) == 96  # the full window was emitted
    assert "Error: BS_Error_Error" in err

    monkeypatch.setattr(
        cli_main.sys, "stdin", _Stdin(io.BytesIO(b"\x00" * window_bytes))
    )
    assert cli_main.main(argv) == 0
    out, err = capsys.readouterr()
    assert len(out.strip().splitlines()) == 96
    assert "Error: BS_Error_EndOfFile" in err


def test_cli_8k_family_times_at_model_rate(monkeypatch, capsys, tmp_path):
    """8 kHz families must time chunks at 8 kHz: a 768-sample chunk is 96 ms,
    so N chunks of speech land at N*0.096 s boundaries — not half that
    (round-2 fix: the CLI used to hardcode 16 kHz everywhere)."""
    import io as _io

    import numpy as np

    from vadc_tpu.models.synthetic import random_v5_8k_archive
    from vadc_tpu.cli import main as cli_main
    from vadc_tpu.io.testtensor import save_testtensor

    archive_path = tmp_path / "v5_8k.testtensor"
    save_testtensor(archive_path, random_v5_8k_archive())

    # silence: random-weight v5 won't detect speech, but the stats line and
    # probability COUNT expose the chunking rate: 8000 samples at 8 kHz =
    # 31 full 256-sample chunks
    pcm = b"\x00\x00" * 8000

    class _Stdin:
        def __init__(self, stream):
            self.buffer = stream

    monkeypatch.setattr(cli_main.sys, "stdin", _Stdin(_io.BytesIO(pcm)))
    rc = cli_main.main(
        ["--raw_probabilities", "--model", str(archive_path)]
    )
    out, err = capsys.readouterr()
    assert rc == 0
    assert "Running with sequence count 256" in err
    assert len(out.strip().splitlines()) == 8000 // 256  # 31 chunks @ 8 kHz


def test_cli_fifo_input_is_not_probed(tmp_path, capsys):
    """A FIFO input path must reach ffmpeg with its bytes untouched: the
    RIFF sniff only reads regular files. With no ffmpeg in this image the
    FIFO path surfaces the one-line ffmpeg-not-found diagnosis WITHOUT
    blocking on opening the pipe (no writer exists)."""
    import os
    import shutil

    if shutil.which("ffmpeg"):
        pytest.skip("ffmpeg present; this asserts the no-ffmpeg diagnosis")
    from vadc_tpu.cli import main as cli_main

    fifo = tmp_path / "in.fifo"
    os.mkfifo(fifo)
    rc = cli_main.main([str(fifo)])
    assert rc == 1
    err = capsys.readouterr().err
    assert "ffmpeg not found" in err
