"""Native RIFF/WAVE ingestion.

The reference can only ingest raw s16le PCM directly; every container
format goes through a spawned ffmpeg (`vadc.c:531-608`). This module
makes `vadc file.wav` work with no external decoder: it parses the RIFF
chunk list, decodes the common PCM encodings, downmixes to mono, and
resamples to the model rate (io/resample.py) — presenting the result as
the same read()-able stream of mono s16le bytes the ingest loop already
consumes, so everything downstream of the Buffered_Stream is unchanged.

Supported encodings: PCM 8-bit unsigned, 16/24/32-bit signed, IEEE
float32/float64, ITU-T G.711 mu-law/A-law (the 8 kHz telephony codecs —
the natural material for the 8 kHz model families), and
WAVE_FORMAT_EXTENSIBLE wrapping any of those. Any other codec (ADPCM,
mp3-in-wav, ...) raises WavFormatError with a one-line diagnosis naming
the tag — those still need ffmpeg.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import BinaryIO

import numpy as np

from vadc_tpu.io.pcm import read_full
from vadc_tpu.io.resample import PolyphaseResampler

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_ALAW = 0x0006
WAVE_FORMAT_MULAW = 0x0007
WAVE_FORMAT_EXTENSIBLE = 0xFFFE

# decodable (format_tag, bits) -> numpy dtype of the container
_CODECS = {
    (WAVE_FORMAT_PCM, 8): np.uint8,  # 8-bit wav is unsigned, offset 128
    (WAVE_FORMAT_PCM, 16): np.dtype("<i2"),
    (WAVE_FORMAT_PCM, 24): None,  # no 24-bit dtype; widened by hand
    (WAVE_FORMAT_PCM, 32): np.dtype("<i4"),
    (WAVE_FORMAT_IEEE_FLOAT, 32): np.dtype("<f4"),
    (WAVE_FORMAT_IEEE_FLOAT, 64): np.dtype("<f8"),
    (WAVE_FORMAT_ALAW, 8): np.uint8,  # G.711, decoded via LUT
    (WAVE_FORMAT_MULAW, 8): np.uint8,
}


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """Build the 256-entry G.711 expansion tables (ITU-T G.711 segmented
    companding; same linear values as the classic Sun ulaw2linear /
    alaw2linear, i.e. 16-bit-domain magnitudes up to 32124 / 32256)."""
    codes = np.arange(256, dtype=np.uint16)
    # mu-law: complement, then mantissa/exponent expansion around bias 0x84
    u = codes ^ 0xFF
    t = (((u & 0x0F) << 3) + 0x84).astype(np.int32) << ((u >> 4) & 0x07)
    ulaw = np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.float32)
    # A-law: even-bit inversion, segment 0/1 special-cased
    a = codes ^ 0x55
    seg = (a >> 4) & 0x07
    t = ((a & 0x0F) << 4).astype(np.int32)
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    alaw = np.where(a & 0x80, t, -t).astype(np.float32)
    return ulaw / 32768.0, alaw / 32768.0


_ULAW_F32, _ALAW_F32 = _g711_tables()


class WavFormatError(ValueError):
    pass


@dataclass
class WavFormat:
    format_tag: int
    channels: int
    sample_rate: int
    bits_per_sample: int
    data_bytes: int  # size of the data chunk; may exceed the actual file

    @property
    def bytes_per_frame(self) -> int:
        return self.channels * self.bits_per_sample // 8

    @property
    def codec_name(self) -> str:
        return {
            WAVE_FORMAT_IEEE_FLOAT: "float",
            WAVE_FORMAT_ALAW: "g711-alaw",
            WAVE_FORMAT_MULAW: "g711-ulaw",
        }.get(self.format_tag, "pcm")


def is_riff_wave(head: bytes) -> bool:
    """Magic sniff over the first 12 bytes."""
    return len(head) >= 12 and head[:4] == b"RIFF" and head[8:12] == b"WAVE"


def read_wav_header(stream: BinaryIO) -> WavFormat:
    """Parse the RIFF chunk list up to and including the 'data' chunk
    header, leaving the stream positioned at the first audio byte.

    Tolerates the chunks real encoders emit (fact, LIST, cue, bext, ...)
    by skipping them; requires fmt before data, as the spec does."""
    head = read_full(stream, 12)
    if not is_riff_wave(head):
        raise WavFormatError("not a RIFF/WAVE file")
    fmt: WavFormat | None = None
    while True:
        hdr = read_full(stream, 8)
        if len(hdr) < 8:
            raise WavFormatError(
                "no 'data' chunk" if fmt else "no 'fmt ' chunk"
            )
        cid, size = struct.unpack("<4sI", hdr)
        if cid == b"fmt ":
            body = read_full(stream, size)
            if len(body) < 16:
                raise WavFormatError("truncated 'fmt ' chunk")
            tag, ch, sr, _brate, _balign, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag == WAVE_FORMAT_EXTENSIBLE:
                # SubFormat GUID starts with the real 16-bit tag
                if len(body) < 26:
                    raise WavFormatError("truncated extensible 'fmt ' chunk")
                (ext_size,) = struct.unpack("<H", body[16:18])
                if ext_size < 22 or len(body) < 40:
                    raise WavFormatError("truncated extensible 'fmt ' chunk")
                (_valid_bits,) = struct.unpack("<H", body[18:20])
                (tag,) = struct.unpack("<H", body[24:26])
            if ch < 1:
                raise WavFormatError("zero channels")
            if sr < 1:
                raise WavFormatError("zero sample rate")
            fmt = WavFormat(tag, ch, sr, bits, 0)
        elif cid == b"data":
            if fmt is None:
                raise WavFormatError("'data' chunk before 'fmt '")
            # size 0 / 0xFFFFFFFF: stream-written files; read until EOF
            fmt.data_bytes = (
                size if size not in (0, 0xFFFFFFFF) else (1 << 62)
            )
            if (fmt.format_tag, fmt.bits_per_sample) not in _CODECS:
                raise WavFormatError(
                    f"unsupported wav codec (format_tag={fmt.format_tag}, "
                    f"bits={fmt.bits_per_sample}); decode with ffmpeg"
                )
            return fmt
        else:
            # skip unknown chunk (word-aligned: odd sizes carry a pad
            # byte); read-discard rather than seek so pipes work too
            _discard(stream, size + (size & 1))


def _discard(stream: BinaryIO, nbytes: int) -> None:
    while nbytes > 0:
        got = stream.read(min(nbytes, 1 << 20))
        if not got:
            return
        nbytes -= len(got)


def _decode_frames(raw: bytes, fmt: WavFormat) -> np.ndarray:
    """Raw interleaved frames -> float32 mono in [-1, 1] (channel mean —
    the same downmix ffmpeg's `-ac 1` pan performs)."""
    bpf = fmt.bytes_per_frame
    usable = len(raw) - len(raw) % bpf
    if usable == 0:
        return np.empty(0, np.float32)
    raw = raw[:usable]
    key = (fmt.format_tag, fmt.bits_per_sample)
    if key == (WAVE_FORMAT_PCM, 24):
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3)
        x = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        x = (x ^ 0x800000) - 0x800000  # sign-extend 24 -> 32
        samples = x.astype(np.float32) / 8388608.0
    else:
        x = np.frombuffer(raw, _CODECS[key])
        if key == (WAVE_FORMAT_MULAW, 8):
            samples = _ULAW_F32[x]
        elif key == (WAVE_FORMAT_ALAW, 8):
            samples = _ALAW_F32[x]
        elif key == (WAVE_FORMAT_PCM, 8):
            samples = (x.astype(np.float32) - 128.0) / 128.0
        elif key == (WAVE_FORMAT_PCM, 16):
            samples = x.astype(np.float32) / 32768.0
        elif key == (WAVE_FORMAT_PCM, 32):
            samples = x.astype(np.float32) / 2147483648.0
        else:  # float32/float64
            samples = x.astype(np.float32)
    if fmt.channels > 1:
        samples = samples.reshape(-1, fmt.channels).mean(axis=1)
    return samples


def _quantize_s16le(samples: np.ndarray) -> bytes:
    """Quantize to the pipeline's wire format (the inverse of the ingest
    /32768 contract), rounding and clipping like ffmpeg's s16 packer.
    (Distinct from pcm.f32_to_s16le, a truncating test helper.)"""
    scaled = np.rint(np.asarray(samples, np.float32) * 32768.0)
    return np.clip(scaled, -32768, 32767).astype("<i2").tobytes()


def write_wav(path, samples_s16: np.ndarray, sample_rate: int = 16000) -> None:
    """Minimal 16-bit mono PCM wav writer (the parser's inverse) — lets
    tools emit playable audio without ffmpeg (cli/cut.py)."""
    pcm = np.asarray(samples_s16, "<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", WAVE_FORMAT_PCM, 1, sample_rate, sample_rate * 2, 2, 16
    )
    # RIFF size = everything after the size field itself:
    # "WAVE" (4) + fmt header+body (8+16) + data header (8) + payload
    with open(path, "wb") as fh:
        fh.write(b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE")
        fh.write(b"fmt " + struct.pack("<I", 16) + fmt)
        fh.write(b"data" + struct.pack("<I", len(pcm)) + pcm)


class PrependStream:
    """Serve pre-read sniff bytes back ahead of the underlying stream —
    lets the CLI peek stdin's magic without losing the bytes (stdin pipes
    cannot seek)."""

    def __init__(self, head: bytes, stream: BinaryIO):
        self._head = head
        self._stream = stream

    def read(self, n: int = -1) -> bytes:
        if self._head:
            if n is None or n < 0:
                out, self._head = self._head, b""
                return out + self._stream.read(-1)
            out, self._head = self._head[:n], self._head[n:]
            if len(out) < n:
                out += self._stream.read(n - len(out))
            return out
        return self._stream.read(n)

    def seekable(self) -> bool:
        return False


def read_file_s16(path, target_rate: int = 16000) -> np.ndarray:
    """Whole-file convenience loader: returns mono s16 samples at
    target_rate from either a RIFF/WAVE file (native decode/downmix/
    resample) or a raw s16le file (sniffed by magic). Used by the batch
    corpus CLI and the Python API so every file-taking surface accepts
    .wav uniformly."""
    with open(path, "rb") as fh:
        head = fh.read(12)
    if is_riff_wave(head):
        with WavSource(str(path), target_rate=target_rate) as src:
            return np.frombuffer(src.read(-1), "<i2")
    with open(path, "rb") as fh:
        raw = fh.read()
    return np.frombuffer(raw[: len(raw) - len(raw) % 2], "<i2")


class WavSource:
    """Context manager yielding a read()-able stream of mono s16le at
    target_rate — the drop-in counterpart of FFmpegSource for .wav input.

    Takes a filename (opened and owned) or an already-open binary stream
    (borrowed — pipes and sockets work: chunk skipping and seeking are
    read-based, and partial pipe reads that split a multi-channel frame
    are carried to the next block). The 16 kHz mono s16 fast path is a
    pure byte passthrough (bit-exact with feeding the payload on stdin);
    everything else goes through decode -> downmix -> polyphase resample
    -> s16 quantize, block by block, so arbitrarily long input streams
    in constant memory.

    start_seconds skips input frames (the reference delegates this to
    ffmpeg's -ss, vadc.c:537-538)."""

    _BLOCK_FRAMES = 65536

    def __init__(
        self,
        source: str | BinaryIO,
        *,
        target_rate: int = 16000,
        start_seconds: float = 0.0,
    ):
        self._source = source
        self._owned = isinstance(source, (str, bytes, os.PathLike))
        self._target_rate = int(target_rate)
        self._start_seconds = float(start_seconds)
        self._fh: BinaryIO | None = None

    def __enter__(self) -> "WavSource":
        fh = open(self._source, "rb") if self._owned else self._source
        try:
            self._fmt = read_wav_header(fh)
        except Exception:
            if self._owned:
                fh.close()
            raise
        self._fh = fh
        fmt = self._fmt
        self._left = fmt.data_bytes
        if self._start_seconds > 0:
            skip = int(self._start_seconds * fmt.sample_rate)
            skip_bytes = min(skip * fmt.bytes_per_frame, fmt.data_bytes)
            if fh.seekable():
                fh.seek(skip_bytes, 1)
            else:
                _discard(fh, skip_bytes)
            self._left -= skip_bytes
        self._passthrough = (
            fmt.format_tag == WAVE_FORMAT_PCM
            and fmt.bits_per_sample == 16
            and fmt.channels == 1
            and fmt.sample_rate == self._target_rate
        )
        if not self._passthrough:
            self._resampler = PolyphaseResampler(
                fmt.sample_rate, self._target_rate
            )
        self._pending = b""  # partial frame carried between pipe reads
        self._out = bytearray()
        self._eof = False
        return self

    def __exit__(self, *exc) -> None:
        if self._fh is not None:
            if self._owned:
                self._fh.close()
            self._fh = None

    @property
    def format(self) -> WavFormat:
        return self._fmt

    def _pump(self) -> None:
        """Decode one input block into the output byte buffer."""
        assert self._fh is not None
        want = min(self._left, self._BLOCK_FRAMES * self._fmt.bytes_per_frame)
        raw = self._fh.read(want) if want > 0 else b""
        if raw:
            self._left -= len(raw)
        if self._passthrough:
            if raw:
                self._out += raw
            else:
                self._eof = True
            return
        if raw:
            raw = self._pending + raw
            bpf = self._fmt.bytes_per_frame
            cut = len(raw) - len(raw) % bpf
            self._pending = raw[cut:]
            mono = _decode_frames(raw[:cut], self._fmt)
            self._out += _quantize_s16le(self._resampler.process(mono))
        else:
            self._out += _quantize_s16le(self._resampler.flush())
            self._eof = True

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            while not self._eof:
                self._pump()
            out = bytes(self._out)
            self._out.clear()
            return out
        while len(self._out) < n and not self._eof:
            self._pump()
        out = bytes(self._out[:n])
        del self._out[:n]
        return out
