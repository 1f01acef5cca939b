"""PCM conversion and buffered window reading.

Replicates the reference ingest contract (vadc.c:852-999): raw mono 16 kHz
s16le, converted to f32 by /32768, windows zero-padded at the tail. The
window reader loops until the requested byte count is filled or EOF — the
same full-buffer refill discipline as the reference's Buffered_Stream
(refill_HANDLE, vadc.c:492-529).
"""

from __future__ import annotations

from typing import BinaryIO, Iterator

import numpy as np

SAMPLE_RATE = 16000
BYTES_PER_SAMPLE = 2


def s16le_to_f32(data: bytes) -> np.ndarray:
    """s16le bytes -> float32 in [-1, 1) via /32768 (vadc.c:873-901)."""
    samples = np.frombuffer(data, dtype="<i2")
    return samples.astype(np.float32) / 32768.0


def f32_to_s16le(samples: np.ndarray) -> bytes:
    """float32 -> s16le bytes with clipping (test/bench helper)."""
    clipped = np.clip(np.asarray(samples, np.float64) * 32768.0, -32768, 32767)
    return clipped.astype("<i2").tobytes()


def read_full(stream: BinaryIO, nbytes: int) -> bytes:
    """Read exactly nbytes unless EOF intervenes (may return short/empty)."""
    chunks: list[bytes] = []
    remaining = nbytes
    while remaining > 0:
        part = stream.read(remaining)
        if not part:
            break
        chunks.append(part)
        remaining -= len(part)
    return b"".join(chunks)


def iter_sample_windows(
    stream: BinaryIO, window_samples: int
) -> Iterator[tuple[np.ndarray, int]]:
    """Yield (f32 window zero-padded to window_samples, valid_sample_count).

    Terminates after the first short window (EOF), matching the reference
    main loop: a partial final window is processed, then the stream ends.
    """
    window_bytes = window_samples * BYTES_PER_SAMPLE
    while True:
        data = read_full(stream, window_bytes)
        if not data:
            return
        if len(data) % BYTES_PER_SAMPLE:
            data = data[: len(data) - 1]  # drop trailing odd byte
        samples = s16le_to_f32(data)
        valid = samples.shape[0]
        if valid < window_samples:
            padded = np.zeros(window_samples, np.float32)
            padded[:valid] = samples
            yield padded, valid
            return
        yield samples, valid
