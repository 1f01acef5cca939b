"""PCM windowing edge cases (reference ingest contract, vadc.c:852-999)."""

import io

import numpy as np

from vadc_tpu.io.pcm import f32_to_s16le, iter_sample_windows, read_full, s16le_to_f32


def test_roundtrip():
    x = np.linspace(-1, 0.999, 1000).astype(np.float32)
    back = s16le_to_f32(f32_to_s16le(x))
    assert np.abs(back - x).max() <= 1.0 / 32768.0


def test_exact_multiple():
    data = f32_to_s16le(np.zeros(3 * 100, np.float32))
    windows = list(iter_sample_windows(io.BytesIO(data), 100))
    assert [(w.shape[0], v) for w, v in windows] == [(100, 100)] * 3


def test_short_tail_zero_padded():
    samples = np.arange(250, dtype=np.int16)
    windows = list(iter_sample_windows(io.BytesIO(samples.tobytes()), 100))
    assert [v for _, v in windows] == [100, 100, 50]
    last = windows[-1][0]
    assert last.shape == (100,)
    assert np.all(last[50:] == 0.0)
    np.testing.assert_array_equal(last[:50], samples[200:].astype(np.float32) / 32768.0)


def test_trailing_odd_byte_dropped():
    samples = np.arange(10, dtype=np.int16)
    data = samples.tobytes() + b"\x7f"  # stray half-sample at EOF
    windows = list(iter_sample_windows(io.BytesIO(data), 8))
    assert [v for _, v in windows] == [8, 2]


def test_empty_stream():
    assert list(iter_sample_windows(io.BytesIO(b""), 100)) == []


def test_read_full_across_short_reads():
    class Dribble(io.RawIOBase):
        def __init__(self, data):
            self.data = data
            self.pos = 0

        def read(self, n):
            if self.pos >= len(self.data):
                return b""
            chunk = self.data[self.pos : self.pos + min(n, 3)]  # tiny reads
            self.pos += len(chunk)
            return chunk

    data = bytes(range(100))
    assert read_full(Dribble(data), 100) == data
    assert read_full(Dribble(data), 64) == data[:64]
