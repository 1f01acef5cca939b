"""High-level Python API — the programmatic equivalent of the CLI.

    from vadc_tpu import api

    segments = api.detect_speech("talk.mp3")            # via ffmpeg
    segments = api.detect_speech_samples(f32_audio)     # 16 kHz mono floats
    probs = api.speech_probabilities(f32_audio)         # one per 96 ms chunk

Covers the role of the reference's Python pipeline wrapper (vadc.py:14-126)
without a subprocess: the model runs in-process on the available device.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from vadc_tpu.cli.segmenter import SegmenterConfig, segment_probabilities

_DEFAULT_RUNNERS: dict = {}


def _get_runner(model: str | None, sequence_count: int, precision: str = "faithful"):
    from vadc_tpu.cli.main import resolve_weights_path, clamp_sequence_count
    from vadc_tpu.engine.runner import StreamRunner
    from vadc_tpu.models.weights import load_params
    from vadc_tpu.runtime import enable_persistent_compilation_cache

    path = resolve_weights_path(model)
    key = (str(path), sequence_count, precision)
    if key not in _DEFAULT_RUNNERS:
        enable_persistent_compilation_cache()
        family, params = load_params(path)
        seq = clamp_sequence_count(family, sequence_count)
        _DEFAULT_RUNNERS[key] = (
            StreamRunner(family, params, precision=precision),
            seq,
        )
    return _DEFAULT_RUNNERS[key]


def speech_probabilities(
    samples: np.ndarray,
    *,
    model: str | None = None,
    sequence_count: int = 1536,
    precision: str = "faithful",
) -> np.ndarray:
    """Per-chunk speech probabilities for 16 kHz mono float32 samples.

    precision: 'faithful' (fp32 fidelity contract), 'balanced' (bf16_3x,
    ~5e-4 max deviation on speech material), 'fast' (bf16 matmuls with a
    HIGH-precision STFT, ~7e-3), or 'turbo' (all-bf16 + bf16-resident
    encoder, ~3e-2; max throughput). All tiers make identical segment
    decisions (tools/accuracy_eval.py); see docs/PERFORMANCE.md."""
    import jax.numpy as jnp

    runner, seq = _get_runner(model, sequence_count, precision)
    # v5 families scan fixed windows (512 @ 16 kHz / 256 @ 8 kHz); the
    # carried context is attached inside the runner
    window = getattr(runner.module, "WINDOW_SAMPLES", seq)
    samples = np.asarray(samples, np.float32).ravel()
    n_chunks = -(-len(samples) // window)
    if n_chunks == 0:
        return np.zeros(0, np.float32)
    # bucket the scan length to the next power of two: the scan executable
    # is shape-specialized, so a corpus of arbitrary lengths would compile
    # one XLA program per distinct length (first TPU compile ~10 s); the
    # padded tail chunks are causal no-ops for the returned prefix and are
    # discarded together with the final state
    n_padded = 1 << (n_chunks - 1).bit_length()
    padded = np.zeros(n_padded * window, np.float32)
    padded[: len(samples)] = samples
    chunks = jnp.asarray(padded.reshape(1, n_padded, window))
    probs, _ = runner.scan(chunks, runner.init_state(1))
    return np.asarray(probs[0, :n_chunks])


def detect_speech_samples(
    samples: np.ndarray,
    *,
    model: str | None = None,
    sequence_count: int = 1536,
    precision: str = "faithful",
    min_silence_ms: float = 200.0,
    min_speech_ms: float = 250.0,
    threshold: float = 0.5,
    neg_threshold_relative: float = 0.15,
    speech_pad_ms: float = 30.0,
) -> list[tuple[float, float]]:
    """Speech segments (start_s, end_s) for 16 kHz mono float32 samples."""
    runner, seq = _get_runner(model, sequence_count, precision)

    window = getattr(runner.module, "WINDOW_SAMPLES", seq)
    probs = speech_probabilities(
        samples, model=model, sequence_count=sequence_count, precision=precision
    )
    config = SegmenterConfig.from_ms(
        chunk_samples=window,
        sample_rate=getattr(runner.module, "SAMPLE_RATE", 16000),
        min_silence_ms=min_silence_ms,
        min_speech_ms=min_speech_ms,
        threshold=threshold,
        neg_threshold_relative=neg_threshold_relative,
        speech_pad_ms=speech_pad_ms,
    )
    # emit only full chunks (reference floor semantics, vadc.c:964)
    emit = len(np.asarray(samples).ravel()) // window
    return segment_probabilities(probs[:emit], config)


def stream_segments(
    stream,
    *,
    model: str | None = None,
    sequence_count: int = 1536,
    precision: str = "faithful",
    min_silence_ms: float = 200.0,
    min_speech_ms: float = 250.0,
    threshold: float = 0.5,
    neg_threshold_relative: float = 0.15,
    speech_pad_ms: float = 30.0,
):
    """Incrementally yield (start_s, end_s) segments from a binary stream of
    s16le mono PCM at the model's sample rate (16 kHz; 8 kHz for the _8k
    families) — the generator form of the CLI loop, for library users
    consuming live pipes/sockets."""
    from vadc_tpu.cli.main import clamp_sequence_count, resolve_weights_path, WINDOW_CHUNKS
    from vadc_tpu.cli.segmenter import Segmenter
    from vadc_tpu.engine.runner import MinibatchRunner
    from vadc_tpu.io.pcm import iter_sample_windows
    from vadc_tpu.models.weights import load_params
    from vadc_tpu.runtime import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    family, params = load_params(resolve_weights_path(model))
    seq = clamp_sequence_count(family, sequence_count)
    runner = MinibatchRunner(family, params, batch_size=WINDOW_CHUNKS,
                             chunk_samples=seq, precision=precision)
    config = SegmenterConfig.from_ms(
        chunk_samples=seq,
        # 8 kHz families: chunk seconds and ms->chunk thresholds are on
        # the model's time base, not 16 kHz (the CLI passes this too)
        sample_rate=getattr(runner.module, "SAMPLE_RATE", 16000),
        min_silence_ms=min_silence_ms,
        min_speech_ms=min_speech_ms,
        threshold=threshold,
        neg_threshold_relative=neg_threshold_relative,
        speech_pad_ms=speech_pad_ms,
    )
    segmenter = Segmenter(config)
    window_samples = seq * WINDOW_CHUNKS
    for window, valid in iter_sample_windows(stream, window_samples):
        probs = runner.process_window(window)
        # floor emit semantics, unconditionally (reference vadc.c:964)
        emit = valid // seq
        for prob in probs[:emit]:
            yield from segmenter.feed(prob)
    yield from segmenter.finish()


def cut_speech_samples(
    samples: np.ndarray, *, sample_rate: int | None = None, **kwargs
) -> np.ndarray:
    """Concatenate only the speech ranges of mono float32 audio at the
    model's sample rate — the library form of cli/cut.py. kwargs as
    detect_speech_samples. sample_rate defaults to the model's rate
    (8000 for the _8k families): segment times are true seconds, so
    slicing at any other rate would cut the wrong sample ranges."""
    from vadc_tpu.cli.segmenter import slice_segments

    if sample_rate is None:
        runner, _ = _get_runner(
            kwargs.get("model"),
            kwargs.get("sequence_count", 1536),
            kwargs.get("precision", "faithful"),
        )
        sample_rate = getattr(runner.module, "SAMPLE_RATE", 16000)
    samples = np.asarray(samples, np.float32).ravel()
    segments = detect_speech_samples(samples, **kwargs)
    return slice_segments(samples, segments, sample_rate)


def detect_speech(
    filename: str | Path,
    *,
    audio_source: int = 0,
    start_seconds: float = 0.0,
    **kwargs,
) -> list[tuple[float, float]]:
    """Speech segments for any media file (.wav decoded natively with
    downmix/resample; anything else via ffmpeg)."""
    from vadc_tpu.io.pcm import s16le_to_f32
    from vadc_tpu.io.wav import WavSource, is_riff_wave, sniff_media_head

    _is_regular, head = sniff_media_head(filename)
    # decode at the MODEL's rate (8 kHz families take 8 kHz input)
    runner, _ = _get_runner(
        kwargs.get("model"),
        kwargs.get("sequence_count", 1536),
        kwargs.get("precision", "faithful"),
    )
    model_sr = getattr(runner.module, "SAMPLE_RATE", 16000)
    if is_riff_wave(head):
        with WavSource(
            str(filename),
            target_rate=model_sr,
            start_seconds=start_seconds,
        ) as stream:
            samples = s16le_to_f32(stream.read(-1))
    else:
        from vadc_tpu.io.ffmpeg import FFmpegSource

        with FFmpegSource(
            str(filename),
            audio_source=audio_source,
            start_seconds=start_seconds,
            sample_rate=model_sr,
        ) as stream:
            samples = s16le_to_f32(stream.read())
    return detect_speech_samples(samples, **kwargs)
