"""vadc-compatible command line: audio in (s16le PCM on stdin, .wav decoded
natively, any other media file via ffmpeg), speech-segment timestamps on
stdout.

Flag surface matches the reference exactly (option table vadc.c:1110-1124):

    vadc [file] [--min_silence MS] [--min_speech MS] [--threshold P]
         [--neg_threshold_relative P] [--speech_pad MS] [--batch N]
         [--sequence_count N] [--audio_source N] [--start_seconds S]
         [--raw_probabilities] [--stats] [--output_centi_seconds]
         [--model PATH]

plus one extension flag: [--precision faithful|balanced|fast|turbo]
(default faithful — the reference-fidelity tier).

Output discipline: stdout carries only data (segments or raw probabilities);
everything else goes to stderr (reference README contract)."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from vadc_tpu.cli.segmenter import (
    Segmenter,
    SegmenterConfig,
    format_segment_centiseconds,
    format_segment_seconds,
)
from vadc_tpu.cli.stats import Stats
from vadc_tpu.io.pcm import (
    BYTES_PER_SAMPLE,
    SAMPLE_RATE,
    BSError,
    BufferedStream,
    s16le_to_f32,
)
from vadc_tpu.io.ffmpeg import FFmpegSource
from vadc_tpu.io.wav import (
    PrependStream,
    WavFormatError,
    WavSource,
    is_riff_wave,
)

# Window of chunks processed per refill (reference vadc.c:799: 96 chunks).
WINDOW_CHUNKS = 96

DEFAULT_WEIGHTS = Path(__file__).resolve().parent.parent / "data" / "silero_v31_16k.testtensor"
_REFERENCE_WEIGHTS = Path("/root/reference/testdata/silero_v31_16k.testtensor")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="vadc",
        description="TPU-native streaming voice activity detection "
        "(Silero VAD v3.1/v4/v5).",
    )
    p.add_argument("filename", nargs="?", default=None,
                   help="input media file (.wav decoded natively with "
                        "resampling/downmix; anything else via ffmpeg); omit "
                        "to read raw s16le 16 kHz mono PCM from stdin")
    p.add_argument("--min_silence", type=float, default=200.0,
                   help="minimum silence duration in ms to close a segment")
    p.add_argument("--min_speech", type=float, default=250.0,
                   help="minimum speech duration in ms to keep a segment")
    p.add_argument("--threshold", type=float, default=0.5,
                   help="speech trigger probability threshold")
    p.add_argument("--neg_threshold_relative", type=float, default=0.15,
                   help="exit threshold = threshold - this value")
    p.add_argument("--speech_pad", type=float, default=30.0,
                   help="pad emitted segments by this many ms on both sides")
    p.add_argument("--batch", type=int, default=96,
                   help="chunks per model batch")
    p.add_argument("--sequence_count", type=int, default=1536,
                   help="chunk size in samples (v3: multiple of 256 in "
                        "[512,1536]; v5: fixed 512)")
    p.add_argument("--audio_source", type=int, default=0,
                   help="audio stream index for ffmpeg -map")
    p.add_argument("--start_seconds", type=float, default=0.0,
                   help="seek offset passed to ffmpeg")
    p.add_argument("--raw_probabilities", action="store_true",
                   help="print one probability per chunk instead of segments")
    p.add_argument("--stats", action="store_true",
                   help="print realtime-factor stats to stderr")
    p.add_argument("--output_centi_seconds", action="store_true",
                   help="print integer centiseconds instead of seconds")
    p.add_argument("--model", type=str, default=None,
                   help="path to a .testtensor weight archive "
                        "(default: bundled Silero v3.1 16k)")
    # Extension beyond the reference's 13-flag surface (all 13 keep their
    # exact reference semantics): matmul-precision tier selection, same as
    # the batch CLI and serving daemon.
    p.add_argument("--precision",
                   choices=("faithful", "balanced", "fast", "turbo"),
                   default="faithful",
                   help="matmul precision tier (default faithful = the "
                        "golden-fidelity contract; see docs/PERFORMANCE.md)")
    p.add_argument("--sr", type=int, choices=(16000, 8000), default=None,
                   help="sample-rate branch for fused v4/v5 .onnx models "
                        "(they carry both; the reference routes this via "
                        "the graph's sr input, onnx_helpers.c:314-357). "
                        "Testtensor archives carry their own rate")
    p.add_argument("--onnx_exec", action="store_true",
                   help="run the .onnx graph itself via the numpy executor "
                        "(restrictions introspected from the graph like the "
                        "reference's ORT backend; CPU-speed compatibility "
                        "path for re-exported/nonstandard models). Also the "
                        "automatic fallback when a recognized graph defeats "
                        "weight extraction")
    return p


def resolve_weights_path(model_arg: str | None) -> Path:
    if model_arg:
        return Path(model_arg)
    if DEFAULT_WEIGHTS.exists():
        return DEFAULT_WEIGHTS
    if _REFERENCE_WEIGHTS.exists():
        return _REFERENCE_WEIGHTS
    raise FileNotFoundError(
        "no weight archive found; pass --model <path.testtensor>"
    )


# model-contract logic lives with the model metadata; re-exported here for
# the CLI's many existing importers
from vadc_tpu.models.weights import clamp_sequence_count  # noqa: E402,F401


def main(argv: list[str] | None = None) -> int:
    try:
        return _main(argv)
    except (FileNotFoundError, ValueError) as e:
        # clean one-line errors for the common failure modes (missing model
        # file, unrecognized/corrupt model graph, missing ffmpeg binary,
        # missing input) — the reference prints an error kind and exits
        # rather than dumping a trace (vadc.c:911-947)
        print(f"Error: {e}", file=sys.stderr)
        return 1
    except BrokenPipeError:
        return 0
    except KeyboardInterrupt:
        return 130


def _make_exec_runner(weights_path: Path, args):
    """Build the introspected numpy-executor backend (engine/onnx_backend),
    honoring the graph's declared sequence restriction over the user's
    --sequence_count wish (the reference's clamp order, vadc.c:742-754)."""
    from vadc_tpu.engine.onnx_backend import OnnxExecRunner

    # the runner clamps against the graph's declared sequence restriction
    # AND the introspected family's chunk contract (v5 graphs with dynamic
    # dims still run at their fixed 512/256-sample cadence)
    runner = OnnxExecRunner(
        weights_path,
        chunk_samples=int(args.sequence_count),
        sample_rate=int(args.sr or 16000),
    )
    r = runner.restrictions
    print(
        "graph introspection: "
        f"batch={'unrestricted' if r.batch < 0 else r.batch}, "
        f"sequence={'unrestricted' if r.sequence < 0 else r.sequence}, "
        f"hidden={r.hidden}, sr_input={r.has_sr_input}",
        file=sys.stderr,
    )
    return runner


def _main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from vadc_tpu.runtime import enable_persistent_compilation_cache
    from vadc_tpu.models.weights import load_params
    from vadc_tpu.engine.runner import MinibatchRunner

    enable_persistent_compilation_cache()

    weights_path = resolve_weights_path(args.model)

    runner = None
    if args.onnx_exec:
        if weights_path.suffix.lower() != ".onnx":
            raise ValueError("--onnx_exec requires --model <file.onnx>")
        runner = _make_exec_runner(weights_path, args)
    else:
        try:
            family, params = load_params(
                weights_path, sample_rate=int(args.sr or 16000)
            )
        except Exception as e:
            if weights_path.suffix.lower() != ".onnx":
                raise
            # Distinguish "unrecognized graph" (terminal: the clean one-line
            # error) from "recognized family but extraction failed" (fall
            # back to the executor). Extraction failures are NOT all
            # non-ValueError — e.g. a recognized graph whose tensor set
            # deviates raises ValueError('unrecognized weight archive
            # layout') — so re-classify to decide.
            from vadc_tpu.export.onnx_extract import classify_model

            try:
                classify_model(weights_path)
            except ValueError:
                raise e from None  # truly unrecognized: one-line diagnosis
            # recognized family but the graph deviates from the known
            # extraction shapes (re-export, fused variants): fall back to
            # executing the graph itself — the generality the reference
            # gets from ORT (onnx_helpers.c:532-549)
            print(
                f"weight extraction failed ({type(e).__name__}: {e}); "
                "falling back to the numpy graph executor (slow path, "
                "--onnx_exec)",
                file=sys.stderr,
            )
            runner = _make_exec_runner(weights_path, args)

    if runner is None:
        if family == "v5":
            print("Model arch is Silero v5", file=sys.stderr)
        seq = clamp_sequence_count(family, int(args.sequence_count))
        print(f"Running with batch size {args.batch}", file=sys.stderr)
        print(f"Running with sequence count {seq}", file=sys.stderr)
        runner = MinibatchRunner(
            family, params, batch_size=int(args.batch), chunk_samples=seq,
            precision=args.precision,
        )
    else:
        seq = runner.chunk_samples
        print(f"Running with sequence count {seq} (graph-executor backend)",
              file=sys.stderr)
    if args.raw_probabilities and args.precision in ("fast", "turbo"):
        # config decision to stderr, reference discipline (vadc.c:700-753):
        # segment output is tier-robust (measured decision margin spans
        # thresholds 0.2-0.8) but raw probabilities deviate on speech
        # material — up to ~7e-3 (fast) / ~3e-2 (turbo) vs fp32
        print(
            f"note: --raw_probabilities at --precision {args.precision}: "
            "probabilities deviate up to "
            f"{'~7e-3' if args.precision == 'fast' else '~3e-2'} vs fp32 on "
            "speech material (docs/PERFORMANCE.md); use balanced or "
            "faithful for probability-faithful output",
            file=sys.stderr,
        )
    # 8 kHz branch families time chunks (and decode input) at their own rate
    model_sr = getattr(runner.module, "SAMPLE_RATE", SAMPLE_RATE)
    if args.sr and model_sr != args.sr:
        print(
            f"note: --sr {args.sr} ignored — this weight archive is a "
            f"{model_sr} Hz model (the flag selects the branch of fused "
            ".onnx models)",
            file=sys.stderr,
        )
    seg_config = SegmenterConfig.from_ms(
        chunk_samples=seq,
        sample_rate=model_sr,
        min_silence_ms=args.min_silence,
        min_speech_ms=args.min_speech,
        threshold=args.threshold,
        neg_threshold_relative=args.neg_threshold_relative,
        speech_pad_ms=args.speech_pad,
    )
    segmenter = Segmenter(seg_config)
    stats = Stats(output_enabled=args.stats, sample_rate=model_sr)
    fmt = (
        format_segment_centiseconds
        if args.output_centi_seconds
        else format_segment_seconds
    )

    def emit(start: float, end: float) -> None:
        stats.add_speech(start, end)
        sys.stdout.write(fmt(start, end) + "\n")
        sys.stdout.flush()
        stats.print_line()

    window_samples = seq * WINDOW_CHUNKS

    stream_failed = False

    def run(stream, eof_error_check=None) -> None:
        """Main ingest loop over a latched-error BufferedStream (reference
        vadc.c:852-999): process windows while healthy; the refill that
        latches an error kind reports it to stderr and ends the loop. A
        genuine failure (anything but the clean EndOfFile) also makes the
        process exit nonzero, matching the open-time failure modes."""
        import numpy as np

        nonlocal stream_failed
        bs = BufferedStream(
            stream,
            window_samples * BYTES_PER_SAMPLE,
            eof_error_check=eof_error_check,
        )
        while True:
            data, err = bs.refill()
            if err != BSError.NoError:
                # the reference prints the latched kind even for a clean
                # EndOfFile (vadc.c:911-947); stdout stays data-only
                print(f"Error: BS_Error_{err.name}", file=sys.stderr)
                if err != BSError.EndOfFile:
                    stream_failed = True
                break
            if len(data) % BYTES_PER_SAMPLE:
                data = data[:-1]  # drop trailing odd byte
            samples = s16le_to_f32(data)
            valid = samples.shape[0]
            stats.add_samples(valid)
            if valid < window_samples:
                window = np.zeros(window_samples, np.float32)
                window[:valid] = samples
            else:
                window = samples
            probs = runner.process_window(window)
            # floor(values_read / input_count) probabilities per window,
            # unconditionally — the reference's emit rule (vadc.c:964): the
            # zero-padded remainder of a short window is computed (state
            # advances, matching the padded final batch, vadc.c:88-99) but
            # never emitted.
            emit_count = valid // seq
            for prob in probs[:emit_count]:
                if args.raw_probabilities:
                    sys.stdout.write(f"{prob:f}\n")
                else:
                    for s, e in segmenter.feed(prob):
                        emit(s, e)
            if args.raw_probabilities:
                sys.stdout.flush()
            stats.print_line()

    def run_wav(
        source, where: str, start_seconds: float = 0.0, can_fall_back: bool = False
    ) -> int | None:
        """Shared native-wav branch for the file and stdin paths
        (the reference decodes every container through a spawned ffmpeg,
        vadc.c:531-608). Returns None when the HEADER is unsupported and
        the caller can retry via ffmpeg (a file can be reopened; stdin is
        already partially consumed, so it cannot)."""
        wav = WavSource(source, target_rate=model_sr, start_seconds=start_seconds)
        try:
            stream = wav.__enter__()
        except WavFormatError as e:
            if can_fall_back:
                print(
                    f"note: native wav decode unavailable ({e}); "
                    "falling back to ffmpeg",
                    file=sys.stderr,
                )
                return None
            print(f"Error: BS_Error_CantOpenFile ({e})", file=sys.stderr)
            return 1
        try:
            f = wav.format
            print(
                f"wav input{where}: {f.sample_rate} Hz, "
                f"{f.channels} ch, {f.bits_per_sample}-bit "
                f"{f.codec_name} "
                f"-> {model_sr} Hz mono (native decode)",
                file=sys.stderr,
            )
            run(stream)
        except WavFormatError as e:
            # mid-stream decode failure: the audio is partially consumed,
            # no fallback is possible — report like any latched error
            print(f"Error: BS_Error_CantOpenFile ({e})", file=sys.stderr)
            return 1
        finally:
            wav.__exit__(None, None, None)
        return 0

    if args.filename:
        from vadc_tpu.io.wav import sniff_media_head

        try:
            _is_regular, head = sniff_media_head(args.filename)
        except OSError as e:
            # the reference latches CantOpenFile for an unreadable input
            # (vadc.c:404-414); same kind, same stderr discipline
            print(f"Error: BS_Error_CantOpenFile ({e})", file=sys.stderr)
            return 1
        use_ffmpeg = not is_riff_wave(head)
        if not use_ffmpeg:
            if args.audio_source:
                print(
                    "note: --audio_source ignored for wav input "
                    "(single audio stream)",
                    file=sys.stderr,
                )
            rc = run_wav(
                args.filename, "", start_seconds=args.start_seconds,
                can_fall_back=True,
            )
            if rc is None:
                # unsupported wav codec (MS ADPCM, mp3-in-wav, ...): the
                # reference decodes every container via spawned ffmpeg
                # (vadc.c:531-608) — a file can be reopened, so retry there
                use_ffmpeg = True
            elif rc:
                return rc
        if use_ffmpeg:
            source = FFmpegSource(
                args.filename,
                audio_source=args.audio_source,
                start_seconds=args.start_seconds,
                sample_rate=model_sr,
            )
            try:
                with source as stream:
                    run(stream, eof_error_check=source.eof_error_kind)
            except FileNotFoundError:
                print(
                    "Error: BS_Error_CantOpenFile (ffmpeg not found — "
                    "non-wav inputs need ffmpeg on PATH; .wav decodes "
                    "natively)",
                    file=sys.stderr,
                )
                return 1
    else:
        # stdin: raw s16le by contract, but a wav container is sniffable
        # (RIFF magic in the first 12 bytes) and decodes natively — so
        # `vadc < file.wav` and `cat file.wav | vadc` just work
        head = sys.stdin.buffer.read(12)
        if is_riff_wave(head):
            if args.audio_source:
                print(
                    "note: --audio_source ignored for wav input "
                    "(single audio stream)",
                    file=sys.stderr,
                )
            rc = run_wav(
                PrependStream(head, sys.stdin.buffer),
                " on stdin",
                start_seconds=args.start_seconds,
            )
            if rc:
                return rc
        else:
            run(PrependStream(head, sys.stdin.buffer))

    if not args.raw_probabilities:
        for s, e in segmenter.finish():
            emit(s, e)
    stats.print_line(final=True)
    # a latched mid-stream failure (decode error, ffmpeg nonzero exit) exits
    # nonzero like the open-time failures; the clean EndOfFile stays 0
    return 1 if stream_failed else 0


if __name__ == "__main__":
    sys.exit(main())
